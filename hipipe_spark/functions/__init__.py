from hipipe_spark.functions import casts, hashing, rounding, text

__all__ = ["casts", "hashing", "rounding", "text"]
