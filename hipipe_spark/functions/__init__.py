from hipipe_spark.functions import casts, hashing, text

__all__ = ["casts", "hashing", "text"]
