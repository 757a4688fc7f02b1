from hipipe_spark.sources import csv, multimodal

__all__ = ["csv", "multimodal"]
