from hipipe_spark.sources import csv, dataframe, iceberg, multimodal

__all__ = ["csv", "dataframe", "iceberg", "multimodal"]
