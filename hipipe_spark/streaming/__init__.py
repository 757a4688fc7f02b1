from hipipe_spark.streaming import session_stream

__all__ = ["session_stream"]
