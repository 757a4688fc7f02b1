from hipipe_spark.streaming import (
    decay_stream,
    dedup_stream,
    drift_stream,
    quality_stream,
    session_stream,
)

__all__ = [
    "decay_stream", "dedup_stream", "drift_stream", "quality_stream",
    "session_stream",
]
