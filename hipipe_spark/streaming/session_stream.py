"""Structured Streaming variants of the temporal operators.

hipipe is a streaming library at heart (lazy ranges + async prefetch,
reference ``include/hipipe/core/stream/buffer.hpp:142-177``) but has no
event-time semantics. The Spark-native reading: Structured Streaming
with watermarks — late data handled by the engine, sessionization via
``F.session_window``, incremental feature computation via
``foreachBatch`` running the same batch pipeline.

Batch/stream parity: `session_window(gap)` merges events whose gaps are
< gap, exactly the batch Sessionize semantics (a session closes when a
gap > threshold appears).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def session_aggregates_stream(
    turns_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key: str = "conv_id",
) -> DataFrame:
    """Streaming session aggregates: one output row per closed session
    with turn count and span. Watermark bounds state for late data."""
    return (
        turns_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("assistant_turns"),
        )
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns",
            "assistant_turns",
        )
    )


def featurize_stream(
    turns_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    gap: str = "30 minutes",
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Micro-batch incremental featurization: every micro-batch runs the
    batch feature pipeline on the new turns (foreachBatch), appending to
    a parquet sink. Per-conversation history context beyond the batch is
    deliberately NOT stitched here (that is the batch engine's job via
    backfill over the full table); this sink provides the low-latency
    approximate path."""
    from hipipe_spark.operators.flagship import featurize

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = featurize(batch_df, profiles=None, gap=gap)
        out.write.mode("append").parquet(out_path)

    writer = (
        turns_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
