"""Streaming deduplication — the incremental variant of
``operators.dedup.exact_dedup``.

hipipe has no event-time semantics (SURVEY.md §2.3); the Spark-native
reading of "dedup a stream of documents" is fingerprint +
``dropDuplicatesWithinWatermark``: state is bounded by the watermark
horizon, so at 10^12-turn scale the state store holds only the
horizon's fingerprints — O(arrival rate × watermark), not O(corpus).
Late duplicates older than the watermark are the accepted trade (the
batch engine sweeps the full corpus; this sink is the low-latency
approximate path, same division of labor as ``featurize_stream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hipipe_spark.functions.text import exact_fingerprint, fingerprint


def exact_dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    canonical: bool = False,
) -> DataFrame:
    """Keep the first-seen row per (byte-exact or canonicalized) text
    within the watermark horizon. One stateful operator, keyed by the
    16-byte fingerprint — the streaming analog of exact_dedup's
    hash-groupBy (state per distinct doc instead of a shuffle)."""
    fp = (fingerprint if canonical else exact_fingerprint)(F.col(text_col))
    return (
        stream_df.withColumn("__fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
