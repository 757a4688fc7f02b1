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


def stateful_session_stream(
    turns_stream: DataFrame,
    gap_seconds: float = 1800.0,
    key: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    Spark-native analog of a hipipe stateful ``transform`` with a
    mutable lambda (reference idiom:
    ``test/core/stream/transform1.cpp:156-179``), upgraded to
    fault-tolerant keyed state.

    Per conversation, carries (last event-time, running session index,
    turns seen) across micro-batches and emits one row per turn with
    its gap-based ``session_id``, ``time_since_prev`` and cumulative
    ``turns_seen`` — incrementally, without re-reading history. Rows
    inside a micro-batch are sorted by (ts, turn_idx); arrival across
    micro-batches is assumed time-ordered per key (the source is an
    append log per conversation). State is O(1) per live conversation;
    at 10^12 turns the state store holds only the live-key frontier,
    not history.
    """
    import pandas as pd

    out_schema = (f"{key} string, turn_idx int, {ts_col} double, "
                  "session_id bigint, time_since_prev double, "
                  "turns_seen bigint")
    state_schema = "last_ts double, session_id bigint, turns_seen bigint"

    def update(key_tuple, pdf_iter, state) -> "pd.DataFrame":
        if state.exists:
            last_ts, session_id, turns_seen = state.get
        else:
            last_ts, session_id, turns_seen = None, 0, 0
        import numpy as np

        # Materialize ALL Arrow chunks for this key before sorting:
        # applyInPandasWithState splits a key's micro-batch into multiple
        # chunks (arrow.maxRecordsPerBatch) with no cross-chunk ordering
        # guarantee — sorting each chunk independently would corrupt
        # session ids / gaps whenever a key exceeds one chunk per batch.
        # Memory bound = one key's rows in one micro-batch (trigger-sized).
        chunks = [p for p in pdf_iter if len(p)]
        merged = (pd.concat(chunks, ignore_index=True)
                  if chunks else pd.DataFrame())
        outs = []
        for pdf in ([merged] if len(merged) else []):
            pdf = pdf.sort_values([ts_col, "turn_idx"])
            ts = pdf[ts_col].to_numpy(dtype="float64")
            prev = np.concatenate(
                ([np.nan if last_ts is None else last_ts], ts[:-1]))
            gaps = ts - prev  # NaN on the very first turn of the key
            sess = session_id + np.cumsum(gaps > gap_seconds)
            seen = turns_seen + np.arange(1, len(ts) + 1)
            last_ts = float(ts[-1])
            session_id = int(sess[-1])
            turns_seen = int(seen[-1])
            out = pdf[["turn_idx", ts_col]].copy()
            out.insert(0, key, key_tuple[0])
            out["session_id"] = sess
            out["time_since_prev"] = gaps
            out["turns_seen"] = seen
            outs.append(out)
        state.update((last_ts, session_id, turns_seen))
        yield pd.concat(outs) if outs else pd.DataFrame(
            columns=[key, "turn_idx", ts_col, "session_id",
                     "time_since_prev", "turns_seen"])

    return turns_stream.groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "append",
        "NoTimeout",
    )


def featurize_stream(
    turns_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    gap: str = "30 minutes",
    profiles: DataFrame | None = None,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Micro-batch incremental featurization: every micro-batch runs the
    batch feature pipeline on the new turns (foreachBatch), appending to
    a parquet sink. Per-conversation history context beyond the batch is
    deliberately NOT stitched here (that is the batch engine's job via
    backfill over the full table); this sink provides the low-latency
    approximate path.

    ``profiles``: optional STATIC (batch) profile table — as-of joined
    to every micro-batch with the broadcast strategy: the profile side
    is dimension-sized (one state-change log per conversation), so each
    micro-batch packs it into per-key sorted arrays and broadcast-joins
    without shuffling the streaming side at all. Stream-vs-batch
    featurize parity incl. profiles is pytest-pinned
    (tests/test_checkpoint_streaming.py)."""
    from hipipe_spark.operators.flagship import featurize

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = featurize(batch_df, profiles=profiles, gap=gap,
                        asof_strategy="broadcast")
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
