"""Streaming point-in-time trailing-window features with
horizon-bounded keyed state.

The batch :func:`~hipipe_spark.operators.joins.pit_window_agg` reads a
running sum over delta-encoded event rows; a stream cannot plant
expiry rows in the future, so the streaming operator keeps the raw
frontier instead: per entity, exactly the events newer than
``last_ts − horizon`` — O(rate × horizon) state, never O(history)
(the same bounded-state contract as ``dedup_stream``'s
dropDuplicatesWithinWatermark and ``session_stream``'s live-key maps).

Each micro-batch is vectorized end-to-end: the key's state events and
batch events merge into one sorted array, per-row window bounds come
from two ``np.searchsorted`` calls (strict ``[t−h, t)`` — identical
boundary semantics to the batch operator), and count/sum read from a
prefix-sum. No per-row Python.

Arrival is assumed time-ordered per key across micro-batches (append
log) — the standing assumption shared by ``decay_stream`` and
``stateful_session_stream``; within a micro-batch any order is fine
(rows are concatenated and sorted before the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pit_scan(ts, vs, horizon, state_ts, state_vs):
    """Per-row strictly-past windowed (count, sum) + trimmed state.

    ``ts``/``vs``: this batch's event times/values, sorted ascending.
    ``state_ts``/``state_vs``: carried events (sorted, already trimmed
    to the previous frontier). Returns (counts, sums, ts', vs').
    """
    import numpy as np

    ev_ts = np.concatenate([state_ts, ts])
    ev_vs = np.concatenate([state_vs, vs])
    prefix = np.concatenate(([0.0], np.cumsum(ev_vs)))
    lo = np.searchsorted(ev_ts, ts - horizon, side="left")
    hi = np.searchsorted(ev_ts, ts, side="left")
    counts = (hi - lo).astype("int64")
    sums = prefix[hi] - prefix[lo]
    # trim: a future row t >= last_ts keeps events with ts >= t - h
    # >= last_ts - h (left-inclusive, so side="left")
    keep = np.searchsorted(ev_ts, ts[-1] - horizon, side="left")
    return counts, sums, ev_ts[keep:], ev_vs[keep:]


def pit_stream(
    events_stream: DataFrame,
    value_col: str,
    horizon: float = 3600.0,
    key: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Streaming :func:`pit_window_agg` with the event stream as its
    own spine: per event, the entity's strictly-prior ``[t−h, t)``
    count and sum of ``value_col``. Emits
    ``(key, seq_col, ts_col, pit_count, pit_sum)`` per input row.

    State per live key: only the events inside the trailing horizon
    behind the newest processed timestamp, stored as two arrays —
    bounded by rate × horizon regardless of stream age. Batch/stream
    parity (same boundary rules, fp-exact for integer-valued inputs)
    is pytest-pinned against the batch operator.
    """
    import pandas as pd

    out_schema = (f"{key} string, {seq_col} long, {ts_col} double, "
                  "pit_count long, pit_sum double")
    state_schema = "ev_ts array<double>, ev_vs array<double>"
    cols = [key, seq_col, ts_col, "pit_count", "pit_sum"]

    def update(key_tuple, pdf_iter, state):
        import numpy as np

        if state.exists:
            st_ts, st_vs = state.get
            st_ts = np.asarray(st_ts, dtype="float64")
            st_vs = np.asarray(st_vs, dtype="float64")
        else:
            st_ts = st_vs = np.empty(0, dtype="float64")
        chunks = [p for p in pdf_iter if len(p)]
        if not chunks:
            if len(st_ts):
                state.update((st_ts.tolist(), st_vs.tolist()))
            yield pd.DataFrame(columns=cols)
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, seq_col])
        ts = pdf[ts_col].to_numpy(dtype="float64")
        vs = pdf[value_col].to_numpy(dtype="float64")
        counts, sums, st_ts, st_vs = _pit_scan(
            ts, np.nan_to_num(vs), float(horizon), st_ts, st_vs)
        state.update((st_ts.tolist(), st_vs.tolist()))
        out = pdf[[seq_col, ts_col]].copy()
        out.insert(0, key, key_tuple[0])
        out["pit_count"] = counts
        out["pit_sum"] = np.round(sums, 6)
        yield out

    return events_stream.groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout")
