"""Streaming SCD2: validity intervals maintained across micro-batches.

The batch builder (:func:`hipipe_spark.operators.scd.scd2`) needs the
whole update history per key; the streaming twin keeps ONLY the
currently-open version per key in the state store — O(live keys),
never O(history) — and emits each interval exactly once, at the
moment a change CLOSES it (append mode). Open versions live in state
until the next change; a downstream reader unions the emitted closed
intervals with `is_current` state if it needs the full dimension.

Ordering contract (shared with decay_stream / session_stream):
arrival is time-ordered per key ACROSS micro-batches (an append log);
within a batch rows are concatenated and sorted by (ts, tiebreak),
and same-ts duplicates resolve to the highest tiebreak — identical to
the batch operator's idempotent-ingest rule.

No per-row Python: change detection is a vectorized shifted
comparison per (key, micro-batch) group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scd2_stream(
    updates_stream: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    attr_col: str = "attr",
    tiebreak: str = "turn_idx",
) -> DataFrame:
    """``applyInPandasWithState`` SCD2 over a single tracked (string)
    attribute — multi-attribute tracking = pre-concat into one column
    (null-safe via a sentinel), exactly how a state row must serialize
    anyway. ``ts_col`` must be epoch-second doubles.

    Emits ``(key, attr, valid_from, valid_to)`` for every CLOSED
    version; no-op updates (attr unchanged, null-safe) collapse
    exactly as in the batch operator.
    """
    import pandas as pd

    out_schema = (f"{key} string, {attr_col} string, "
                  "valid_from double, valid_to double")
    state_schema = "open_ts double, open_attr string, attr_null boolean"

    def _neq(a, b):
        # null-safe !=: both-null is equal
        both_null = pd.isna(a) & pd.isna(b)
        return ~both_null & ((pd.isna(a) | pd.isna(b)) | (a != b))

    def update(key_tuple, pdf_iter, state):
        chunks = [p for p in pdf_iter if len(p)]
        if not chunks:
            if state.exists:
                state.update(tuple(state.get))
            yield pd.DataFrame(
                columns=[key, attr_col, "valid_from", "valid_to"])
            return
        pdf = (pd.concat(chunks, ignore_index=True)
               .sort_values([ts_col, tiebreak])
               .drop_duplicates(subset=[ts_col], keep="last")
               .reset_index(drop=True))
        if state.exists:
            open_ts, open_attr, attr_null = state.get
            if attr_null:
                open_attr = None
            has_open = True
        else:
            open_ts = open_attr = None
            has_open = False

        attrs = pdf[attr_col]
        prev = attrs.shift(1)
        mask = _neq(attrs, prev).to_numpy()
        mask[0] = (not has_open) or bool(
            _neq(pd.Series([attrs.iloc[0]]),
                 pd.Series([open_attr])).iloc[0])
        kept = pdf[mask]

        rows = []
        if has_open and len(kept):
            rows.append((key_tuple[0], open_attr, open_ts,
                         float(kept[ts_col].iloc[0])))
        kts = kept[ts_col].to_numpy(dtype="float64")
        kat = list(kept[attr_col])
        for i in range(len(kept) - 1):
            rows.append((key_tuple[0], kat[i], float(kts[i]),
                         float(kts[i + 1])))
        if len(kept):
            new_attr = kat[-1]
            state.update((float(kts[-1]),
                          "" if new_attr is None else str(new_attr),
                          new_attr is None))
        elif has_open:
            state.update((open_ts,
                          "" if open_attr is None else str(open_attr),
                          open_attr is None))
        yield pd.DataFrame(
            rows, columns=[key, attr_col, "valid_from", "valid_to"])

    return updates_stream.groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout")
