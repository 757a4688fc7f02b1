"""Streaming exponential-decay features with exact O(1) keyed state.

The batch :class:`~hipipe_spark.operators.temporal.DecayAgg` bounds the
lookback (k lag columns). Streaming state inverts the trade: the EWMA
recurrence

    s <- x + s * exp(-dt / tau)

carries the ENTIRE history in two scalars per conversation, so the
streaming operator is *exact over an unbounded horizon* while storing
only (last_ts, s, w) per live key — the state-store frontier, never
history.

Vectorization: the recurrence is sequential, but it factors into
``s_i = exp(-t_i/tau) * cumsum(x_j * exp(t_j/tau))`` — which overflows
for spans past ~700*tau. The scan below renormalizes per time-epoch of
length 200*tau: within an epoch everything is one numpy cumsum (largest
factor e^200 ~ 7e86, safely inside double range); across epochs a
single carry decays forward. No per-row Python anywhere; the epoch loop
runs O(span / (200*tau)) iterations per key per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _decay_scan(ts, xs, tau, state):
    """Strictly-past decayed (sum, wsum) per row + final carry state.

    ``state`` is (last_ts, s, w) — decayed values AT last_ts including
    the last processed row — or None. Returns (s_feat, w_feat, state').
    """
    import numpy as np

    E = 200.0 * tau
    n = len(ts)
    s_feat = np.empty(n)
    w_feat = np.empty(n)
    if state is None:
        carry_ref, carry_s, carry_w = ts[0], 0.0, 0.0
    else:
        carry_ref, carry_s, carry_w = state
    base = min(carry_ref, ts[0])
    rel = ts - base
    epoch = np.floor(rel / E).astype(np.int64)
    i = 0
    while i < n:
        e = epoch[i]
        j = i
        while j < n and epoch[j] == e:
            j += 1
        t0 = base + e * E
        u = np.exp((ts[i:j] - t0) / tau)        # in [1, e^200)
        inv = 1.0 / u
        # carry decayed from its reference time to this epoch's origin
        cs = carry_s * np.exp(-(t0 - carry_ref) / tau)
        cw = carry_w * np.exp(-(t0 - carry_ref) / tau)
        xs_u = xs[i:j] * u
        # strictly-past: exclusive cumulative sums
        cum_s = np.concatenate(([0.0], np.cumsum(xs_u)[:-1]))
        cum_w = np.concatenate(([0.0], np.cumsum(u)[:-1]))
        s_feat[i:j] = (cs + cum_s) * inv
        w_feat[i:j] = (cw + cum_w) * inv
        # new carry at the epoch's last timestamp, INCLUDING its rows
        carry_s = (cs + cum_s[-1] + xs_u[-1]) * inv[-1]
        carry_w = (cw + cum_w[-1] + u[-1]) * inv[-1]
        carry_ref = ts[j - 1]
        i = j
    return s_feat, w_feat, (float(carry_ref), float(carry_s), float(carry_w))


def decay_stream(
    turns_stream: DataFrame,
    value_col: str = "text_len",
    tau_sec: float = 600.0,
    key: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact unbounded-horizon streaming decay features via
    ``applyInPandasWithState``: per conversation, emits the
    strictly-past decayed sum / weight-sum / mean of ``value_col`` for
    every turn. Micro-batch rows are concatenated then sorted
    (ts, turn_idx) — the cross-chunk ordering fix shared with
    ``stateful_session_stream``; arrival across micro-batches is
    assumed time-ordered per key (append log)."""
    import pandas as pd

    out_schema = (f"{key} string, turn_idx int, {ts_col} double, "
                  "decay_sum double, decay_wsum double, decay_mean double")
    state_schema = "last_ts double, s double, w double"

    def update(key_tuple, pdf_iter, state):
        import numpy as np

        st = tuple(state.get) if state.exists else None
        chunks = [p for p in pdf_iter if len(p)]
        if not chunks:
            if st is not None:
                state.update(st)
            yield pd.DataFrame(columns=[key, "turn_idx", ts_col, "decay_sum",
                                        "decay_wsum", "decay_mean"])
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, "turn_idx"])
        ts = pdf[ts_col].to_numpy(dtype="float64")
        xs = pdf[value_col].to_numpy(dtype="float64")
        s_feat, w_feat, st = _decay_scan(ts, xs, tau_sec, st)
        state.update(st)
        out = pdf[["turn_idx", ts_col]].copy()
        out.insert(0, key, key_tuple[0])
        out["decay_sum"] = s_feat
        out["decay_wsum"] = w_feat
        out["decay_mean"] = np.where(w_feat > 0.0, s_feat / np.maximum(w_feat, 1e-300), np.nan)
        yield out

    return turns_stream.groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout")
