"""Streaming exact-EWMA decay features: cross-micro-batch state must
reproduce the sequential recurrence over the full ordered history, and
the epoch-renormalized scan must survive spans far beyond 700*tau
(where the naive exp-prefix factorization overflows)."""

import math
import time

import numpy as np
import pandas as pd
import pytest

from hipipe_spark.streaming.decay_stream import _decay_scan, decay_stream

TAU = 100.0


def _recurrence(ts, xs, tau):
    """Ground truth: per-row sequential EWMA recurrence."""
    s = w = 0.0
    last = None
    s_out, w_out = [], []
    for t, x in zip(ts, xs):
        if last is not None:
            f = math.exp(-(t - last) / tau)
            s, w = s * f, w * f
        s_out.append(s)
        w_out.append(w)
        s, w, last = s + x, w + 1.0, t
    return np.array(s_out), np.array(w_out)


def _mk_input(tmp_path):
    rows = []
    for conv in ["a", "b"]:
        base = 1000.0 if conv == "a" else 9000.0
        ts = base
        for i in range(14):
            ts += 5.0 + (i % 5) * 40.0
            rows.append((conv, i, ts, float((i * 7) % 13)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "text_len"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    d = tmp_path / "decay_in"
    d.mkdir()
    pdf[pdf.turn_idx < 7].to_parquet(d / "part-000.parquet", index=False)
    time.sleep(0.01)
    pdf[pdf.turn_idx >= 7].to_parquet(d / "part-001.parquet", index=False)
    return str(d), pdf


@pytest.mark.parametrize("max_files", [1, 2])
def test_decay_stream_matches_recurrence(spark, tmp_path, max_files):
    in_dir, pdf = _mk_input(tmp_path)
    src = (spark.readStream
           .schema("conv_id string, turn_idx int, ts double, text_len double")
           .option("maxFilesPerTrigger", max_files).parquet(in_dir))
    out = decay_stream(src, "text_len", tau_sec=TAU)
    qname = f"decay_stream_{max_files}"
    q = (out.writeStream.format("memory").queryName(qname)
         .option("checkpointLocation", str(tmp_path / f"ckpt{max_files}"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"select * from {qname}").toPandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert len(got) == len(pdf)
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"])
        s_ref, w_ref = _recurrence(g["ts"].to_numpy(),
                                   g["text_len"].to_numpy(), TAU)
        gg = got[got.conv_id == conv]
        assert np.allclose(gg["decay_sum"], s_ref, rtol=1e-9)
        assert np.allclose(gg["decay_wsum"], w_ref, rtol=1e-9)


def test_decay_scan_long_span_no_overflow():
    """Span of 5000*tau — the exp(t/tau) prefix trick would overflow at
    ~700*tau; the epoch-renormalized scan must stay finite and exact."""
    rng = np.random.RandomState(7)
    n = 400
    ts = np.cumsum(rng.uniform(0.5, 25.0, n)) * TAU  # total ~5000*tau
    xs = rng.uniform(0.0, 50.0, n)
    s, w, state = _decay_scan(ts, xs, TAU, None)
    assert np.isfinite(s).all() and np.isfinite(w).all()
    s_ref, w_ref = _recurrence(ts, xs, TAU)
    assert np.allclose(s, s_ref, rtol=1e-9)
    assert np.allclose(w, w_ref, rtol=1e-9)
    assert np.isfinite(state[1]) and np.isfinite(state[2])


def test_decay_scan_resume_equals_full():
    """Scan state handoff: split history at any point == one full scan."""
    rng = np.random.RandomState(3)
    n = 100
    ts = np.cumsum(rng.uniform(1.0, 300.0, n))
    xs = rng.uniform(0.0, 10.0, n)
    s_full, w_full, _ = _decay_scan(ts, xs, TAU, None)
    for cut in (1, 37, 99):
        s1, w1, st = _decay_scan(ts[:cut], xs[:cut], TAU, None)
        s2, w2, _ = _decay_scan(ts[cut:], xs[cut:], TAU, st)
        assert np.allclose(np.concatenate([s1, s2]), s_full, rtol=1e-9)
        assert np.allclose(np.concatenate([w1, w2]), w_full, rtol=1e-9)
