"""Streaming PIT windows: cross-micro-batch state must reproduce the
batch pit_window_agg exactly — same strict [t-h, t) boundaries, state
trimmed to the horizon frontier."""

import time

import numpy as np
import pandas as pd
import pytest

from hipipe_spark.streaming.pit_stream import _pit_scan, pit_stream

H = 600.0


def _mk_events():
    rows = []
    for u in ["a", "b"]:
        base = 1000.0 if u == "a" else 50000.0
        step = 120.0 if u == "a" else 300.0  # H % step == 0: boundary hits
        for i in range(16):
            rows.append((u, i, base + step * i + (7.0 if i % 5 == 4 else 0.0),
                         float((i * 3) % 11)))
    # duplicate-timestamp pair inside one entity
    rows.append(("a", 16, 1000.0 + 120.0 * 3, 99.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    pdf["event_id"] = pdf["event_id"].astype("int64")
    return pdf.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


def _ground_truth(pdf):
    """Naive O(n^2) strict [t-h, t) windows per entity."""
    out = []
    for _, r in pdf.iterrows():
        w = pdf[(pdf.user_id == r.user_id) & (pdf.ts < r.ts)
                & (pdf.ts >= r.ts - H)]
        out.append((r.user_id, r.event_id, int(len(w)),
                    round(float(w.value.sum()), 6)))
    return sorted(out)


def test_pit_scan_pure():
    pdf = _mk_events()
    got = []
    for u, grp in pdf.groupby("user_id"):
        # feed in 3 uneven chunks to exercise the state carry
        st_ts = st_vs = np.empty(0)
        g = grp.sort_values(["ts", "event_id"])
        for chunk in np.array_split(np.arange(len(g)), 3):
            if not len(chunk):
                continue
            part = g.iloc[chunk]
            c, s, st_ts, st_vs = _pit_scan(
                part.ts.to_numpy(float), part.value.to_numpy(float),
                H, st_ts, st_vs)
            for eid, cc, ss in zip(part.event_id, c, s):
                got.append((u, eid, int(cc), round(float(ss), 6)))
        # state never exceeds the horizon frontier
        assert st_ts.min() >= g.ts.max() - H if len(st_ts) else True
    assert sorted(got) == _ground_truth(pdf)


@pytest.mark.parametrize("max_files", [1, 3])
def test_pit_stream_matches_batch(spark, tmp_path, max_files):
    pdf = _mk_events()
    d = tmp_path / "pit_in"
    d.mkdir()
    # three time-ordered files (append-log arrival per key)
    for i, part in enumerate(np.array_split(
            pdf.sort_values(["ts", "event_id"]).reset_index(drop=True), 3)):
        part.to_parquet(d / f"part-{i:03d}.parquet", index=False)
        time.sleep(0.01)
    src = (spark.readStream
           .schema("user_id string, event_id long, ts double, value double")
           .option("maxFilesPerTrigger", max_files).parquet(str(d)))
    out = pit_stream(src, "value", horizon=H)
    qname = f"pit_stream_{max_files}"
    q = (out.writeStream.format("memory").queryName(qname)
         .option("checkpointLocation", str(tmp_path / f"ckpt{max_files}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(f"SELECT user_id, event_id, pit_count, pit_sum "
                    f"FROM {qname}").collect()
    assert sorted(tuple(r) for r in got) == _ground_truth(pdf)
