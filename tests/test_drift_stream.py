"""Streaming per-window PSI vs the batch psi() on each window slice."""

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from hipipe_spark.streaming.drift_stream import psi_stream, reference_histogram

BASE = dt.datetime(2026, 1, 1, 12, 0, 0)
LO, HI, NB = 0.0, 100.0, 5


def _mk_files(tmp_path, chunks):
    d = tmp_path / "in"
    d.mkdir()
    for i, chunk in enumerate(chunks):
        pdf = pd.DataFrame(chunk, columns=["x", "ts"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(d / f"p{i}.parquet", index=False)
    return d


def test_psi_stream_matches_batch_per_window(spark, tmp_path):
    # reference slice: uniform-ish over [0, 100)
    ref = spark.createDataFrame(
        [(float(v % 100),) for v in range(0, 500, 7)], "x double")
    ref_counts = reference_histogram(ref, "x", LO, HI, NB)
    assert sum(ref_counts) == len(range(0, 500, 7))

    # two 10-minute windows: first mirrors the reference, second drifts low
    w1 = [(float(v % 100), BASE + dt.timedelta(seconds=v % 500))
          for v in range(0, 500, 7)]
    w2 = [(float(v % 20), BASE + dt.timedelta(minutes=10, seconds=v % 500))
          for v in range(0, 500, 7)]
    # sentinel in a third window: pushes the watermark past w2's end so
    # both real windows close; the sentinel's own window stays open and
    # is deliberately never emitted under append mode
    w3 = [(50.0, BASE + dt.timedelta(minutes=21))]
    d = _mk_files(tmp_path, (w1, w2, w3))

    src = (spark.readStream.schema("x double, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (psi_stream(src, ref_counts, "x", LO, HI,
                    window="10 minutes", watermark="0 seconds")
         .writeStream.format("memory").queryName("psis")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["window_start"]: (r["n_rows"], r["psi"])
           for r in spark.sql("select * from psis").collect()}
    assert len(got) == 2

    # batch twin per window slice
    from hipipe_spark.operators.drift import psi
    batch_in = spark.read.schema("x double, ts timestamp").parquet(str(d))
    for start, rows in ((BASE, w1), (BASE + dt.timedelta(minutes=10), w2)):
        cur = batch_in.filter(
            (F.col("ts") >= start)
            & (F.col("ts") < start + dt.timedelta(minutes=10)))
        expect = psi(ref, cur, "x", LO, HI, NB)
        n, got_psi = got[start]
        assert n == len(rows)
        assert np.isclose(got_psi, expect, rtol=1e-9)
    # the drifted window must scream, the mirrored one must not
    assert got[BASE][1] < 0.05
    assert got[BASE + dt.timedelta(minutes=10)][1] > 0.5
