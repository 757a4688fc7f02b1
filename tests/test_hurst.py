"""hurst_rs: white noise vs trending vs anti-persistent series."""

import math

import numpy as np
import pandas as pd

from hipipe_spark.operators.temporal import hurst_rs


def _series_frame(kind_to_vals):
    rows = []
    for k, v in kind_to_vals.items():
        for i, x in enumerate(v):
            rows.append((k, i, float(round(x, 5))))
    return pd.DataFrame(rows, columns=["k", "i", "v"])


def test_hurst_separates_memory_regimes(spark):
    rng = np.random.RandomState(17)
    n = 1024
    white = rng.normal(0, 1, n)                       # H ~ 0.5
    trend = np.cumsum(rng.normal(0.0, 1, n))          # random walk LEVELS:
    # R/S on the level series of a random walk behaves persistently
    anti = np.zeros(n)                                # anti-persistent
    for t in range(1, n):
        anti[t] = -0.6 * anti[t - 1] + rng.normal(0, 1)
    pdf = _series_frame({"white": white, "walk": trend, "anti": anti})
    out = hurst_rs(spark.createDataFrame(pdf), "k", ["i"], "v",
                   block_sizes=(8, 16, 32, 64)).toPandas()
    fit = {r["k"]: r for _, r in out[out.kind == "fit"].iterrows()}
    assert 0.35 < fit["white"]["h"] < 0.68
    assert fit["walk"]["h"] > 0.85
    assert fit["anti"]["h"] < fit["white"]["h"]
    # log-log fit of a genuine power law is tight
    assert fit["walk"]["r2"] > 0.95
    # diagnostic curve rows exist for every size
    blocks = out[(out.kind == "block") & (out.k == "white")]
    assert sorted(blocks["m"]) == [8, 16, 32, 64]
    # R/S grows with block size
    bs = blocks.sort_values("m")["rs"].to_numpy()
    assert (np.diff(bs) > 0).all()


def test_hurst_numpy_replica_single_size(spark):
    rng = np.random.RandomState(3)
    v = np.round(rng.normal(0, 1, 256), 5)
    pdf = _series_frame({"a": v})
    out = hurst_rs(spark.createDataFrame(pdf), "k", ["i"], "v",
                   block_sizes=(16, 32)).toPandas()
    row16 = out[(out.kind == "block") & (out.m == 16)].iloc[0]
    # replica for m=16
    rss = []
    for b in range(256 // 16):
        blk = v[b * 16:(b + 1) * 16]
        cum = np.cumsum(blk - blk.mean())
        r = cum.max() - cum.min()
        s = blk.std()  # population
        if s > 0:
            rss.append(r / s)
    assert math.isclose(row16["rs"], round(np.mean(rss), 9),
                        abs_tol=2e-6)
    assert row16["n_blocks"] == 16


def test_hurst_short_series_null_fit(spark):
    pdf = _series_frame({"s": np.arange(10.0)})  # < smallest block*2
    out = hurst_rs(spark.createDataFrame(pdf), "k", ["i"], "v",
                   block_sizes=(8, 16)).toPandas()
    fit = out[out.kind == "fit"]
    # only one usable size (m=8 -> 1 block) -> k=1 -> null h
    assert fit.iloc[0]["h"] is None or np.isnan(fit.iloc[0]["h"])
