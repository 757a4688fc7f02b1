"""ols2_influence / runs_test / grubbs_stat / icc_oneway /
cronbach_alpha vs numpy replicas."""

import math

import numpy as np
import pandas as pd

from hipipe_spark.operators.evaluation import cronbach_alpha
from hipipe_spark.operators.regression import ols2_influence
from hipipe_spark.operators.stats import (
    grubbs_stat, icc_oneway, runs_test,
)


def test_influence_matches_numpy_hat_matrix(spark):
    rng = np.random.RandomState(2)
    n = 400
    x1 = np.round(rng.uniform(0, 10, n), 2)
    x2 = np.round(rng.uniform(0, 5, n), 2)
    y = np.round(2.0 + 1.5 * x1 - 0.7 * x2 + rng.normal(0, 1, n), 3)
    # plant one gross outlier at high leverage
    x1[0], x2[0], y[0] = 30.0, 20.0, 100.0
    pdf = pd.DataFrame({"g": "a", "x1": x1, "x2": x2, "y": y})
    got = ols2_influence(spark.createDataFrame(pdf), "g", "y",
                         "x1", "x2", top_k=3).toPandas()
    X = np.column_stack([np.ones(n), x1, x2])
    H = X @ np.linalg.inv(X.T @ X) @ X.T
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    e = y - X @ beta
    sig2 = (e ** 2).sum() / (n - 3)
    cooks = e ** 2 * np.diag(H) / (3 * sig2 * (1 - np.diag(H)) ** 2)
    order = np.argsort(-cooks)[:3]
    assert len(got) == 3
    # the planted outlier dominates
    assert got.iloc[0]["cooks_d"] > 10 * got.iloc[1]["cooks_d"]
    for rank, idx in enumerate(order):
        assert math.isclose(got.iloc[rank]["cooks_d"], cooks[idx],
                            rel_tol=1e-3, abs_tol=1e-5)
        assert math.isclose(got.iloc[rank]["leverage"],
                            np.diag(H)[idx], rel_tol=1e-3,
                            abs_tol=1e-5)


def test_runs_test_alternating_vs_blocky(spark):
    # alternating signs -> far MORE runs than random (z >> 0)
    # one long block each side -> far fewer (z << 0)
    n = 200
    alt = [1.0 if i % 2 == 0 else -1.0 for i in range(n)]
    blk = [1.0] * (n // 2) + [-1.0] * (n // 2)
    pdf = pd.DataFrame({
        "k": ["alt"] * n + ["blk"] * n,
        "i": list(range(n)) * 2,
        "v": alt + blk,
    })
    got = {r["k"]: r.asDict()
           for r in runs_test(spark.createDataFrame(pdf),
                              "k", ["i"], "v").collect()}
    assert got["alt"]["runs"] == n           # every step flips
    assert got["blk"]["runs"] == 2
    assert got["alt"]["z"] > 10
    assert got["blk"]["z"] < -10
    assert got["alt"]["n1"] == got["alt"]["n2"] == n // 2


def test_grubbs_flags_planted_outlier(spark):
    rng = np.random.RandomState(4)
    v = np.round(rng.normal(50, 2, 500), 2)
    v[13] = 90.0  # gross outlier
    pdf = pd.DataFrame({"g": ["a"] * 500, "v": v})
    row = grubbs_stat(spark.createDataFrame(pdf), "g", "v").collect()[0]
    mu = v.mean()
    sd = v.std(ddof=1)
    g = np.abs(v - mu).max() / sd
    assert math.isclose(row["g_stat"], g, rel_tol=1e-3)
    assert row["g_stat"] > 10  # wildly non-normal max deviation


def test_icc_high_vs_low_clustering(spark):
    rng = np.random.RandomState(6)
    rows = []
    # seg "hi": group means dominate; seg "lo": pure noise
    for g in range(20):
        base = rng.normal(0, 10)
        for _ in range(15):
            rows.append(("hi", g, round(base + rng.normal(0, 1), 3)))
            rows.append(("lo", g, round(rng.normal(0, 1), 3)))
    pdf = pd.DataFrame(rows, columns=["seg", "grp", "v"])
    got = {r["seg"]: r.asDict()
           for r in icc_oneway(spark.createDataFrame(pdf),
                               "seg", "grp", "v").collect()}
    assert got["hi"]["icc1"] > 0.9
    assert abs(got["lo"]["icc1"]) < 0.15
    # balanced design: n0 == group size
    assert math.isclose(got["hi"]["n0"], 15.0, abs_tol=1e-6)
    # numpy replica for "hi"
    sub = pdf[pdf.seg == "hi"]
    groups = [g["v"].to_numpy(float) for _, g in sub.groupby("grp")]
    allv = sub["v"].to_numpy(float)
    k, n = len(groups), len(allv)
    ssb = sum(len(x) * (x.mean() - allv.mean()) ** 2 for x in groups)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in groups)
    msb, msw = ssb / (k - 1), ssw / (n - k)
    icc = (msb - msw) / (msb + (15 - 1) * msw)
    assert math.isclose(got["hi"]["icc1"], icc, abs_tol=1e-4)


def test_cronbach_consistent_vs_random_items(spark):
    rng = np.random.RandomState(8)
    rows = []
    for s in range(120):
        ability = rng.normal(0, 5)
        for i in range(4):
            # consistent items share the ability signal
            rows.append((s, f"c{i}", round(ability + rng.normal(0, 1), 3)))
            # random items carry none
            rows.append((s, f"r{i}", round(rng.normal(0, 1), 3)))
    pdf = pd.DataFrame(rows, columns=["s", "i", "v"])
    cons = pdf[pdf.i.str.startswith("c")]
    rand = pdf[pdf.i.str.startswith("r")]
    a_hi = cronbach_alpha(spark.createDataFrame(cons),
                          "s", "i", "v").collect()[0]
    a_lo = cronbach_alpha(spark.createDataFrame(rand),
                          "s", "i", "v").collect()[0]
    assert a_hi["alpha"] > 0.9
    assert a_lo["alpha"] < 0.4
    assert a_hi["k"] == 4 and a_hi["n_subjects"] == 120
    # numpy replica for the consistent half
    grid = cons.pivot(index="s", columns="i", values="v")
    iv = grid.var(axis=0, ddof=1).sum()
    tv = grid.sum(axis=1).var(ddof=1)
    alpha = 4 / 3 * (1 - iv / tv)
    assert math.isclose(a_hi["alpha"], alpha, abs_tol=1e-3)


def test_cronbach_incomplete_subjects_excluded(spark):
    pdf = pd.DataFrame({
        "s": [1, 1, 2, 2, 3],          # subject 3 misses item "b"
        "i": ["a", "b", "a", "b", "a"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    row = cronbach_alpha(spark.createDataFrame(pdf),
                         "s", "i", "v").collect()[0]
    assert row["n_subjects"] == 2
    assert row["k"] == 2
