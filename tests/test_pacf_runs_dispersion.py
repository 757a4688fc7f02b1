"""partial_corr / overdispersion / pacf_table / event_runs vs
numpy replicas and constructed sequences."""

import math

import numpy as np
import pandas as pd

from hipipe_spark.operators.features import partial_corr
from hipipe_spark.operators.stats import overdispersion
from hipipe_spark.operators.temporal import event_runs, pacf_table


def test_partial_corr_removes_confounder(spark):
    rng = np.random.RandomState(21)
    n = 3000
    z = rng.normal(0, 1, n)
    # x and y share ONLY the confounder z
    x = np.round(2 * z + rng.normal(0, 1, n), 3)
    y = np.round(-3 * z + rng.normal(0, 1, n), 3)
    pdf = pd.DataFrame({"g": "a", "x": x, "y": y, "z": np.round(z, 3)})
    row = partial_corr(spark.createDataFrame(pdf),
                       "g", "x", "y", "z").collect()[0]
    # raw correlation is strongly negative, partial is ~0
    assert row["r_xy"] < -0.5
    assert abs(row["r_xy_z"]) < 0.08
    # numpy replica
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    pc = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert math.isclose(row["r_xy_z"], pc, abs_tol=1e-3)


def test_overdispersion_poisson_vs_nb(spark):
    rng = np.random.RandomState(31)
    rows = []
    for u in range(400):
        rows.extend([("pois", u)] * rng.poisson(5))
        # NB via gamma-poisson mixture: heavy overdispersion
        lam = rng.gamma(shape=1.0, scale=5.0)
        rows.extend([("nb", u)] * rng.poisson(lam))
    pdf = pd.DataFrame(rows, columns=["g", "u"])
    got = {r["g"]: r.asDict()
           for r in overdispersion(spark.createDataFrame(pdf),
                                   "g", "u").collect()}
    assert 0.8 < got["pois"]["dispersion"] < 1.25
    assert got["nb"]["dispersion"] > 3.0
    assert got["nb"]["p_value"] < 1e-4
    assert got["nb"]["nb_r"] is not None and got["nb"]["nb_r"] < 3.0
    # moment-fit replica for the nb group
    sub = pdf[pdf.g == "nb"].groupby("u").size()
    sub = sub.reindex(range(400), fill_value=0)  # zero-count users
    # note: operator only sees users that APPEAR (no zero rows) —
    # replicate on appearing users only
    sub = pdf[pdf.g == "nb"].groupby("u").size().astype(float)
    m, v = sub.mean(), sub.var(ddof=1)
    assert math.isclose(got["nb"]["mean"], m, abs_tol=1e-4)
    assert math.isclose(got["nb"]["var"], v, rel_tol=1e-4)
    assert math.isclose(got["nb"]["nb_r"], m * m / (v - m), rel_tol=1e-3)


def test_pacf_ar1_cuts_off_after_lag1(spark):
    rng = np.random.RandomState(41)
    n = 4000
    phi = 0.7
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = phi * x[t - 1] + rng.normal(0, 1)
    pdf = pd.DataFrame({"t": range(n), "v": np.round(x, 4)})
    out = pacf_table(spark.createDataFrame(pdf), "t", "v",
                     max_lag=5).toPandas().sort_values("lag")
    # AR(1): pacf(1) ~ phi, later lags ~ 0 (within 2/sqrt(n) noise)
    assert abs(out.iloc[0]["pacf"] - phi) < 0.05
    for i in range(1, 5):
        assert abs(out.iloc[i]["pacf"]) < 0.06
    # ACF at lag 2 is phi^2 — NOT near zero (the pacf/acf contrast)
    assert out.iloc[1]["r"] > 0.35


def test_pacf_matches_statsmodels_style_recursion(spark):
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({"t": range(600),
                        "v": np.round(rng.normal(0, 1, 600), 3)})
    out = pacf_table(spark.createDataFrame(pdf), "t", "v",
                     max_lag=4).toPandas().sort_values("lag")
    # replica: acf with rounded mean, then Durbin-Levinson
    v = pdf["v"].to_numpy(float)
    d = v - round(v.mean(), 6)
    den = (d * d).sum()
    r = {k: round((d[k:] * d[:-k]).sum() / den, 6) for k in range(1, 5)}
    phi = {(1, 1): round(r[1], 9)}
    for k in range(2, 5):
        num = r[k] - sum(phi[(k - 1, j)] * r[k - j]
                         for j in range(1, k))
        dd = 1.0 - sum(phi[(k - 1, j)] * r[j] for j in range(1, k))
        phi[(k, k)] = round(num / dd, 9)
        for j in range(1, k):
            phi[(k, j)] = round(phi[(k - 1, j)]
                                - phi[(k, k)] * phi[(k - 1, k - j)], 9)
    for k in range(1, 5):
        assert math.isclose(out.iloc[k - 1]["pacf"],
                            round(phi[(k, k)], 6), abs_tol=2e-6), k


def test_event_runs_constructed(spark):
    seq = (["a"] * 5 + ["b"] + ["a"] * 2 + ["c"] * 3
           + ["b"] * 1 + ["c"] * 1)
    pdf = pd.DataFrame({"k": ["u"] * len(seq),
                        "i": range(len(seq)), "c": seq})
    row = event_runs(spark.createDataFrame(pdf), "k", ["i"], "c",
                     loop_min=3).collect()[0]
    assert row["n_rows"] == 13
    assert row["n_runs"] == 6
    assert row["max_run"] == 5
    assert row["top_cat"] == "a"
    assert row["n_loops"] == 2            # aaaaa and ccc
    assert math.isclose(row["loop_frac"], 8 / 13, abs_tol=1e-6)


def test_event_runs_tie_breaks_min_category(spark):
    seq = ["b"] * 3 + ["a"] * 3          # two runs tie at length 3
    pdf = pd.DataFrame({"k": ["u"] * 6, "i": range(6), "c": seq})
    row = event_runs(spark.createDataFrame(pdf), "k", ["i"], "c") \
        .collect()[0]
    assert row["top_cat"] == "a"          # min category wins the tie
