"""ols2 / durbin_watson / calendar_features / ewma_bounded vs
independent numpy-pandas replicas."""

import math

import numpy as np
import pandas as pd
import pytest

from hipipe_spark.operators.features import calendar_features
from hipipe_spark.operators.regression import durbin_watson, ols2
from hipipe_spark.operators.temporal import ewma_bounded


@pytest.fixture(scope="module")
def reg_frame(spark):
    rng = np.random.RandomState(13)
    n = 3000
    g = rng.choice(["p", "q"], n)
    x1 = np.round(rng.uniform(0, 50, n), 2)
    x2 = np.round(rng.uniform(0, 0.1, n), 3)
    y = np.round(1000 + 150.0 * x1 - 2000.0 * x2
                 + rng.normal(0, 300, n), 2)
    pdf = pd.DataFrame({"g": g, "x1": x1, "x2": x2, "y": y})
    return spark.createDataFrame(pdf).cache(), pdf


def test_ols2_matches_lstsq(spark, reg_frame):
    df, pdf = reg_frame
    got = {r["g"]: r.asDict()
           for r in ols2(df, "g", "y", "x1", "x2").collect()}
    for g, sub in pdf.groupby("g"):
        X = np.column_stack([np.ones(len(sub)), sub["x1"], sub["x2"]])
        yv = sub["y"].to_numpy(float)
        beta, res, _, _ = np.linalg.lstsq(X, yv, rcond=None)
        sse = ((yv - X @ beta) ** 2).sum()
        syy = ((yv - yv.mean()) ** 2).sum()
        r2 = 1 - sse / syy
        assert math.isclose(got[g]["b0"], beta[0], rel_tol=1e-5,
                            abs_tol=1e-2)
        assert math.isclose(got[g]["b1"], beta[1], rel_tol=1e-5)
        assert math.isclose(got[g]["b2"], beta[2], rel_tol=1e-5)
        assert math.isclose(got[g]["r2"], r2, abs_tol=1e-5)
        # planted slopes recovered
        assert abs(got[g]["b1"] - 150.0) < 5.0
        # t of the strong predictor is enormous
        assert got[g]["t1"] > 100.0
        # classic OLS standard error check via covariance inverse
        XtX_inv = np.linalg.inv(X.T @ X)
        sig2 = sse / (len(sub) - 3)
        assert math.isclose(got[g]["se1"],
                            math.sqrt(sig2 * XtX_inv[1, 1]),
                            rel_tol=1e-4)


def test_ols2_singular_design_null(spark):
    pdf = pd.DataFrame({"g": ["a"] * 50,
                        "x1": [float(i) for i in range(50)],
                        "x2": [2.0 * i for i in range(50)],  # collinear
                        "y": [3.0 * i for i in range(50)]})
    row = ols2(spark.createDataFrame(pdf), "g", "y", "x1", "x2") \
        .collect()[0]
    assert row["b1"] is None and row["b2"] is None and row["r2"] is None


def test_durbin_watson_detects_correlation(spark):
    rng = np.random.RandomState(3)
    n = 500
    # key "w": white noise -> DW ~ 2 ; key "t": slow random walk -> DW ~ 0
    walk = np.cumsum(rng.normal(0, 1, n))
    pdf = pd.DataFrame({
        "k": ["w"] * n + ["t"] * n,
        "i": list(range(n)) * 2,
        "v": np.round(np.concatenate([rng.normal(0, 1, n), walk]), 4),
    })
    got = {r["k"]: r.asDict()
           for r in durbin_watson(spark.createDataFrame(pdf),
                                  "k", ["i"], "v").collect()}
    assert 1.7 < got["w"]["dw"] < 2.3
    assert got["t"]["dw"] < 0.5
    assert got["t"]["rho1"] > 0.75
    # numpy replica for the white key
    v = pdf[pdf.k == "w"]["v"].to_numpy(float)
    d = v - round(v.mean(), 6)
    dw = (np.diff(d) ** 2).sum() / (d ** 2).sum()
    assert math.isclose(got["w"]["dw"], dw, abs_tol=1e-5)


def test_durbin_watson_short_key_null(spark):
    pdf = pd.DataFrame({"k": ["s"] * 3, "i": [1, 2, 3],
                        "v": [1.0, 2.0, 3.0]})
    row = durbin_watson(spark.createDataFrame(pdf), "k", ["i"], "v") \
        .collect()[0]
    assert row["dw"] is None and row["n"] == 3


def test_calendar_features_properties(spark):
    pdf = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=500,
                                            freq="7h41min")})
    out = calendar_features(spark.createDataFrame(pdf), "ts").toPandas()
    for p in ("hour", "dow", "month", "mod"):
        mag = out[f"{p}_sin"] ** 2 + out[f"{p}_cos"] ** 2
        assert np.allclose(mag, 1.0, atol=1e-5)
    # weekend flag matches pandas (Sunday/Saturday)
    wk = pdf["ts"].dt.dayofweek.isin([5, 6]).to_numpy()  # Sat=5, Sun=6
    assert (out["is_weekend"].to_numpy() == wk).all()
    # hour encoding round-trips: angle recovered within a bin
    ang = np.arctan2(out["hour_sin"], out["hour_cos"]) % (2 * np.pi)
    rec = np.round(ang / (2 * np.pi) * 24) % 24
    assert (rec == pdf["ts"].dt.hour.to_numpy()).all()


def test_ewma_bounded_matches_replica(spark):
    rng = np.random.RandomState(9)
    pdf = pd.DataFrame({
        "k": ["a"] * 40 + ["b"] * 5,
        "i": list(range(40)) + list(range(5)),
        "v": np.round(rng.uniform(0, 10, 45), 2),
    })
    out = ewma_bounded(spark.createDataFrame(pdf), "k", ["i"], "v",
                       alpha=0.5, window=8).toPandas()
    out = out.sort_values(["k", "i"]).reset_index(drop=True)
    for k, sub in pdf.groupby("k"):
        v = sub.sort_values("i")["v"].to_numpy(float)
        for t in range(len(v)):
            lo = max(0, t - 7)
            xs = v[lo:t + 1][::-1]          # newest first
            wts = 0.5 ** np.arange(len(xs))
            ref = (xs * wts).sum() / wts.sum()
            got = out[(out.k == k) & (out.i == sub.sort_values("i")
                                      ["i"].iloc[t])]
            assert math.isclose(got["ewma"].iloc[0], ref, abs_tol=1e-5)
            assert got["ewma_n"].iloc[0] == len(xs)
    # smoothing reduces variance but tracks level
    a = out[out.k == "a"]
    assert a["ewma"].std() < pdf[pdf.k == "a"]["v"].std()
