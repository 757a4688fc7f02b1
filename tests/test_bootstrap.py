"""Poisson bootstrap CI (operators/bootstrap.py)."""

import math

import pytest

from hipipe_spark.operators.bootstrap import (
    _CUM, MAX_W, bootstrap_mean_ci, _poisson_w)


def test_poisson_breakpoints_are_poisson1():
    # cum[k] = P(X <= k) for X ~ Poisson(1)
    for k, c in enumerate(_CUM):
        exact = sum(math.exp(-1) / math.factorial(j) for j in range(k + 1))
        assert abs(c - exact) < 1e-15
    assert _CUM[-1] > 0.999998  # P(X<=8) for Poisson(1) ~ 0.99999889


def test_bootstrap_ci_covers_mean_and_is_deterministic(spark):
    rows = [(i, float(10 + (i * 7) % 5)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = bootstrap_mean_ci(df, "v", "id", n_reps=60, seed=1).collect()[0]
    b = bootstrap_mean_ci(df, "v", "id", n_reps=60, seed=1).collect()[0]
    assert a == b
    assert a["ci_lo"] <= a["mean"] <= a["ci_hi"]
    assert a["n"] == 2000 and a["n_reps_used"] == 60
    # CI width shrinks roughly like 1/sqrt(n): a 20x bigger sample
    rows_big = [(i, float(10 + (i * 7) % 5)) for i in range(40000)]
    big = bootstrap_mean_ci(
        spark.createDataFrame(rows_big, "id long, v double"),
        "v", "id", n_reps=60, seed=1).collect()[0]
    assert (big["ci_hi"] - big["ci_lo"]) < (a["ci_hi"] - a["ci_lo"])


def test_bootstrap_grouped_and_mean_weighting(spark):
    rows = ([(i, "a", 100.0) for i in range(500)]
            + [(1000 + i, "b", 1.0) for i in range(500)])
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r["g"]: r for r in
           bootstrap_mean_ci(df, "v", "id", group="g",
                             n_reps=40, seed=2).collect()}
    # constant per group -> every replicate mean is exactly the mean
    assert out["a"]["ci_lo"] == out["a"]["ci_hi"] == out["a"]["mean"] == 100.0
    assert out["b"]["mean"] == 1.0


def test_bootstrap_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "v", "id", n_reps=1)
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "v", "id", alpha=1.5)
