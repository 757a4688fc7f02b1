"""theil_u / srm_check / vocab_richness replicas."""

import math

import numpy as np
import pandas as pd
import pytest

from hipipe_spark.operators.drift import srm_check, theil_u
from hipipe_spark.operators.retrieval import vocab_richness


def test_theil_u_directionality(spark):
    # y = f(x) deterministically, but x NOT recoverable from y:
    # U(y|x) = 1, U(x|y) < 1
    rows = []
    for i in range(600):
        x = i % 6
        y = x % 2
        rows.append((f"x{x}", f"y{y}"))
    pdf = pd.DataFrame(rows, columns=["x", "y"])
    row = theil_u(spark.createDataFrame(pdf), "x", "y").collect()[0]
    assert math.isclose(row["u_y_given_x"], 1.0, abs_tol=1e-6)
    assert row["u_x_given_y"] < 0.5
    # mi replica
    assert math.isclose(row["mi"], row["h_y"], abs_tol=1e-6)


def test_theil_u_independent_near_zero(spark):
    rng = np.random.RandomState(9)
    pdf = pd.DataFrame({"x": rng.choice(list("abcd"), 5000),
                        "y": rng.choice(list("pq"), 5000)})
    row = theil_u(spark.createDataFrame(pdf), "x", "y").collect()[0]
    assert abs(row["u_y_given_x"]) < 0.01
    assert abs(row["u_x_given_y"]) < 0.01


def test_srm_detects_broken_allocation(spark):
    rng = np.random.RandomState(12)
    ok_arm = np.where(rng.rand(20000) < 0.5, "a", "b")
    bad_arm = np.where(rng.rand(20000) < 0.55, "a", "b")  # 55/45 leak
    pdf = pd.DataFrame({
        "seg": ["ok"] * 20000 + ["bad"] * 20000,
        "arm": np.concatenate([ok_arm, bad_arm]),
    })
    got = {r["seg"]: r.asDict()
           for r in srm_check(spark.createDataFrame(pdf), "seg", "arm",
                              {"a": 0.5, "b": 0.5}).collect()}
    assert got["ok"]["srm"] is False
    assert got["bad"]["srm"] is True
    assert got["bad"]["p_value"] < 1e-4
    # chi2 replica for the bad segment
    na = (bad_arm == "a").sum()
    nb = 20000 - na
    chi2 = (na - 10000) ** 2 / 10000 + (nb - 10000) ** 2 / 10000
    assert math.isclose(got["bad"]["chi2"], chi2, rel_tol=1e-6)


def test_srm_rejects_bad_expected(spark):
    pdf = pd.DataFrame({"s": ["x"], "arm": ["a"]})
    with pytest.raises(ValueError):
        srm_check(spark.createDataFrame(pdf), "s", "arm",
                  {"a": 0.6, "b": 0.6})


def test_vocab_richness_replica(spark):
    texts = ["aa bb cc", "aa bb", "aa dd", "ee"]
    # counts: aa=3 bb=2 cc=1 dd=1 ee=1 -> f1=3 f2=1 types=5 tokens=8
    pdf = pd.DataFrame({"text": texts})
    row = vocab_richness(spark.createDataFrame(pdf), "text").collect()[0]
    assert row["n_tokens"] == 8 and row["n_types"] == 5
    assert row["f1"] == 3 and row["f2"] == 1
    assert math.isclose(row["chao1"], 5 + 9 / 2, abs_tol=1e-9)
    assert math.isclose(row["gt_unseen"], 3 / 8, abs_tol=1e-9)
    assert math.isclose(row["coverage"], 5 / 8, abs_tol=1e-9)


def test_vocab_richness_no_singletons_bias_corrected(spark):
    pdf = pd.DataFrame({"text": ["aa aa bb bb", "aa bb"]})
    # aa=3 bb=3 -> f1=0 f2=0 -> chao1 = types + 0
    row = vocab_richness(spark.createDataFrame(pdf), "text").collect()[0]
    assert row["f1"] == 0 and row["f2"] == 0
    assert math.isclose(row["chao1"], 2.0, abs_tol=1e-9)
    assert math.isclose(row["coverage"], 1.0, abs_tol=1e-9)
