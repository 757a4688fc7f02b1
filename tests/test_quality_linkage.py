"""Gini known values, Benford conformity on planted data, quantile
normalization identity/marginals, Fellegi-Sunter decisions."""

import math

import pytest

from hipipe_spark.operators.encoders import quantile_normalize
from hipipe_spark.operators.linkage import fs_link_score
from hipipe_spark.operators.stats import gini_coefficient
from hipipe_spark.operators.validate import benford


def test_gini_known_values(spark):
    rows = ([("equal", 5.0)] * 10
            + [("onehas", 0.0)] * 9 + [("onehas", 100.0)])
    df = spark.createDataFrame(rows, "g: string, v: double")
    out = {r.g: r for r in gini_coefficient(df, "g", "v").collect()}
    assert out["equal"].gini == 0.0
    # all mass on one of 10 → G = (n-1)/n = 0.9
    assert out["onehas"].gini == 0.9


def test_gini_null_on_zero_total(spark):
    df = spark.createDataFrame([("z", 0.0)] * 5, "g: string, v: double")
    r = gini_coefficient(df, "g", "v").collect()[0]
    assert r.gini is None


def test_benford_conforming_vs_uniform(spark):
    # geometric growth 1.05^k is Benford-conforming; uniform 100..999
    # is maximally non-conforming (every first digit equally likely)
    rows = ([("geo", 1.05 ** k) for k in range(1, 1000)]
            + [("uni", float(v)) for v in range(100, 1000)])
    df = spark.createDataFrame(rows, "g: string, v: double")
    out = benford(df, "g", "v").collect()
    mad = {r.g: r.mad for r in out}
    assert mad["geo"] < 0.03            # near-conforming (21 log cycles)
    assert mad["uni"] > 0.04            # flat distribution: far off
    assert mad["geo"] < mad["uni"]
    # every group reports all 9 digits, shares sum to 1
    for g in ("geo", "uni"):
        digs = [r for r in out if r[0] == g]
        assert sorted(r.digit for r in digs) == list(range(1, 10))
        assert abs(sum(r.share for r in digs) - 1.0) < 1e-4


def test_quantile_normalize_forces_identical_marginals(spark):
    rows = ([("a", i, float(i)) for i in range(100)]          # uniform
            + [("b", i, 1000.0 + 10.0 * i * i) for i in range(100)])
    df = spark.createDataFrame(rows, "g: string, id: long, v: double")
    out = quantile_normalize(df, "g", "v", "id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.qn_value)
    assert sorted(by_g["a"]) == sorted(by_g["b"])   # identical marginals
    # rank preserved within group
    a = sorted((r.v, r.qn_value) for r in out if r.g == "a")
    assert all(a[i][1] <= a[i + 1][1] for i in range(len(a) - 1))


def test_quantile_normalize_rejects_unequal_groups(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)],
        "g: string, id: long, v: double")
    with pytest.raises(ValueError):
        quantile_normalize(df, "g", "v", "id")


def test_fs_link_score_decisions(spark):
    df = spark.createDataFrame(
        [(1, 2, True, True), (3, 4, False, False), (5, 6, True, False)],
        "id_a: long, id_b: long, f1: boolean, f2: boolean")
    m, u = [0.9, 0.8], [0.1, 0.2]
    out = {(r.id_a, r.id_b): r for r in
           fs_link_score(df, ["f1", "f2"], m, u,
                         upper=3.0, lower=-3.0).collect()}
    w_full = round(math.log2(0.9 / 0.1), 6) + round(math.log2(0.8 / 0.2), 6)
    assert abs(out[(1, 2)].weight - round(w_full, 4)) < 1e-9
    assert out[(1, 2)].decision == "link"
    assert out[(3, 4)].decision == "non_link"
    assert out[(5, 6)].decision == "possible"


def test_fs_link_score_validates_params(spark):
    df = spark.createDataFrame([(1, 2, True)],
                               "id_a: long, id_b: long, f1: boolean")
    with pytest.raises(ValueError):
        fs_link_score(df, ["f1"], m=[0.5], u=[0.6])   # u > m
