"""HBOS histogram-based outlier score (features.hbos_fit/hbos_scores).

Hand-computed histograms pin the peak normalization (modal rows score
0), additivity across features, degenerate/null handling, and the
transform-mode empty-bin policy.
"""

import math

import pytest

from hipipe_spark.operators.features import hbos_fit, hbos_scores


def test_hand_computed_two_bins(spark):
    # feature f over [0, 8): bins [0,4) x6 rows, [4,8] x2 rows
    # peak = 6 -> modal rows score 0; tail rows ln(6/2) = ln 3
    rows = [(i, float(v)) for i, v in enumerate([0, 1, 2, 3, 3, 2, 5, 8])]
    df = spark.createDataFrame(rows, "id long, f double")
    out = hbos_scores(df, ["f"], n_bins=2)
    got = {r["id"]: r["hbos"] for r in out.collect()}
    for i in range(6):
        assert got[i] == pytest.approx(0.0)
    assert got[6] == pytest.approx(round(math.log(3), 6))
    assert got[7] == pytest.approx(round(math.log(3), 6))


def test_additive_across_features(spark):
    rows = [(i, float(v), float(v)) for i, v in
            enumerate([0, 0, 0, 1, 1, 1, 9, 9])]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    one = {r["id"]: r["hbos"]
           for r in hbos_scores(df, ["a"], n_bins=3).collect()}
    two = {r["id"]: r["hbos"]
           for r in hbos_scores(df, ["a", "b"], n_bins=3).collect()}
    for i in one:
        assert two[i] == pytest.approx(round(2 * one[i], 6), abs=2e-6)


def test_degenerate_and_null_features(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, 5.0, 2.0), (3, 5.0, None)],
        "id long, const double, x double")
    # constant feature contributes 0 for every row
    got = {r["id"]: r["hbos"]
           for r in hbos_scores(df, ["const"], n_bins=4).collect()}
    assert got == {1: 0.0, 2: 0.0, 3: 0.0}
    # a null feature value -> null score for that row
    got = {r["id"]: r["hbos"]
           for r in hbos_scores(df, ["x"], n_bins=2).collect()}
    assert got[3] is None
    assert got[1] is not None


def test_transform_mode_empty_bin_is_null(spark):
    fit_df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 0, 1, 1, 10, 10])],
        "id long, f double")
    model = hbos_fit(fit_df, ["f"], n_bins=5)
    assert None in model["f"]["logp"]  # middle bins are empty
    new = spark.createDataFrame([(99, 5.0)], "id long, f double")
    got = hbos_scores(new, ["f"], model=model).collect()[0]
    assert got["hbos"] is None
    # out-of-range values clamp to the edge bins instead
    lo = hbos_scores(spark.createDataFrame([(1, -99.0)], "id long, f double"),
                     ["f"], model=model).collect()[0]
    assert lo["hbos"] is not None


def test_guards(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, f double")
    with pytest.raises(ValueError):
        hbos_fit(df, [], 4)
    with pytest.raises(ValueError):
        hbos_fit(df, ["f"], 1)
    with pytest.raises(ValueError):
        hbos_fit(spark.createDataFrame([(1, None)], "id long, f double"),
                 ["f"], 4)
