"""Skew diagnostics: hot_keys ranking/shares and group_size_stats."""

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.diagnostics import group_size_stats, hot_keys


@pytest.fixture(scope="module")
def skewed(spark):
    rows = ([("hot", i) for i in range(50)]
            + [("warm", i) for i in range(30)]
            + [(f"cold{k}", i) for k in range(4) for i in range(5)])
    return spark.createDataFrame(rows, "k string, v int").cache()


def test_hot_keys_ranking(skewed):
    out = hot_keys(skewed, "k", top_n=3).orderBy("rank").collect()
    assert [(r.k, r.n_rows, r.rank) for r in out] == [
        ("hot", 50, 1), ("warm", 30, 2), ("cold0", 5, 3)]
    assert out[0].share == 0.5
    assert out[1].cum_share == 0.8
    assert out[2].cum_share == 0.85
    # tie-break: cold0 < cold1 ... deterministic
    with pytest.raises(ValueError):
        hot_keys(skewed, "k", top_n=0)


def test_group_size_stats(skewed):
    r = group_size_stats(skewed, "k").collect()[0]
    assert (r.n_keys, r.n_rows, r.max_size) == (6, 100, 50)
    assert r.mean_size == pytest.approx(100 / 6, abs=1e-6)
    assert r.p50_size == 5.0
    assert r.skew_factor == pytest.approx(3.0, abs=1e-6)
    ra = group_size_stats(skewed, "k", approx=True).collect()[0]
    assert ra.max_size == 50


def test_hot_keys_multi_key(spark):
    df = spark.createDataFrame(
        [("a", 1, i) for i in range(4)] + [("a", 2, 0), ("b", 1, 0)],
        "x string, y int, v int")
    out = hot_keys(df, ["x", "y"], top_n=2).orderBy("rank").collect()
    assert [(r.x, r.y, r.n_rows) for r in out] == [("a", 1, 4), ("a", 2, 1)]


def test_freshness_report(spark):
    import datetime as dt

    from hipipe_spark.operators.diagnostics import freshness_report

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("u1", base + dt.timedelta(seconds=s)) for s in (10, 100, 1000)]
        + [("u2", base)],  # u2 has no right rows -> unmatched
        "conv_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", base)], "conv_id string, ts timestamp")
    row = freshness_report(left, right, exact=True).collect()[0]
    assert row["n_left"] == 4 and row["n_matched"] == 3
    assert row["match_rate"] == 0.75
    # staleness over matched rows: (10, 100, 1000)
    assert row["max_staleness"] == 1000.0
    assert row["p50_staleness"] == 100.0
    assert abs(row["mean_staleness"] - (1110.0 / 3)) < 1e-6
