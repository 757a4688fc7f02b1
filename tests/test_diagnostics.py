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
