"""Sketch invariants: CMS never underestimates, KMV error bounds and
saturation fallback, Bloom zero false negatives, sketch mergeability."""

import pyspark.sql.functions as F
import pytest

from hipipe_spark.operators.sketches import (
    bloom_prefilter, cms_heavy_hitters, cms_sketch, kmv_distinct)


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf-ish: item i appears ~ 600/i times, 40 distinct items
    rows = [(i,) for i in range(1, 41) for _ in range(600 // i)]
    return spark.createDataFrame(rows, "item: long").cache()


def test_cms_never_underestimates(spark, skewed):
    out = cms_heavy_hitters(skewed, "item", top_n=40,
                            depth=4, width=16).collect()
    assert len(out) == 40
    assert all(r.overestimate >= 0 for r in out)
    assert all(r.cms_estimate >= r.true_cnt for r in out)


def test_cms_exact_when_wide(spark, skewed):
    out = cms_heavy_hitters(skewed, "item", top_n=40,
                            depth=4, width=4096).collect()
    assert all(r.overestimate == 0 for r in out)


def test_cms_sketch_merges_linearly(spark, skewed):
    a = skewed.where("item % 2 = 0")
    b = skewed.where("item % 2 = 1")
    whole = {(r.d, r.bucket): r.cnt
             for r in cms_sketch(skewed, "item", 4, 16).collect()}
    merged = {}
    for part in (a, b):
        for r in cms_sketch(part, "item", 4, 16).collect():
            merged[(r.d, r.bucket)] = merged.get((r.d, r.bucket), 0) + r.cnt
    assert merged == whole


def test_kmv_saturated_estimate_close(spark):
    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)],
                               "g: string, k: long")
    r = kmv_distinct(df, "g", "k", k=64, tau=0.1).collect()[0]
    assert r.saturated
    assert r.exact_distinct == n
    assert abs(r.kmv_estimate - n) / n < 0.35  # k=64 → ~12% stderr


def test_kmv_unsaturated_uses_theta_estimator(spark):
    # < k survivors below tau → fixed-threshold estimate n_kept / tau,
    # NOT the raw survivor count (which would be a ~1/tau underestimate)
    df = spark.createDataFrame([("g", i) for i in range(50)],
                               "g: string, k: long")
    r = kmv_distinct(df, "g", "k", k=64, tau=0.1).collect()[0]
    assert not r.saturated
    assert r.kmv_estimate == round(r.n_kept / 0.1, 2)
    assert r.n_kept <= 50


def test_kmv_group_with_zero_survivors_still_reported(spark):
    # tau tiny → almost surely no survivors in a 3-row group
    df = spark.createDataFrame([("g", i) for i in range(3)],
                               "g: string, k: long")
    out = kmv_distinct(df, "g", "k", k=64, tau=1e-9).collect()
    assert len(out) == 1 and not out[0].saturated


def test_bloom_zero_false_negatives(spark):
    fact = spark.createDataFrame([(i % 500,) for i in range(3000)],
                                 "k: long")
    dim = spark.createDataFrame([(i * 3,) for i in range(120)],
                                "k: long")
    r = bloom_prefilter(fact, "k", dim, "k", m=1024,
                        n_hashes=3).collect()[0]
    true_semi = (fact.select("k").distinct()
                 .join(dim.select("k").distinct(), "k").count())
    assert r.n_true == true_semi          # never drops a real match
    assert r.n_candidates >= r.n_true
    assert r.n_fact_keys == 500
    assert r.n_false_positive == r.n_candidates - r.n_true


def test_bloom_fp_rate_shrinks_with_m(spark):
    fact = spark.createDataFrame([(i,) for i in range(2000)], "k: long")
    dim = spark.createDataFrame([(i * 7,) for i in range(150)], "k: long")
    small = bloom_prefilter(fact, "k", dim, "k", m=512,
                            n_hashes=3).collect()[0]
    big = bloom_prefilter(fact, "k", dim, "k", m=16384,
                          n_hashes=3).collect()[0]
    assert big.fp_rate <= small.fp_rate
    assert big.n_true == small.n_true


def test_hll_estimate_within_error_bound(spark):
    from hipipe_spark.operators.sketches import hll_distinct
    n = 20000
    df = spark.createDataFrame([("g", i) for i in range(n)],
                               "g: string, k: long")
    r = hll_distinct(df, "g", "k", p=10).collect()[0]
    assert r.exact_distinct == n and r.n_registers == 1024
    assert abs(r.hll_estimate - n) / n < 0.1   # ~3× the 3.3% stderr


def test_hll_small_range_linear_counting(spark):
    from hipipe_spark.operators.sketches import hll_distinct
    df = spark.createDataFrame([("g", i) for i in range(100)] * 5,
                               "g: string, k: long")
    r = hll_distinct(df, "g", "k", p=10).collect()[0]
    # linear-counting regime: near-exact at 100 ≪ 1024 registers
    assert abs(r.hll_estimate - 100) < 5
    assert r.exact_distinct == 100


def test_hll_invariant_to_duplication(spark):
    from hipipe_spark.operators.sketches import hll_distinct
    once = spark.createDataFrame([("g", i) for i in range(3000)],
                                 "g: string, k: long")
    many = spark.createDataFrame([("g", i % 3000) for i in range(30000)],
                                 "g: string, k: long")
    a = hll_distinct(once, "g", "k").collect()[0].hll_estimate
    b = hll_distinct(many, "g", "k").collect()[0].hll_estimate
    assert a == b                       # registers see sets, not bags
