"""Executed-plan audits for the sketch family: the scale contracts
(one map-side-combinable shuffle; broadcast — never sort-merge — for
sketch-sized sides) asserted on the physical plan, not just argued in
docstrings."""

import re

from hipipe_spark.operators.sketches import (
    bloom_prefilter, cms_sketch, hist_quantiles, hll_distinct)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_cms_sketch_is_one_mapside_combinable_shuffle(spark):
    df = spark.createDataFrame([(i % 50,) for i in range(2000)],
                               "item: long")
    plan = _plan(cms_sketch(df, "item", depth=4, width=32))
    # exactly one shuffle: the (d, bucket) hash — nothing else
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    # partial + final HashAggregate = map-side combine is in effect
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_bloom_prefilter_never_sort_merges(spark):
    fact = spark.createDataFrame([(i % 300,) for i in range(3000)],
                                 "k: long")
    dim = spark.createDataFrame([(i * 2,) for i in range(100)],
                                "k: long")
    plan = _plan(bloom_prefilter(fact, "k", dim, "k", m=1024))
    # the m-row bit table and the truth side are broadcast;
    # the fact side must never be sort-merge-joined
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_hist_quantiles_broadcasts_the_range_row(spark):
    df = spark.createDataFrame([("g", float(i)) for i in range(500)],
                               "g: string, v: double")
    plan = _plan(hist_quantiles(df, "g", "v", n_bins=32))
    assert "BroadcastExchange" in plan   # per-group (lo, hi, n) row
    assert "SortMergeJoin" not in plan


def test_hll_registers_shuffle_only_on_group_bucket(spark):
    df = spark.createDataFrame([("g", i) for i in range(1000)],
                               "g: string, k: long")
    plan = _plan(hll_distinct(df, "g", "k", p=8))
    # register build + per-group fold + exact side: every aggregate
    # appears as a partial/final pair — the register state itself
    # partial-aggregates map-side before its shuffle
    assert plan.count("HashAggregate") >= 8
    assert "partial_max" in plan         # register max combines map-side
    # (the final exact↔sketch join is over two group-dimension frames;
    # SMJ there is fine — both sides are tiny by construction)
