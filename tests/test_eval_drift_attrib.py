"""ranking_metrics (evaluation.py), jsd_table (drift.py),
attribution (analytics.py)."""

import math

import pytest

from hipipe_spark.operators.analytics import attribution
from hipipe_spark.operators.drift import jsd_table
from hipipe_spark.operators.evaluation import ranking_metrics


def test_ranking_metrics_exact(spark):
    # query A: candidates ranked 1..4 by score, rels 0,2,1,0
    rows = [
        ("A", 1, 0.9, 0), ("A", 2, 0.8, 2), ("A", 3, 0.7, 1), ("A", 4, 0.6, 0),
        # query B: no relevant candidate at all
        ("B", 1, 0.5, 0), ("B", 2, 0.4, 0),
    ]
    df = spark.createDataFrame(rows, "q string, cid int, score double, rel int")
    out = {r["group"]: r.asDict()
           for r in ranking_metrics(df, "q", "score", "rel", "cid", k=3).collect()}
    dcg = 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    a = out["A"]
    assert a["ndcg_at_3"] == round(dcg / idcg, 6)
    assert a["mrr"] == 0.5          # first relevant at rank 2
    assert a["precision_at_3"] == round(2 / 3, 6)
    assert a["recall_at_3"] == 1.0  # both relevant inside top 3
    b = out["B"]
    assert (b["ndcg_at_3"], b["mrr"], b["recall_at_3"]) == (0.0, 0.0, 0.0)
    with pytest.raises(ValueError):
        ranking_metrics(df, "q", "score", "rel", "cid", k=0)


def test_ranking_metrics_tiebreak_deterministic(spark):
    # equal scores: tiebreak asc decides; rel=2 sits at cid=2 -> rank 2
    rows = [("A", 1, 0.5, 0), ("A", 2, 0.5, 2)]
    df = spark.createDataFrame(rows, "q string, cid int, score double, rel int")
    out = ranking_metrics(df, "q", "score", "rel", "cid", k=2).collect()[0]
    assert out["mrr"] == 0.5


def test_jsd_symmetric_bounded_and_zero_on_identical(spark):
    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    b = spark.createDataFrame([(float((i % 10) if i % 2 else 9),) for i in range(100)], "x double")
    same = jsd_table(a, a, "x", 0.0, 10.0, n_buckets=10).collect()
    assert all(abs(r["jsd"]) < 1e-12 for r in same)
    ab = jsd_table(a, b, "x", 0.0, 10.0, n_buckets=10).collect()[0]["jsd"]
    ba = jsd_table(b, a, "x", 0.0, 10.0, n_buckets=10).collect()[0]["jsd"]
    assert abs(ab - ba) < 1e-12          # symmetric
    assert 0 < ab <= math.log(2) + 1e-12  # bounded by ln 2


def test_attribution_models(spark):
    # user 1: view, click, view, PURCHASE, click, PURCHASE
    rows = [
        (1, 1.0, "view", 1), (1, 2.0, "click", 2), (1, 3.0, "view", 3),
        (1, 4.0, "purchase", 4), (1, 5.0, "click", 5), (1, 6.0, "purchase", 6),
        # user 2: a trailing click with no conversion after it
        (2, 1.0, "click", 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts double, event_type string, event_id int")

    def run(model):
        return {r["channel"]: r.asDict() for r in attribution(
            df, ["view", "click"], "purchase", model=model).collect()}

    lin = run("linear")
    # conv 1 credit: view 2/3, click 1/3; conv 2: click 1 -> view .667 click 1.333
    assert lin["view"]["credit"] == round(2 / 3, 6)
    assert lin["click"]["credit"] == round(1 / 3 + 1.0, 6)
    assert lin["view"]["n_touches"] == 2 and lin["click"]["n_touches"] == 2
    first = run("first")
    assert first["view"]["credit"] == 1.0   # conv 1 first touch = view@1
    assert first["click"]["credit"] == 1.0  # conv 2 sole touch
    last = run("last")
    assert last["view"]["credit"] == 1.0    # conv 1 last touch = view@3
    assert last["click"]["credit"] == 1.0
    pos = run("position")
    # conv 1 (3 touches): view .4 + .2 + view... order: view,click,view ->
    # first view .4, middle click .2, last view .4; conv 2 single click 1.0
    assert pos["view"]["credit"] == 0.8
    assert pos["click"]["credit"] == 1.2
    # total credit == attributed conversions
    assert round(sum(r["credit"] for r in pos.values()), 6) == 2.0
    with pytest.raises(ValueError):
        attribution(df, ["view"], "purchase", model="shapley")
