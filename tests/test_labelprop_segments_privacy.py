"""label_propagation (graph.py), topic_segments (transcripts.py),
dup_weights (dedup.py), k_anonymity (validate.py)."""

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.dedup import dup_weights
from hipipe_spark.operators.graph import label_propagation
from hipipe_spark.operators.transcripts import topic_segments
from hipipe_spark.operators.validate import k_anonymity


def test_label_propagation_spreads_and_clamps(spark):
    # chain a-b-c-d plus isolated seed x; seeds: a=hi, d=lo
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    seeds = spark.createDataFrame(
        [("a", "hi"), ("d", "lo")], "node string, label string")
    out = {r["node"]: (r["label"], r["seeded"]) for r in
           label_propagation(edges, seeds, n_iter=4).collect()}
    assert out["a"] == ("hi", True) and out["d"] == ("lo", True)
    # b sees labeled neighbor a first; c sees d (and later b)
    assert out["b"][0] == "hi" and not out["b"][1]
    assert out["c"][0] == "lo"
    assert len(out) == 4  # no unreached extras


def test_label_propagation_majority_and_tiebreak(spark):
    # u has neighbors: two labeled "z", one labeled "a" -> majority z;
    # v has one "z" one "a" -> tie -> smallest label "a"
    edges = spark.createDataFrame(
        [("s1", "u"), ("s2", "u"), ("s3", "u"), ("s1", "v"), ("s4", "v")],
        "src string, dst string")
    seeds = spark.createDataFrame(
        [("s1", "z"), ("s2", "z"), ("s3", "a"), ("s4", "a")],
        "node string, label string")
    out = {r["node"]: r["label"] for r in
           label_propagation(edges, seeds, n_iter=1).collect()}
    assert out["u"] == "z"
    assert out["v"] == "a"
    with pytest.raises(ValueError):
        label_propagation(edges, seeds, n_iter=-1)


def test_topic_segments_cut_on_content_shift(spark):
    rows = [
        (1, 0, 1.0, "install the spark cluster on kubernetes"),
        (1, 1, 2.0, "the spark cluster install needs kubernetes nodes"),
        (1, 2, 3.0, "unrelated cooking recipe with garlic butter"),
        (1, 3, 4.0, "garlic butter recipe cooking steps"),
    ]
    df = spark.createDataFrame(rows, "conv_id int, turn_idx int, ts double, text string")
    out = {r["turn_idx"]: r for r in
           topic_segments(df, threshold=0.2).collect()}
    assert out[0]["segment_seq"] == 0 and out[0]["prev_jaccard"] is None
    assert out[1]["segment_seq"] == 0          # high overlap, same segment
    assert out[2]["segment_seq"] == 1          # topic shift
    assert out[3]["segment_seq"] == 1
    assert out[2]["segment_id"] == "1#1"


def test_dup_weights_inverse_cluster_size(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    out = {r["doc_id"]: r for r in dup_weights(docs, pairs).collect()}
    assert out[0]["cluster_size"] == 3 and out[0]["weight"] == round(1 / 3, 6)
    assert out[3]["cluster_size"] == 1 and out[3]["weight"] == 1.0
    assert out[4]["cluster_size"] == 2
    # total weight == number of semantic documents: {0,1,2},{3},{4,5} -> 3
    total = sum(r["weight"] for r in out.values())
    assert abs(total - 3.0) < 1e-4


def test_k_anonymity_violations(spark):
    rows = ([("US", 1980, "flu")] * 5          # k-ok but l-violating (1 value)
            + [("FR", 1990, "ok1"), ("FR", 1990, "ok2")]  # k-violating (2 < 5)
            + [("DE", 1970, "a"), ("DE", 1970, "b"),
               ("DE", 1970, "c"), ("DE", 1970, "d"), ("DE", 1970, "e")])
    df = spark.createDataFrame(rows, "country string, yob int, diag string")
    out = {(r["country"], r["yob"]): r for r in
           k_anonymity(df, ["country", "yob"], k=5,
                       sensitive_col="diag").collect()}
    assert out[("US", 1980)]["violation"] == "l"
    assert out[("FR", 1990)]["violation"] == "k"
    assert ("DE", 1970) not in out
    # without sensitive column only k violations remain
    out2 = k_anonymity(df, ["country", "yob"], k=5).collect()
    assert [(r["country"], r["violation"]) for r in out2] == [("FR", "k")]
    with pytest.raises(ValueError):
        k_anonymity(df, [], k=5)
