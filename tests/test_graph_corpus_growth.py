"""PageRank (operators/graph.py) and vocabulary-growth curve
(operators/corpus.py vocab_growth) semantics."""

import math

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.corpus import vocab_growth
from hipipe_spark.operators.graph import pagerank


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_sums_to_one_and_matches_numpy(spark):
    # small deterministic digraph incl. a dangling node (d has no out-edge)
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = _ranks(pagerank(e, n_iter=25))
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)

    # reference power iteration in plain python
    nodes = sorted({x for p in edges for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    r = [1.0 / n] * n
    damp = 0.85
    for _ in range(25):
        nxt = [(1 - damp) / n] * n
        dang = sum(r[idx[v]] for v in nodes if v not in out)
        for s, ds in out.items():
            share = r[idx[s]] / len(ds)
            for d in ds:
                nxt[idx[d]] += damp * share
        for i in range(n):
            nxt[i] += damp * dang / n
        r = nxt
    for v in nodes:
        assert math.isclose(got[v], r[idx[v]], rel_tol=1e-9), v


def test_pagerank_weights_and_parallel_edges(spark):
    # a->b weight 3 and a->b weight 1 collapse to p=1 (only out-edge);
    # weighted split: x->y w=3, x->z w=1 gives y 3x z's contribution
    e = spark.createDataFrame(
        [("x", "y", 3.0), ("x", "z", 1.0), ("y", "x", 1.0), ("z", "x", 1.0)],
        "src string, dst string, w double")
    got = _ranks(pagerank(e, weight="w", n_iter=40))
    assert got["y"] > got["z"]
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)


def test_pagerank_empty_and_zero_iter(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank(e, n_iter=3).count() == 0
    e2 = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = _ranks(pagerank(e2, n_iter=0))
    assert got == {"a": 0.5, "b": 0.5}
    with pytest.raises(ValueError):
        pagerank(e2, n_iter=-1)


def test_vocab_growth_curve(spark):
    # ids 0..9 with 10 checkpoints: bin == doc_id (span 10, width 1)
    rows = [
        (0, "alpha beta"),          # bin 0: vocab {alpha, beta}
        (1, "alpha alpha"),         # bin 1: no new vocab, 2 tokens
        (5, "beta gamma"),          # bin 5: gamma new
        (9, "delta"),               # bin 9: delta new
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bin"]: r for r in vocab_growth(docs, n_checkpoints=10).collect()}
    assert len(out) == 10
    assert out[0]["docs_cum"] == 1
    assert out[0]["tokens_cum"] == 2
    assert out[0]["vocab_cum"] == 2
    assert out[0]["ttr"] == 1.0
    assert out[1]["docs_cum"] == 2
    assert out[1]["tokens_cum"] == 4
    assert out[1]["vocab_cum"] == 2
    assert out[1]["ttr"] == 0.5
    assert out[4]["vocab_cum"] == 2          # nothing new between bins 2-4
    assert out[5]["vocab_cum"] == 3
    assert out[9]["vocab_cum"] == 4
    assert out[9]["docs_cum"] == 4
    assert out[9]["tokens_cum"] == 7
    # monotone non-decreasing cumulative columns
    for c in ("docs_cum", "tokens_cum", "vocab_cum"):
        vals = [out[b][c] for b in range(10)]
        assert vals == sorted(vals)


def test_vocab_growth_empty_and_single_bin(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert vocab_growth(empty).count() == 0
    one = spark.createDataFrame([(7, "a b a")], "doc_id long, text string")
    row = vocab_growth(one, n_checkpoints=1).collect()[0]
    assert (row["bin"], row["docs_cum"], row["tokens_cum"],
            row["vocab_cum"]) == (0, 1, 3, 2)
    with pytest.raises(ValueError):
        vocab_growth(one, n_checkpoints=0)
