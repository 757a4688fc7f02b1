"""int8-quantized embedding search: codes vs a numpy reference,
integer-dot ranking vs full-precision recall, shared-grid invariants."""

import numpy as np
from pyspark.sql import functions as F

from hipipe_spark.operators.similarity import (
    brute_force_topk, quantize_embeddings, quantized_topk,
)


def _embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))


def _ref_quant(V, scale):
    q = np.round(V * (127.0 / scale))
    # numpy rounds half-to-even; Spark/DuckDB round half-away-from-zero.
    # Exact .5 products are measure-zero on real embeddings; nudge any
    # that appear so the reference uses the same convention.
    half = np.abs(V * (127.0 / scale) * 2.0) % 2.0 == 1.0
    q[half] = np.trunc(V[half] * (127.0 / scale)) + np.sign(V[half])
    return np.clip(q, -127, 127).astype(np.int8)


def test_quantize_codes_match_numpy(spark):
    em = _embeddings(spark)
    out, scale = quantize_embeddings(em, "embedding")
    pdf = out.select("vec_id", "embedding", "qvec8").toPandas()
    V = np.stack(pdf["embedding"].to_numpy())
    assert np.isclose(scale, np.abs(V).max())
    ref = _ref_quant(V, scale)
    got = np.stack(pdf["qvec8"].to_numpy()).astype(np.int8)
    assert (got == ref).all()


def test_quantized_topk_scores_are_integer_dots(spark):
    em = _embeddings(spark)
    q = em.filter(F.col("vec_id") < 4)
    out, scale = quantize_embeddings(em, "embedding")
    codes = {r["vec_id"]: np.array(r["qvec8"], dtype=np.int64)
             for r in out.select("vec_id", "qvec8").collect()}
    topk = quantized_topk(em, q, k=5).collect()
    assert len(topk) == 4 * 5
    for r in topk:
        expect = int(codes[r.query_id] @ codes[r.neighbor_id])
        assert r.dot_q == expect


def test_quantized_recall_vs_full_precision(spark):
    em = _embeddings(spark)
    q = em.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(em, q, k=5, metric="dot").select(
        "query_id", "neighbor_id")
    quant = quantized_topk(em, q, k=5).select("query_id", "neighbor_id")
    hits = exact.join(quant, ["query_id", "neighbor_id"]).count()
    assert hits / exact.count() >= 0.8  # int8 keeps order almost everywhere


def test_quantized_parallelism_invariance(spark):
    em = _embeddings(spark)
    q = em.filter(F.col("vec_id") < 4)
    a = quantized_topk(em.repartition(2), q, k=5).toPandas()
    b = quantized_topk(em.repartition(13), q, k=5).toPandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_recall_at_k(spark):
    from hipipe_spark.operators.similarity import recall_at_k
    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 22, 3)],
        "query_id long, neighbor_id long, rank int")
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 12, 3),   # 2/3 hits for q1
         # q2 entirely missing from approx -> recall 0, not NULL
         (3, 30, 1)],                           # extra query ignored
        "query_id long, neighbor_id long, rank int")
    out = {r.query_id: r.asDict()
           for r in recall_at_k(approx, exact).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_exact"], out[1]["n_hit"]) == (3, 2)
    assert out[1]["recall"] == round(2 / 3, 6)
    assert (out[2]["n_hit"], out[2]["recall"]) == (0, 0.0)
    # k filter restricts both sides
    k1 = {r.query_id: r.recall
          for r in recall_at_k(approx, exact, k=1).collect()}
    assert k1 == {1: 1.0, 2: 0.0}
