"""IVF approximate-nearest-neighbor: exactness anchor + recall.

The IVF coarse quantizer (hash-sampled seeds + distributed Lloyd step)
is approximate when n_probe < n_cells; probing every cell must
reproduce the exact brute-force top-k (same candidate set, same
ordering). Mirrors the reference's golden-value test discipline
(/root/reference/test/core/stream/example.cpp:25-67): exact expected
output pinned, approximation quality bounded.
"""

from pyspark.sql import functions as F

from hipipe_spark.operators.similarity import brute_force_topk, ivf_topk


def _embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))


def test_ivf_full_probe_is_exact(spark):
    em = _embeddings(spark)
    q = em.filter(F.col("vec_id") < 4)
    exact = brute_force_topk(em, q, k=5).select(
        "query_id", "neighbor_id", "rank").toPandas()
    ivf = ivf_topk(em, q, k=5, n_cells=8, n_probe=8).select(
        "query_id", "neighbor_id", "rank").toPandas()
    key = ["query_id", "rank"]
    exact = exact.sort_values(key).reset_index(drop=True)
    ivf = ivf.sort_values(key).reset_index(drop=True)
    assert exact.equals(ivf)


def test_ivf_partial_probe_recall(spark):
    em = _embeddings(spark)
    q = em.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(em, q, k=5).select("query_id", "neighbor_id")
    approx = ivf_topk(em, q, k=5, n_cells=8, n_probe=3).select(
        "query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
    recall = hits / exact.count()
    assert recall >= 0.5, f"recall@5 {recall} too low for n_probe=3/8"
    # every query still returns a full (or near-full) result set
    per_q = approx.groupBy("query_id").count().toPandas()
    assert (per_q["count"] >= 3).all()


def test_ivf_deterministic(spark):
    em = _embeddings(spark)
    q = em.filter(F.col("vec_id") < 3)
    a = ivf_topk(em, q, k=3, n_cells=8, n_probe=2).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = ivf_topk(em, q, k=3, n_cells=8, n_probe=2).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a[["query_id", "neighbor_id", "rank"]].equals(
        b[["query_id", "neighbor_id", "rank"]])
