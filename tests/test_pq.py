"""Product quantization: encode/ADC exactness and trained recall."""

import numpy as np
from pyspark.sql import functions as F

from hipipe_spark.operators.similarity import (
    brute_force_topk, pq_formula_codebooks, pq_topk, pq_train,
    recall_at_k)


def _vec_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>")


def test_pq_lossless_on_codebook_grid(spark):
    # corpus subvectors ARE codebook entries -> zero quantization error
    # -> ADC score == exact cosine and ranks match brute force
    rng = np.random.default_rng(5)
    m, n_codes, dsub = 4, 16, 4
    books = pq_formula_codebooks(m, n_codes, dsub)
    rows = []
    for _ in range(60):
        rows.append(np.concatenate(
            [books[s][rng.integers(n_codes)] for s in range(m)]))
    mat = np.stack(rows)
    df = _vec_df(spark, mat)
    q = df.filter(F.col("vec_id") < 4)
    got = (pq_topk(df, q, k=5, m=m, codebooks=books, impl="jvm")
           .toPandas().sort_values(["query_id", "rank"]))
    exact = (brute_force_topk(df, q, k=5)
             .toPandas().sort_values(["query_id", "rank"]))
    assert list(got["neighbor_id"]) == list(exact["neighbor_id"])
    assert np.allclose(got["score"], exact["cosine"], atol=1e-9)


def test_pq_jvm_numpy_parity(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(80, 16))
    df = _vec_df(spark, mat)
    q = df.filter(F.col("vec_id") < 3)
    books = pq_formula_codebooks(4, 8, 4)
    a = (pq_topk(df, q, k=4, m=4, codebooks=books, impl="jvm")
         .toPandas().sort_values(["query_id", "rank"]))
    b = (pq_topk(df, q, k=4, m=4, codebooks=books, impl="numpy")
         .toPandas().sort_values(["query_id", "rank"]))
    assert list(a["neighbor_id"]) == list(b["neighbor_id"])
    assert np.allclose(a["score"], b["score"], atol=1e-9)


def test_pq_trained_cluster_precision(spark):
    # well-separated clusters: within a cluster PQ codes collapse to
    # the centroid (identical ADC scores — exact-neighbor order is
    # unrecoverable BY DESIGN), so the right assertion is cluster
    # membership: every top-5 neighbor must share the query's cluster
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(6, 16)) * 10.0
    mat = np.stack([centers[i % 6] + rng.normal(size=16) * 0.05
                    for i in range(120)])
    df = _vec_df(spark, mat)
    q = df.filter(F.col("vec_id") < 6)
    approx = pq_topk(df, q, k=5, m=4, n_codes=8, refine_iters=2)
    out = approx.toPandas()
    assert len(out) == 6 * 5
    same = (out["neighbor_id"] % 6 == out["query_id"] % 6)
    assert same.all()


def test_pq_recall_smooth_data(spark):
    # non-degenerate geometry: recall@10 against brute force clears a
    # real bar (codebook-grid corpus + smooth noise keeps distances
    # distinguishable after quantization)
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(100, 16))
    mat[:, :4] *= 6.0  # dominant subspace so quantization preserves order
    df = _vec_df(spark, mat)
    q = df.filter(F.col("vec_id") < 5)
    approx = pq_topk(df, q, k=10, m=4, n_codes=32, refine_iters=2)
    exact = brute_force_topk(df, q, k=10)
    r = recall_at_k(
        approx.withColumnRenamed("score", "cosine"), exact, k=10)
    mean_recall = r.agg(F.avg("recall")).collect()[0][0]
    # 5 bits/subspace ≈ 80x compression; chance would be ~0.1
    assert mean_recall >= 0.5


def test_pq_train_shapes_and_determinism(spark):
    rng = np.random.default_rng(9)
    mat = rng.normal(size=(50, 8))
    df = _vec_df(spark, mat)
    b1 = pq_train(df, m=2, n_codes=4, seed=7, refine_iters=1)
    b2 = pq_train(df, m=2, n_codes=4, seed=7, refine_iters=1)
    assert len(b1) == 2 and len(b1[0]) == 4 and len(b1[0][0]) == 4
    assert np.allclose(np.array(b1), np.array(b2))


def test_pq_empty_query_and_bad_dim(spark):
    import pytest
    rng = np.random.default_rng(1)
    df = _vec_df(spark, rng.normal(size=(10, 8)))
    out = pq_topk(df, df.filter(F.col("vec_id") < 0), k=3, m=2,
                  n_codes=4)
    assert out.count() == 0
    with pytest.raises(ValueError):
        pq_topk(df, df, k=3, m=3)  # 8 % 3 != 0
