"""DSIR importance weights + Gumbel top-k (operators/selection.py)."""

import math

import pytest

from hipipe_spark.operators.selection import dsir_weights, gumbel_topk


def test_dsir_prefers_target_like_docs(spark):
    target = spark.createDataFrame(
        [(100 + i, "quantum physics entanglement qubit decoherence")
         for i in range(5)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [
            (1, "quantum physics qubit experiments"),
            (2, "celebrity gossip fashion scandal news"),
            (3, "entanglement decoherence quantum qubit physics"),
        ],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dsir_weights(raw, target, n_buckets=512).collect()}
    assert out[3]["dsir_logweight"] > out[2]["dsir_logweight"]
    assert out[1]["dsir_logweight"] > out[2]["dsir_logweight"]
    # unigrams + bigrams: 4 tokens -> 4 + 3 features
    assert out[1]["n_features"] == 7


def test_dsir_manual_unigram_check(spark):
    # 2 buckets would collide; use enough buckets that the 3 distinct
    # tokens ~surely land apart, then verify the multinomial arithmetic
    target = spark.createDataFrame([(10, "aa aa")], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "aa"), (2, "bb")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dsir_weights(raw, target, n_buckets=64, ngmax=1,
                        smooth=0.5, hash_family="det").collect()}
    B, s = 64, 0.5
    # N_t = 2 (aa twice), N_r = 2 (aa, bb)
    lw_aa = (math.log((2 + s) / (2 + s * B)) - math.log((1 + s) / (2 + s * B)))
    lw_bb = (math.log((0 + s) / (2 + s * B)) - math.log((1 + s) / (2 + s * B)))
    assert out[1]["dsir_logweight"] == round(lw_aa, 6)
    assert out[2]["dsir_logweight"] == round(lw_bb, 6)
    assert out[1]["dsir_logweight"] > out[2]["dsir_logweight"]


def test_dsir_empty_doc_and_validation(spark):
    target = spark.createDataFrame([(10, "x y")], "doc_id long, text string")
    raw = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = dsir_weights(raw, target, n_buckets=32).collect()[0]
    assert (row["n_features"], row["dsir_logweight"]) == (0, 0.0)
    with pytest.raises(ValueError):
        dsir_weights(raw, target, ngmax=3)
    with pytest.raises(ValueError):
        dsir_weights(raw, target, hash_family="md5")


def test_gumbel_topk_deterministic_and_weighted(spark):
    df = spark.createDataFrame(
        [(i, 10.0 if i < 5 else -10.0) for i in range(100)],
        "doc_id long, lw double")
    a = [r["doc_id"] for r in gumbel_topk(df, "lw", 5, seed=3).collect()]
    b = [r["doc_id"] for r in gumbel_topk(df, "lw", 5, seed=3).collect()]
    assert a == b                      # deterministic
    assert set(a) == {0, 1, 2, 3, 4}   # +-10 logweight dwarfs gumbel noise
    # near-zero temperature = pure argmax on logweight
    c = gumbel_topk(df, "lw", 3, seed=1, temperature=1e-9).collect()
    assert all(r["lw"] == 10.0 for r in c)
    with pytest.raises(ValueError):
        gumbel_topk(df, "lw", 0)
