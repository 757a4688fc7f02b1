"""BM25 / TF-IDF scoring — hand-computed miniature corpus."""

import math

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.retrieval import bm25_scores, tfidf_scores


def _corpus(spark):
    return spark.createDataFrame(
        [(0, "spark join hash join"),        # tf(join)=2, dl=4
         (1, "sort merge join"),             # tf(join)=1, dl=3
         (2, "broadcast exchange only"),     # no hit,     dl=3
         (3, "")],                           # empty,      dl=0
        "doc_id int, text string")


def test_bm25_hand_values(spark):
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(_corpus(spark), ["join"]).collect()}
    n, df_t, avgdl = 4, 2, (4 + 3 + 3 + 0) / 4.0
    idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))

    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert set(got) == {0, 1}          # zero-score docs filtered
    assert got[0] == pytest.approx(s(2, 4), rel=1e-12)
    assert got[1] == pytest.approx(s(1, 3), rel=1e-12)
    # tf saturation: doubling tf must NOT double the score
    assert got[0] < 2 * got[1]


def test_bm25_multi_term_additivity(spark):
    one = bm25_scores(_corpus(spark), ["join"]).collect()
    two = {r["doc_id"]: r["score"]
           for r in bm25_scores(_corpus(spark), ["join", "merge"]).collect()}
    # adding a term only ever adds score mass
    for r in one:
        assert two[r["doc_id"]] >= r["score"]
    assert two[1] > two[0] or two[1] > dict(
        (r["doc_id"], r["score"]) for r in one)[1]  # doc 1 gains 'merge'


def test_tfidf_raw_tf_linear(spark):
    got = {r["doc_id"]: r["score"]
           for r in tfidf_scores(_corpus(spark), ["join"]).collect()}
    # raw-tf variant IS linear in tf (contrast with BM25 saturation)
    assert got[0] == pytest.approx(2 * got[1], rel=1e-12)


def test_bm25_empty_terms_raises(spark):
    with pytest.raises(ValueError):
        bm25_scores(_corpus(spark), [])
