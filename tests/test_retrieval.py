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


def test_unigram_logprob_hand_values(spark):
    """4-doc corpus, hand-computed Laplace unigram log-probs."""
    from hipipe_spark.operators.retrieval import unigram_logprob

    docs = _corpus(spark)
    out = {r["id"]: r for r in unigram_logprob(docs, alpha=0.5).collect()}
    # corpus tokens: spark join hash join | sort merge join | broadcast
    # exchange only -> counts: join=3, others 1 each; total=10, vocab=8
    denom = 10 + 0.5 * 8

    def p(cnt):
        return (cnt + 0.5) / denom

    exp0 = (math.log(p(1)) + 2 * math.log(p(3)) + math.log(p(1))) / 4.0
    assert out[0]["n_tokens"] == 4
    assert out[0]["logprob"] == pytest.approx(exp0, rel=1e-12)
    exp2 = 3 * math.log(p(1)) / 3.0
    assert out[2]["logprob"] == pytest.approx(exp2, rel=1e-12)
    assert out[3]["n_tokens"] == 0 and out[3]["logprob"] is None

    # improbable-token doc scores lower than stopword-ish doc
    assert out[2]["logprob"] < out[0]["logprob"]


def test_unigram_logprob_empty_corpus(spark):
    from hipipe_spark.operators.retrieval import unigram_logprob

    docs = spark.createDataFrame([(0, ""), (1, "  ")], "doc_id int, text string")
    out = {r["id"]: r for r in unigram_logprob(docs).collect()}
    assert len(out) == 2
    assert all(v["logprob"] is None for v in out.values())


def test_mean_pool_matches_numpy(spark):
    import numpy as np

    from hipipe_spark.operators.similarity import mean_pool

    em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .withColumn("g", F.pmod(F.col("vec_id"), F.lit(7)))
    out = mean_pool(em, "g").toPandas().set_index("g")
    pdf = em.select("g", F.col("embedding").cast("array<double>").alias("v")) \
        .toPandas()
    for g, grp in pdf.groupby("g"):
        V = np.stack(grp["v"].to_numpy())
        assert np.allclose(np.stack(out.loc[g, "pooled"]), V.mean(axis=0))
        assert out.loc[g, "n_vecs"] == len(grp)


def test_bigram_pmi_hand_values(spark):
    from hipipe_spark.operators.retrieval import bigram_pmi

    docs = spark.createDataFrame(
        [(0, "new york new york"),
         (1, "new york city"),
         (2, "old york")],
        "doc_id int, text string")
    out = {(r["tok_a"], r["tok_b"]): r
           for r in bigram_pmi(docs, min_count=2).collect()}
    # bigrams: (new,york)x3, (york,new)x1, (york,city)x1, (old,york)x1
    # -> only (new,york) survives min_count=2. totals: 9 unigrams, 6 bigrams
    assert set(out) == {("new", "york")}
    r = out[("new", "york")]
    assert r["n_ab"] == 3
    expect = math.log((3 / 6.0) / ((3 / 9.0) * (4 / 9.0)))
    assert r["pmi"] == pytest.approx(expect, rel=1e-12)


def test_bigram_pmi_empty(spark):
    from hipipe_spark.operators.retrieval import bigram_pmi

    docs = spark.createDataFrame([(0, ""), (1, "one")], "doc_id int, text string")
    assert bigram_pmi(docs, min_count=1).count() == 0


def test_bigram_perplexity(spark):
    import math

    from hipipe_spark.operators.retrieval import bigram_perplexity

    # corpus: "a b" twice, "a c" once -> bigrams: (BOS,a)x3, (a,b)x2,
    # (a,c)x1, (b,EOS)x2, (c,EOS)x1; V = distinct nxt = {a,b,c,EOS} = 4
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string")
    out = {r["id"]: r for r in bigram_perplexity(docs, k=0.5).collect()}

    V, k = 4.0, 0.5
    def p(cb, cc):
        return (cb + k) / (cc + k * V)
    lp1 = (math.log(p(3, 3)) + math.log(p(2, 3)) + math.log(p(2, 2))) / 3
    assert out[1]["n_events"] == 3
    assert abs(out[1]["logprob"] - lp1) < 1e-9
    assert abs(out[1]["ppl"] - math.exp(-lp1)) < 1e-9
    # doc 3's rarer (a,c)/(c,EOS) path must score WORSE (higher ppl)
    assert out[3]["ppl"] > out[1]["ppl"]


def test_bigram_perplexity_empty_and_unseen(spark):
    from hipipe_spark.operators.retrieval import bigram_perplexity

    fit = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, ""), (11, "zz qq")], "doc_id long, text string")
    out = {r["id"]: r
           for r in bigram_perplexity(score, fit_docs=fit).collect()}
    # empty doc: single BOS->EOS event, smoothed-unseen probability
    assert out[10]["n_events"] == 1 and out[10]["ppl"] is not None
    # fully unseen tokens: finite score via add-k backoff
    assert out[11]["n_events"] == 3 and out[11]["ppl"] is not None
    # unseen transitions are less probable than fitted ones
    fit_self = {r["id"]: r
                for r in bigram_perplexity(fit, fit_docs=fit).collect()}
    assert out[11]["ppl"] > fit_self[1]["ppl"]
