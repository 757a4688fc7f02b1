"""Property-based tests (hypothesis) for the corpus operators added in
round 3: frequent-line removal vs a pandas brute force, the
deterministic shuffle vs a numpy argsort of the same LCG, and BM25 vs
an independent pure-Python recomputation. Random inputs explore the
tie/empty/all-removed cases fixtures miss (the reference pins its
semantics the same way — golden tests + randomized sweeps,
/root/reference/test/core/stream/example.cpp)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hipipe_spark.operators.boilerplate import remove_frequent_lines
from hipipe_spark.operators.ordering import deterministic_shuffle
from hipipe_spark.operators.retrieval import bm25_scores

_SET = settings(max_examples=10, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

# small alphabets force cross-doc line collisions
line_st = st.text(alphabet="abc", min_size=1, max_size=2)
doc_st = st.lists(line_st, min_size=0, max_size=6)
corpus_st = st.lists(doc_st, min_size=1, max_size=8)


@_SET
@given(corpus=corpus_st, min_docs=st.integers(2, 4))
def test_remove_frequent_lines_matches_brute_force(spark, corpus, min_docs):
    df = spark.createDataFrame(
        [(i, lines) for i, lines in enumerate(corpus)],
        "doc_id long, lines array<string>")
    got = {r["doc_id"]: (r["clean_lines"], r["n_lines"], r["n_removed"])
           for r in remove_frequent_lines(df, min_docs=min_docs).collect()}

    docfreq = {}
    for lines in corpus:
        for line in set(lines):
            docfreq[line] = docfreq.get(line, 0) + 1
    frequent = {l for l, n in docfreq.items() if n >= min_docs}
    for i, lines in enumerate(corpus):
        kept = [l for l in lines if l not in frequent]
        assert got[i] == (kept, len(lines), len(lines) - len(kept)), (
            i, lines, frequent)


def _lcg(x: int, seed: int) -> int:
    M, A, C = 2147483648, 1103515245, 12345
    v = (x + seed) % M
    v = (v * A + C) % M
    return (v * A + C) % M


@_SET
@given(keys=st.sets(st.integers(0, 10_000), min_size=1, max_size=60),
       seed=st.integers(0, 5))
def test_deterministic_shuffle_matches_lcg_argsort(spark, keys, seed):
    keys = sorted(keys)
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r["k"]: r["shuffle_rank"]
           for r in deterministic_shuffle(df, "k", seed=seed,
                                          n_partitions=3).collect()}
    want = {k: rank for rank, k in enumerate(
        sorted(keys, key=lambda k: (_lcg(k, seed), k)))}
    assert got == want


@_SET
@given(texts=st.lists(st.lists(st.sampled_from(["join", "dup", "scan"]),
                               min_size=0, max_size=8),
                      min_size=1, max_size=10))
def test_bm25_matches_pure_python(spark, texts):
    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(texts)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs, ["join", "dup"]).collect()}

    k1, b = 1.2, 0.75
    n = len(texts)
    avgdl = sum(len(t) for t in texts) / n
    if avgdl == 0:          # all-empty corpus: every score is 0/NaN
        assert got == {}
        return
    want = {}
    for i, words in enumerate(texts):
        score = 0.0
        for term in ("join", "dup"):
            tf = float(words.count(term))
            df_t = sum(1 for t in texts if term in t)
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            score += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(words) / avgdl))
        if score > 0:
            want[i] = score
    assert set(got) == set(want)
    for i in want:
        assert math.isclose(got[i], want[i], rel_tol=1e-9), (i, texts)
