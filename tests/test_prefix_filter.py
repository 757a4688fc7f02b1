"""Prefix-filtered Jaccard join: completeness (output identical to the
plain inverted-index join) and the candidate-pruning property that
justifies it at scale (hub grams never enter a prefix).
"""

import random

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.dedup import (
    ngram_jaccard_pairs, ngram_jaccard_prefix_pairs)


def _pairs(df):
    return {(r.id_a, r.id_b, round(r.jaccard, 6)) for r in df.collect()}


@pytest.fixture(scope="module")
def hub_docs(spark):
    """Synthetic corpus where one stopword-ish token appears in EVERY
    doc (the hub that melts a plain inverted index) plus genuine
    near-dup pairs built from shared rare tokens."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(60):
        toks = ["the"] + rng.sample(vocab, 8)  # "the" in every doc
        rows.append((2 * i, " ".join(toks)))
        # near-dup: keep 8 of 9 tokens, swap one
        dup = list(toks)
        dup[3] = rng.choice(vocab)
        rows.append((2 * i + 1, " ".join(dup)))
    rows.append((990, ""))          # empty doc: no grams, no pairs
    rows.append((991, "the"))       # hub-only doc
    rows.append((992, "the w1 w2 w3 w4"))   # exact dup pair: J = 1.0
    rows.append((993, "w4 w3 the w2 w1"))   # (order-insensitive sets)
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.mark.parametrize("t", [0.5, 0.7, 0.9])
def test_prefix_equals_plain_inverted_index(hub_docs, t):
    plain = ngram_jaccard_pairs(hub_docs, "doc_id", "text", n=1, threshold=t)
    pref = ngram_jaccard_prefix_pairs(hub_docs, "doc_id", "text", n=1,
                                      threshold=t)
    assert _pairs(pref) == _pairs(plain)
    assert len(_pairs(plain)) > 0  # the fixture actually has near-dups


def test_prefix_equals_plain_bigrams(hub_docs):
    plain = ngram_jaccard_pairs(hub_docs, "doc_id", "text", n=2,
                                threshold=0.5)
    pref = ngram_jaccard_prefix_pairs(hub_docs, "doc_id", "text", n=2,
                                      threshold=0.5)
    assert _pairs(pref) == _pairs(plain)


def test_hub_gram_never_indexed(spark):
    """At t=0.8 a 10-gram doc indexes only its 3 rarest grams — the
    universal hub (max df) cannot be one of them, so the hub's O(f²)
    fan-out never reaches the candidate join."""
    vocab = [f"r{i}{j}" for i in range(40) for j in range(10)]
    rows = [(i, "hub " + " ".join(vocab[10 * i:10 * i + 9]))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # rebuild the internal prefix frame shape to count index entries
    from hipipe_spark.operators.dedup import word_ngrams
    from pyspark.sql import Window
    base = docs.select(F.col("doc_id").alias("id"),
                       word_ngrams(F.col("text"), 1).alias("gs"))
    grams = base.select("id", F.size("gs").alias("sz"),
                        F.explode("gs").alias("g"))
    dfreq = grams.groupBy("g").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy("df", "g")
    ranked = (grams.join(dfreq, on="g")
              .select("id", "g", "sz", F.row_number().over(w).alias("pos")))
    t = 0.8
    prefix = ranked.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1)
    indexed = {r.g for r in prefix.select("g").distinct().collect()}
    assert "hub" not in indexed
    # prefix index is 3/10 the size of the full one
    assert prefix.count() == 40 * 3


def test_exact_threshold_boundary(spark):
    """Sizes 20 and 11 sharing 11 grams: J = 11/20 = 0.55 == t exactly.
    Float arithmetic makes 0.55*20 = 11.000000000000002 — without the
    ε guard the length filter (11 >= 11.000000000000002 is false) and
    the inflated ceil both drop this valid boundary pair."""
    a = (" ".join(f"s{i}" for i in range(11)) + " "
         + " ".join(f"x{i}" for i in range(9)))
    b = " ".join(f"s{i}" for i in range(11))
    docs = spark.createDataFrame([(1, a), (2, b)],
                                 "doc_id long, text string")
    plain = _pairs(ngram_jaccard_pairs(docs, threshold=0.55))
    pref = _pairs(ngram_jaccard_prefix_pairs(docs, threshold=0.55))
    assert plain == pref == {(1, 2, 0.55)}


def test_prefix_threshold_validation(hub_docs):
    with pytest.raises(ValueError):
        ngram_jaccard_prefix_pairs(hub_docs, threshold=0.0)
    with pytest.raises(ValueError):
        ngram_jaccard_prefix_pairs(hub_docs, threshold=1.5)
