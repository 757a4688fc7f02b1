"""Giant-duplicate-cluster safety (VERDICT r1 next-round #4).

A cluster of n byte-identical docs must produce O(n) output rows (star
edges to the min-id representative), not O(n²) all-pairs — the failure
mode that melts MinHash/SimHash band buckets at 100 TB. Plus the
doc-frequency (hub-gram) filter for the n-gram inverted index, and
det-hash-family parity with the xxhash64 default.
"""

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.dedup import (
    minhash_lsh_pairs, ngram_jaccard_pairs, simhash_near_pairs)


@pytest.fixture(scope="module")
def cluster_docs(spark):
    """1,000 identical copies + a near-dup + two distinct docs."""
    boiler = "this exact boilerplate paragraph is copied everywhere verbatim"
    rows = [(i, boiler) for i in range(1000)]
    rows.append((1000, boiler + " almost"))
    rows.append((1001, "something entirely different lives here"))
    rows.append((1002, "and a second unrelated document too"))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_minhash_giant_cluster_linear_output(cluster_docs):
    out = minhash_lsh_pairs(cluster_docs, shingle="word", shingle_k=1,
                            n_hashes=16, bands=8, jaccard_threshold=0.5)
    rows = out.collect()
    # 999 star edges (0, i, 1.0) + the near-dup pair against the rep —
    # NOT the ~500k all-pairs of the naive bucket join
    star = [(r.id_a, r.id_b) for r in rows if r.jaccard == 1.0]
    assert len(star) == 999
    assert all(a == 0 for a, _ in star)
    near = {(r.id_a, r.id_b) for r in rows if r.jaccard < 1.0}
    assert near == {(0, 1000)}
    assert len(rows) == 1000


def test_minhash_prepass_off_is_all_pairs(spark):
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(5)], "doc_id long, text string")
    out = minhash_lsh_pairs(docs, shingle="word", shingle_k=1, n_hashes=16,
                            bands=8, jaccard_threshold=0.5,
                            exact_prepass=False)
    assert out.count() == 10  # 5*4/2 — the naive quadratic contract


def test_simhash_giant_cluster_linear_output(cluster_docs):
    out = simhash_near_pairs(cluster_docs, max_hamming=3)
    rows = out.collect()
    star = [(r.id_a, r.id_b) for r in rows if r.hamming == 0]
    assert len(star) == 999
    assert all(a == 0 for a, _ in star)
    assert len(rows) <= 1001  # + possibly the near-dup pair


def test_minhash_bucket_cap_bounds_candidates(spark):
    # 30 distinct-but-identically-shingled docs (same text → collapsed
    # by prepass; disable it to exercise the cap)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(30)] +
        [(100, "omega psi chi phi")],
        "doc_id long, text string")
    capped = minhash_lsh_pairs(docs, shingle="word", shingle_k=1,
                               n_hashes=16, bands=8, jaccard_threshold=0.5,
                               exact_prepass=False, bucket_cap=10)
    # every band bucket holding the 30-doc cluster exceeds the cap → no
    # pairs survive candidate generation
    assert capped.count() == 0


def test_ngram_max_df_drops_hub_grams(spark):
    # 'common' appears in every doc (a hub); pairs share ONLY 'common'
    # except (0,1) which also share the rare gram 'rare'
    docs = spark.createDataFrame(
        [(0, "rare common x1 y1"), (1, "rare common x2 y2"),
         (2, "common a b c"), (3, "common d e f"), (4, "common g h i")],
        "doc_id long, text string")
    exact = ngram_jaccard_pairs(docs, n=1, threshold=0.1)
    filtered = ngram_jaccard_pairs(docs, n=1, threshold=0.1, max_df=3)
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    filt = {(r.id_a, r.id_b): r.jaccard for r in filtered.collect()}
    # hub-only pairs disappear from candidates; the rare-gram pair stays
    assert set(filt) == {(0, 1)}
    assert (0, 1) in exact_pairs and len(exact_pairs) > 1
    # and its jaccard is still computed on the FULL gram sets (2/6)
    assert abs(filt[(0, 1)] - 2 / 6) < 1e-9


def test_minhash_det_family_matches_xxhash_pairs(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox leaps over the lazy dog"),
         (3, "completely different content about spark engines")],
        "doc_id long, text string")
    kw = dict(shingle="word", shingle_k=1, n_hashes=32, bands=16,
              jaccard_threshold=0.5)
    xx = {(r.id_a, r.id_b, round(r.jaccard, 9))
          for r in minhash_lsh_pairs(docs, **kw).collect()}
    det = {(r.id_a, r.id_b, round(r.jaccard, 9))
           for r in minhash_lsh_pairs(docs, hash_family="det", **kw).collect()}
    # verified jaccard values are hash-family-independent; with 16 bands
    # both families catch these high-similarity pairs
    assert xx == det
    assert (0, 1, 1.0) in det


def test_simhash_det_block_parity(spark):
    docs = spark.createDataFrame(
        [(0, "aaa bbb ccc ddd"), (1, "aaa bbb ccc ddd"), (2, "zzz yyy xxx www")],
        "doc_id long, text string")
    out = simhash_near_pairs(docs, max_hamming=3, bits=60, n_blocks=4,
                             hash_family="det").collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in out} == {(0, 1, 0)}
