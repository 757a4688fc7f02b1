"""Exact substring (token-window) dedup (operators/spans.py)."""

import pytest

from hipipe_spark.operators.spans import substring_dedup


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_substring_dedup_flags_repeated_span(spark):
    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta gamma"),
            (2, "intro words here " + shared + " tail"),
            (3, "completely unrelated text with no repeats at all ok"),
        ],
        "doc_id long, text string")
    out = _by_id(substring_dedup(docs, window=8))
    # doc 1 is canonical (first occurrence) -> its windows are NOT dups
    assert out[1]["dup_tokens"] == 0
    # doc 2 repeats the 9-token span: two 8-windows merge into 9 tokens
    assert out[2]["n_dup_windows"] == 2
    assert out[2]["dup_tokens"] == 9
    assert out[2]["total_tokens"] == 13
    assert out[2]["dup_frac"] == round(9 / 13, 6)
    assert out[3]["dup_tokens"] == 0


def test_substring_dedup_within_doc_repeat(spark):
    # the same 8-token phrase twice inside ONE document: second
    # occurrence is flagged, first is canonical
    phrase = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, phrase + " filler words " + phrase)],
        "doc_id long, text string")
    out = _by_id(substring_dedup(docs, window=8))
    assert out[1]["n_dup_windows"] == 1
    assert out[1]["dup_tokens"] == 8


def test_substring_dedup_merges_overlaps_once(spark):
    # doc 2 repeats a 12-token run: five 8-windows, merged span = 12
    run = " ".join(f"t{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, run), (2, run)], "doc_id long, text string")
    out = _by_id(substring_dedup(docs, window=8))
    assert out[1]["dup_tokens"] == 0
    assert out[2]["n_dup_windows"] == 5
    assert out[2]["dup_tokens"] == 12  # overlap counted once


def test_substring_dedup_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "")], "doc_id long, text string")
    out = _by_id(substring_dedup(docs, window=8))
    assert out[1] == dict(doc_id=1, total_tokens=2, n_dup_windows=0,
                          dup_tokens=0, dup_frac=0.0)
    assert out[2]["total_tokens"] == 0
    assert out[2]["dup_frac"] == 0.0


def test_substring_dedup_exact_equals_hashed(spark):
    import random
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(40)))
            for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = _by_id(substring_dedup(docs, window=5, hash="xxhash64"))
    b = _by_id(substring_dedup(docs, window=5, hash="exact"))
    assert a == b
    with pytest.raises(ValueError):
        substring_dedup(docs, window=0)
    with pytest.raises(ValueError):
        substring_dedup(docs, hash="md5")
