"""Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003).

Pins the paper's LOCAL guarantee — any shared substring of length
>= w + k - 1 produces at least one shared fingerprint — plus the
selection rule details (rightmost tie-break via the (h, pos) packing),
the short-document dropout, and the pair-scoring math.
"""

import numpy as np
import pytest

from hipipe_spark.operators.dedup import winnow_fingerprints, winnow_pairs

K, W = 5, 4


def _fps(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, "doc_id", "text", k=K, w=W, **kw)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    return by_doc


def test_local_guarantee_shared_substring(spark):
    # docs share a substring of length exactly w + k - 1 = 8 embedded
    # in otherwise-disjoint text -> guaranteed >= 1 common fingerprint
    shared = "zqxjvwpy"
    assert len(shared) == W + K - 1
    rows = [
        (1, "aaaaaaaaaaaa" + shared + "bbbbbbbbbbbb"),
        (2, "cccccccccccc" + shared + "dddddddddddd"),
    ]
    fps = _fps(spark, rows)
    assert fps[1] & fps[2], "local guarantee violated"


def test_disjoint_texts_share_nothing(spark):
    rows = [(1, "abcdefghijklmnopqrstuvwxyz"),
            (2, "0123456789 0123456789 0123456789")]
    fps = _fps(spark, rows)
    assert not (fps[1] & fps[2])


def test_short_doc_drops_out(spark):
    # needs k + w - 1 = 8 chars for one complete window
    rows = [(1, "abcdefg"), (2, "abcdefgh")]
    fps = _fps(spark, rows)
    assert 1 not in fps
    assert len(fps[2]) == 1  # exactly one window -> one fingerprint


def test_case_and_cap_normalization(spark):
    rows = [(1, "The Quick Brown Fox"), (2, "the quick brown fox")]
    fps = _fps(spark, rows)
    assert fps[1] == fps[2]
    # max_len cap: identical prefixes, divergent tails beyond the cap
    rows = [(1, "x" * 10 + "same prefix body"),
            (2, "x" * 10 + "same prefix body")]
    a = _fps(spark, [(1, rows[0][1] + "TAIL-A")], max_len=26)
    b = _fps(spark, [(1, rows[1][1] + "TAIL-B")], max_len=26)
    assert a[1] == b[1]


def test_determinism(spark):
    rows = [(i, f"document number {i} with some repeated phrasing "
                f"common to every row")
            for i in range(20)]
    assert _fps(spark, rows) == _fps(spark, rows)


def test_max_len_guard():
    with pytest.raises(ValueError):
        winnow_fingerprints(None, max_len=256)


def test_matches_numpy_reference(spark):
    # independent recomputation of the selection scheme (plain python,
    # no shared code path beyond the constants)
    from hipipe_spark.functions.hashing import _A, _C, _M
    rows = [(1, "the winnowing algorithm selects the minimum hash"),
            (2, "hash selection with rightmost tie break rules")]
    fps = _fps(spark, rows)
    for did, txt in rows:
        t = txt.lower()[:240]
        n = len(t) - K + 1
        hs = []
        for i in range(n):
            acc = 0
            for ch in t[i:i + K]:
                acc = (acc * 31 + ord(ch)) % _M
            hs.append(((acc * _A + _C) % _M * _A + _C) % _M)
        enc = [h * 256 + (255 - (i + 1)) for i, h in enumerate(hs)]
        want = {min(enc[p:p + W]) // 256 for p in range(n - W + 1)}
        assert fps[did] == want


def test_pairs_scoring_and_hub_exclusion(spark):
    base = "shared sentence that is long enough to fingerprint well"
    rows = [(1, base + " tail one"), (2, base + " tail two"),
            (3, "completely different content goes here instead")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    pairs = {(r["id_a"], r["id_b"]): r
             for r in winnow_pairs(fps, "doc_id", threshold=0.3).collect()}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["sim"] == round(r["n_shared"] / min(r["n_a"], r["n_b"]), 6)
    assert r["sim"] >= 0.3
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # max_df=1 excludes every fingerprint appearing in 2+ docs -> no pairs
    assert winnow_pairs(fps, "doc_id", threshold=0.0, max_df=1).count() == 0


def test_string_ids(spark):
    # id column type is preserved (conv-style string ids)
    rows = [("conv_a", "the same shared sentence body here"),
            ("conv_b", "the same shared sentence body here")]
    df = spark.createDataFrame(rows, "cid string, text string")
    fps = winnow_fingerprints(df, "cid", "text", k=K, w=W)
    assert dict(fps.dtypes)["cid"] == "string"
    pairs = winnow_pairs(fps, "cid", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["sim"]) for r in pairs] == \
        [("conv_a", "conv_b", 1.0)]
