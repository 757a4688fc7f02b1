"""fuzzy_token_pairs (deletion-neighborhood completeness + verify) and
stupid_backoff_logprob (vs a dict-based python reference)."""

import itertools
import math

import numpy as np
from pyspark.sql import functions as F

from hipipe_spark.operators.dedup import fuzzy_token_pairs
from hipipe_spark.operators.retrieval import BOS, EOS, stupid_backoff_logprob


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[-1]


def test_fuzzy_pairs_complete_for_distance_1(spark):
    words = ["alpha", "alpya", "lpha", "alphax", "beta", "betta",
             "gamma", "gamma", "delta", "welta", "ab", "ba"]
    df = spark.createDataFrame([(w,) for w in words], "text string")
    out = {(r["word_a"], r["word_b"]): r for r in
           fuzzy_token_pairs(df, min_len=3).collect()}
    vocab = sorted({w for w in words if len(w) >= 3})
    expect = {(a, b) for a, b in itertools.combinations(vocab, 2)
              if _lev(a, b) <= 1}
    assert set(out) == expect  # complete AND exact (no dist-2 leaks)
    assert all(r["dist"] == 1 for r in out.values())
    # "ab"/"ba" (distance 2, shared deletion keys) must NOT appear even
    # when min_len admits them
    out2 = {(r["word_a"], r["word_b"]) for r in
            fuzzy_token_pairs(df, min_len=2).collect()}
    assert ("ab", "ba") not in out2


def test_fuzzy_pairs_counts_and_ratio(spark):
    df = spark.createDataFrame(
        [("hello hello hello",), ("helo world",)], "text string")
    rows = fuzzy_token_pairs(df, min_len=4).collect()
    assert len(rows) == 1
    r = rows[0]
    # lexicographic: "hello" < "helo" ('l' < 'o' at position 4)
    assert (r["word_a"], r["word_b"]) == ("hello", "helo")
    assert (r["n_a"], r["n_b"]) == (3, 1)
    assert r["freq_ratio"] == 3.0


def _sb_ref(docs, alpha=0.4, k=0.5):
    """Dict-based stupid backoff reference over the same padded chain."""
    evs = {}
    tri, ctx3, bi, ctx1, uni = {}, {}, {}, {}, {}
    for i, text in docs:
        toks = text.lower().split() if text.strip() else []
        p = [BOS, BOS] + toks + [EOS]
        ev = [(p[j], p[j + 1], p[j + 2]) for j in range(len(p) - 2)]
        evs[i] = ev
        for u, v, w in ev:
            tri[(u, v, w)] = tri.get((u, v, w), 0) + 1
            ctx3[(u, v)] = ctx3.get((u, v), 0) + 1
            bi[(v, w)] = bi.get((v, w), 0) + 1
            ctx1[v] = ctx1.get(v, 0) + 1
            uni[w] = uni.get(w, 0) + 1
    n = sum(uni.values())
    vv = len(uni)
    out = {}
    for i, ev in evs.items():
        lns = []
        for u, v, w in ev:
            if tri.get((u, v, w), 0) > 0:
                s = tri[(u, v, w)] / ctx3[(u, v)]
            elif bi.get((v, w), 0) > 0:
                s = alpha * bi[(v, w)] / ctx1[v]
            else:
                s = alpha * alpha * (uni.get(w, 0) + k) / (n + k * vv)
            lns.append(math.log(s))
        out[i] = (len(lns), float(np.mean(lns)))
    return out


def test_stupid_backoff_self_scoring(spark):
    docs = [(1, "the cat sat on the mat"),
            (2, "the cat sat on the hat"),
            (3, "dogs bark"),
            (4, ""),
            (5, "the cat sat on the mat")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r for r in stupid_backoff_logprob(df).collect()}
    ref = _sb_ref(docs)
    assert set(got) == set(ref)
    for i, (n_ev, lp) in ref.items():
        assert got[i]["n_events"] == n_ev, i
        assert abs(got[i]["sb_logscore"] - lp) < 1e-9, i
        assert abs(got[i]["sb_ppl"] - math.exp(-lp)) < 1e-9, i
    # identical docs score identically; the repeated doc beats the
    # singleton (its trigrams are twice as frequent)
    assert got[1]["sb_logscore"] == got[5]["sb_logscore"]
    assert got[1]["sb_logscore"] > got[3]["sb_logscore"]


def test_stupid_backoff_heldout_oov(spark):
    fit = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    apply_df = spark.createDataFrame(
        [(10, "a b c"), (11, "zz yy")], "doc_id long, text string")
    got = {r["id"]: r for r in
           stupid_backoff_logprob(apply_df, fit_docs=fit).collect()}
    # seen sequence scores far above the all-OOV one; both finite
    assert got[10]["sb_logscore"] > got[11]["sb_logscore"]
    assert math.isfinite(got[11]["sb_logscore"])
    # "zz yy" exactly: 3 events; zz and yy fully OOV (unigram base with
    # c=0), EOS seen twice -> base with c=2. N=8 fit events, V=5.
    b_oov = 0.16 * 0.5 / (8 + 0.5 * 5)
    b_eos = 0.16 * 2.5 / (8 + 0.5 * 5)
    expect = (2 * math.log(b_oov) + math.log(b_eos)) / 3
    assert got[11]["n_events"] == 3
    assert abs(got[11]["sb_logscore"] - expect) < 1e-9


def test_stupid_backoff_null_text_null_scores(spark):
    df = spark.createDataFrame([(1, "a b"), (2, None)],
                               "doc_id long, text string")
    got = {r["id"]: r for r in stupid_backoff_logprob(df).collect()}
    assert got[2]["n_events"] == 0
    assert got[2]["sb_logscore"] is None and got[2]["sb_ppl"] is None
    assert got[1]["n_events"] == 3
