"""Property tests for the round-4 continuation ops: random inputs
probe the invariants the fixtures don't (changepoint vs brute force,
KN vs a pure-python replica, EB shrinkage monotonicity, conformal
split conservation)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(xs=st.lists(st.integers(0, 20), min_size=4, max_size=24),
       min_seg=st.sampled_from([1, 2]))
def test_changepoint_matches_bruteforce(spark, xs, min_seg):
    """The windowed argmin equals the O(n²) direct SSE scan —
    split index, SSE, and gain — on any integer series."""
    from hipipe_spark.operators.stats import changepoint_l2

    df = spark.createDataFrame(
        [("g", i, float(x)) for i, x in enumerate(xs)], ["g", "t", "x"])
    row = changepoint_l2(df, "g", "t", "x", min_seg=min_seg).collect()[0]
    n = len(xs)

    def sse(seg):
        m = sum(seg) / len(seg)
        return sum((v - m) ** 2 for v in seg)

    cands = [(sse(xs[:t]) + sse(xs[t:]), t)
             for t in range(min_seg, n - min_seg + 1)]
    if not cands:
        assert row["cp_idx"] is None
        return
    best_sse, best_t = min(cands)  # ties -> smallest t, like the op
    assert row["cp_idx"] == best_t
    assert row["sse_split"] == pytest.approx(best_sse, abs=1e-6)
    assert row["sse_total"] == pytest.approx(sse(xs), abs=1e-6)
    assert row["gain"] == pytest.approx(sse(xs) - best_sse, abs=1e-6)
    assert row["gain"] >= -1e-9


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(
    st.text(alphabet="ab c", min_size=1, max_size=12).map(str.strip)
      .filter(bool),
    min_size=1, max_size=6))
def test_kn_matches_python_replica(spark, texts):
    """Self-fit KN logprob equals a pure-python replica of the count
    tables and the probability expression on any tiny corpus."""
    from hipipe_spark.operators.retrieval import kneser_ney_perplexity

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = {r["id"]: r for r in
           kneser_ney_perplexity(df, discount=0.75).collect()}

    chains = [["\x02"] + t.lower().split() + ["\x03"] for t in texts]
    big: dict[tuple, int] = {}
    for ch in chains:
        for a, b in zip(ch, ch[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    B = len(big)
    cc: dict[str, int] = {}
    n1c: dict[str, int] = {}
    n1l: dict[str, int] = {}
    for (a, b), c in big.items():
        cc[a] = cc.get(a, 0) + c
        n1c[a] = n1c.get(a, 0) + 1
        n1l[b] = n1l.get(b, 0) + 1
    d = 0.75
    for i, ch in enumerate(chains):
        lps = [math.log((max(big[(a, b)] - d, 0.0)
                         + d * n1c[a] * (n1l[b] / B)) / cc[a])
               for a, b in zip(ch, ch[1:])]
        assert out[i]["n_events"] == len(lps)
        assert out[i]["logprob"] == pytest.approx(
            sum(lps) / len(lps), rel=1e-10)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ks=st.lists(st.tuples(st.integers(1, 50), st.integers(0, 50)),
                   min_size=3, max_size=10))
def test_eb_shrinkage_between_rate_and_prior(spark, ks):
    """For every group, the shrunk rate lies between the raw rate and
    the prior mean (inclusive), and prior_m is the mean of eligible
    raw rates."""
    from hipipe_spark.operators.stats import eb_shrinkage

    rows = []
    for g, (n, k) in enumerate(ks):
        k = min(k, n)
        rows += [(g, 1)] * k + [(g, 0)] * (n - k)
    df = spark.createDataFrame(rows, ["g", "f"])
    out = eb_shrinkage(df, "g", F.col("f") == 1, min_n=1).collect()
    rates = [min(k, n) / n for (n, k) in ks]
    m = sum(rates) / len(rates)
    for r in out:
        assert r["prior_m"] == pytest.approx(m, abs=1e-8)
        if r["prior_k"] is None:
            assert r["shrunk"] == r["rate"]
        else:
            lo, hi = sorted([r["rate"], r["prior_m"]])
            assert lo - 1e-6 <= r["shrunk"] <= hi + 1e-6


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=st.integers(30, 300), alpha=st.sampled_from([0.1, 0.2, 0.5]),
       seed=st.integers(0, 20))
def test_conformal_split_conservation(spark, n, alpha, seed):
    """Train+cal+test always partition the input; q_conf is one of
    the calibration residuals whenever non-null."""
    from hipipe_spark.operators.evaluation import conformal_intervals

    df = (spark.range(n)
          .select(F.col("id").alias("k"), F.lit("g").alias("g"),
                  (F.pmod(F.col("id") * 48271 + seed, F.lit(97))
                   / 97.0).alias("y")))
    row = conformal_intervals(df, "g", "y", "k",
                              alpha=alpha, seed=seed).collect()[0]
    assert row["n_train"] + row["n_cal"] + row["n_test"] == n
    if row["q_conf"] is not None:
        assert row["q_conf"] >= 0
        assert row["coverage"] is None or 0 <= row["coverage"] <= 1
