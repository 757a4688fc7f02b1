"""Round-4 continuation operators: Kneser-Ney perplexity, L2
changepoint, empirical-Bayes shrinkage, split-conformal intervals."""

import math

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.evaluation import conformal_intervals
from hipipe_spark.operators.retrieval import kneser_ney_perplexity
from hipipe_spark.operators.stats import changepoint_l2, eb_shrinkage


# ------------------------------------------------------ Kneser-Ney LM
def test_kn_self_fit_manual(spark):
    # corpus: "a b", "a b", "a c" -> chains BOS a b EOS etc.
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"])
    out = {r["id"]: r for r in
           kneser_ney_perplexity(docs, discount=0.5).collect()}
    # count tables over the BOS-chain events:
    # big: (BOS,a):3 (a,b):2 (a,c):1 (b,EOS):2 (c,EOS):1  -> B=5 types
    # cc:  BOS:3 a:3 b:2 c:1 ; n1+(ctx): BOS:1 a:2 b:1 c:1
    # n1+(*,w): a:1 b:1 c:1 EOS:2
    d, B = 0.5, 5.0
    def p(cb, cc, n1c, n1l):
        return (max(cb - d, 0.0) + d * n1c * (n1l / B)) / cc
    lp1 = (math.log(p(3, 3, 1, 1)) + math.log(p(2, 3, 2, 1))
           + math.log(p(2, 2, 1, 2))) / 3
    assert out[1]["n_events"] == 3
    assert out[1]["logprob"] == pytest.approx(lp1, rel=1e-12)
    assert out[1]["ppl"] == pytest.approx(math.exp(-lp1), rel=1e-12)
    # doc 3's "a c" path is rarer -> higher perplexity than doc 1
    assert out[3]["ppl"] > out[1]["ppl"]


def test_kn_probabilities_sum_to_one(spark):
    # interpolated KN must be a proper distribution: for a fixed seen
    # context, sum_w P(w|ctx) over the fit VOCABULARY (all nxt types)
    # equals 1 (discount mass exactly re-distributed).
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x z y"), (3, "y x")], ["doc_id", "text"])
    # rebuild the tables in python via the same event chain
    chains = [["\x02", "x", "y", "z", "\x03"],
              ["\x02", "x", "z", "y", "\x03"],
              ["\x02", "y", "x", "\x03"]]
    big: dict[tuple, int] = {}
    for ch in chains:
        for a, b in zip(ch, ch[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    B = len(big)
    cc = {}
    n1c = {}
    n1l = {}
    for (a, b), c in big.items():
        cc[a] = cc.get(a, 0) + c
        n1c[a] = n1c.get(a, 0) + 1
        n1l[b] = n1l.get(b, 0) + 1
    d = 0.75
    vocab = sorted(n1l)
    for ctx in cc:
        tot = sum((max(big.get((ctx, w), 0) - d, 0.0)
                   + d * n1c[ctx] * (n1l[w] / B)) / cc[ctx]
                  for w in vocab)
        assert tot == pytest.approx(1.0, abs=1e-12)
    # and the Spark scorer agrees with the python replica on doc 1
    out = {r["id"]: r for r in
           kneser_ney_perplexity(docs, discount=0.75).collect()}
    ch = chains[0]
    lp = sum(math.log((max(big[(a, b)] - d, 0.0)
                       + d * n1c[a] * (n1l[b] / B)) / cc[a])
             for a, b in zip(ch, ch[1:])) / (len(ch) - 1)
    assert out[1]["logprob"] == pytest.approx(lp, rel=1e-12)


def test_kn_empty_doc_and_heldout_backoff(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "")],
                                 ["doc_id", "text"])
    out = {r["id"]: r for r in
           kneser_ney_perplexity(docs).collect()}
    # empty text still scores the single BOS->EOS event
    assert out[2]["n_events"] == 1
    # held-out doc with an unseen CONTEXT backs off to continuation
    fit = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    score = spark.createDataFrame([(9, "q b")], ["doc_id", "text"])
    row = kneser_ney_perplexity(score, fit_docs=fit).collect()[0]
    # events: (BOS,q) unseen nxt -> p=0 -> null lnp skipped;
    # (q,b) unseen ctx -> p_cont(b)=1/3; (b,EOS) seen
    assert row["n_events"] == 3
    assert row["logprob"] is not None


# ------------------------------------------------------- changepoint
def test_changepoint_finds_level_shift(spark):
    rows = [("a", i, 10.0 if i <= 20 else 25.0) for i in range(1, 41)]
    rows += [("b", i, 5.0) for i in range(1, 11)]       # flat: gain 0
    rows += [("c", i, float(i)) for i in range(1, 4)]   # too short
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    out = {r["g"]: r for r in
           changepoint_l2(df, "g", "t", "x", min_seg=2).collect()}
    assert out["a"]["cp_idx"] == 20 and out["a"]["cp_order"] == 20
    assert out["a"]["sse_split"] == pytest.approx(0.0, abs=1e-6)
    assert out["a"]["gain"] == pytest.approx(out["a"]["sse_total"])
    assert out["b"]["gain"] == pytest.approx(0.0, abs=1e-6)
    # earliest-split tie-break on the flat series
    assert out["b"]["cp_idx"] == 2
    assert out["c"]["cp_idx"] is None and out["c"]["n"] == 3


def test_changepoint_min_seg_validation(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], ["g", "t", "x"])
    with pytest.raises(ValueError):
        changepoint_l2(df, "g", "t", "x", min_seg=0)


# ------------------------------------------------------ EB shrinkage
def test_eb_shrinkage_pulls_small_groups(spark):
    rows = []
    # 20 well-observed groups at rate ~0.2 (100 trials each)
    for g in range(20):
        k = 15 + (g % 10)  # rates 0.15..0.24
        rows += [(g, 1)] * k + [(g, 0)] * (100 - k)
    rows += [(99, 1)]  # the 1/1 = 100% offender
    df = spark.createDataFrame(rows, ["g", "f"])
    out = {r["g"]: r for r in
           eb_shrinkage(df, "g", F.col("f") == 1, min_n=5).collect()}
    loud = out[99]
    assert loud["rate"] == 1.0
    # shrunk all the way back toward the ~0.2 prior mean
    assert loud["shrunk"] < 0.5
    assert abs(loud["shrunk"] - loud["prior_m"]) < 0.1
    # big groups move far less than the 1/1 offender
    big = out[0]
    assert abs(big["shrunk"] - big["rate"]) < 0.05
    assert (abs(big["shrunk"] - big["rate"])
            < 0.2 * abs(loud["shrunk"] - loud["rate"]))
    # shrinkage is toward the prior mean for every group
    for r in out.values():
        if r["prior_k"] is None:
            continue
        lo, hi = sorted([r["rate"], r["prior_m"]])
        assert lo - 1e-6 <= r["shrunk"] <= hi + 1e-6


def test_eb_shrinkage_degenerate_variance(spark):
    # identical rates -> v=0 -> raw rates pass through
    df = spark.createDataFrame(
        [(1, 1), (1, 0), (2, 1), (2, 0)], ["g", "f"])
    out = eb_shrinkage(df, "g", F.col("f") == 1).collect()
    for r in out:
        assert r["shrunk"] == r["rate"] and r["prior_k"] is None


# --------------------------------------------------------- conformal
def test_conformal_coverage_near_alpha(spark):
    # deterministic pseudo-noise values per key
    df = (spark.range(4000)
          .select(F.col("id").alias("k"),
                  F.lit("g").alias("g"),
                  (F.pmod(F.col("id") * 2654435761, F.lit(1000))
                   / 1000.0).alias("y")))
    row = conformal_intervals(df, "g", "y", "k", alpha=0.1).collect()[0]
    assert row["n_train"] + row["n_cal"] + row["n_test"] == 4000
    # uniform noise: q should be near the 90th pct of |y - 0.5| ~ 0.45
    assert 0.40 < row["q_conf"] < 0.50
    assert 0.85 < row["coverage"] <= 0.97


def test_conformal_tiny_calibration_null_q(spark):
    # 3 rows: whatever the split, ceil((n_cal+1)*0.9) > n_cal for
    # n_cal <= 8, so q must be null and coverage null
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(3)], ["g", "k", "y"])
    row = conformal_intervals(df, "g", "y", "k", alpha=0.1).collect()[0]
    assert row["q_conf"] is None and row["coverage"] is None


def test_conformal_alpha_validation(spark):
    df = spark.createDataFrame([("g", 1, 1.0)], ["g", "k", "y"])
    with pytest.raises(ValueError):
        conformal_intervals(df, "g", "y", "k", alpha=1.5)


# -------------------------------------------------- compression ratio
def test_compression_ratio_matches_zlib(spark):
    import zlib

    from hipipe_spark.functions.text import compression_ratio

    texts = ["hello world " * 50,           # highly repetitive
             "the quick brown fox jumps over the lazy dog",
             "abc", "", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "t"])
    out = {r["i"]: r["cr"] for r in
           df.select("i", compression_ratio(F.col("t")).alias("cr"))
             .collect()}
    for i, t in enumerate(texts):
        if not t:
            assert out[i] is None
        else:
            b = t.encode()
            assert out[i] == pytest.approx(
                len(zlib.compress(b, 6)) / len(b), rel=1e-12)
    # repetitive text compresses far better than prose
    assert out[0] < 0.1 < out[1]


def test_compressed_size_matches_zlib(spark):
    import zlib

    from hipipe_spark.functions.text import compressed_size

    texts = ["hello world " * 50,
             "the quick brown fox jumps over the lazy dog",
             "abc", "", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "t"])
    out = {r["i"]: r["n"] for r in
           df.select("i", compressed_size(F.col("t")).alias("n"))
             .collect()}
    for i, t in enumerate(texts):
        if not t:
            assert out[i] is None
        else:
            assert out[i] == len(zlib.compress(t.encode(), 6))


# -------------------------------------------------------------- HITS
def test_hits_matches_numpy_power_iteration(spark):
    import numpy as np

    from hipipe_spark.operators.graph import hits

    edges = [("h1", "a1"), ("h1", "a2"), ("h1", "a3"), ("h2", "a1"),
             ("a1", "h1")]  # one back-edge so hubs get authority too
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r for r in hits(df, n_iter=8).collect()}

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    hub = np.ones(len(nodes))
    for _ in range(8):
        auth = A.T @ hub
        auth /= round(float(np.sqrt((auth ** 2).sum())), 12)
        hub = A @ auth
        hub /= round(float(np.sqrt((hub ** 2).sum())), 12)
    for n in nodes:
        assert out[n]["hub"] == pytest.approx(hub[idx[n]], abs=1e-9)
        assert out[n]["auth"] == pytest.approx(auth[idx[n]], abs=1e-9)
    # structure: h1 is the dominant hub, a1 the dominant authority
    assert out["h1"]["hub"] == max(r["hub"] for r in out.values())
    assert out["a1"]["auth"] == max(r["auth"] for r in out.values())


def test_hits_parallel_edges_and_validation(spark):
    from hipipe_spark.operators.graph import hits

    # duplicated edges must not change the (unweighted) result
    df1 = spark.createDataFrame([("a", "b"), ("a", "b"), ("b", "c")],
                                ["src", "dst"])
    df2 = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    r1 = {r["node"]: (r["hub"], r["auth"])
          for r in hits(df1, n_iter=4, round_to=9).collect()}
    r2 = {r["node"]: (r["hub"], r["auth"])
          for r in hits(df2, n_iter=4, round_to=9).collect()}
    assert r1 == r2
    with pytest.raises(ValueError):
        hits(df1, n_iter=-1)


# ---------------------------------------------------------- log-rank
def test_logrank_matches_manual_hypergeometric(spark):
    from hipipe_spark.operators.stats import logrank_test

    # (duration, event, is_a) — classic small example with ties
    rows = [(1, 1, 1), (2, 1, 1), (2, 0, 1), (4, 1, 1),
            (1, 1, 0), (3, 1, 0), (4, 0, 0), (5, 1, 0)]
    df = spark.createDataFrame(rows, ["d", "e", "a"])
    out = logrank_test(df, "d", "e", "a").collect()[0]

    # manual: risk sets by descending-duration cumsum
    import collections
    per_t = collections.defaultdict(lambda: [0, 0, 0, 0])
    for d, e, a in rows:
        per_t[d][0] += 1
        per_t[d][1] += a
        per_t[d][2] += e
        per_t[d][3] += e * a
    O = E = V = 0.0
    r_all = r_a = 0
    for d in sorted(per_t, reverse=True):
        n_all, n_a, d_all, d_a = per_t[d]
        r_all += n_all
        r_a += n_a
        if d_all > 0:
            frac = r_a / r_all
            O += d_a
            E += d_all * frac
            if r_all > 1:
                V += (d_all * frac * (1 - frac)
                      * (r_all - d_all) / (r_all - 1))
    z = (O - E) / V ** 0.5
    assert out["n_a"] == 4 and out["n_b"] == 4 and out["n_events"] == 6
    assert out["observed_a"] == O
    assert out["expected_a"] == pytest.approx(E, abs=1e-6)
    assert out["var_a"] == pytest.approx(V, abs=1e-6)
    assert out["z"] == pytest.approx(z, abs=1e-5)
    assert 0 <= out["p_value"] <= 1


def test_logrank_identical_groups_z_near_zero(spark):
    from hipipe_spark.operators.stats import logrank_test

    # two identical copies of the same lifetimes -> O == E exactly
    rows = [(d, 1, a) for d in (1, 2, 3, 5, 8) for a in (0, 1)]
    df = spark.createDataFrame(rows, ["d", "e", "a"])
    out = logrank_test(df, "d", "e", "a").collect()[0]
    assert out["z"] == pytest.approx(0.0, abs=1e-9)
    assert out["p_value"] == pytest.approx(1.0, abs=1e-3)


# ------------------------------------------------------ link features
def test_link_features_manual_graph(spark):
    from hipipe_spark.operators.graph import link_features

    # path a-w1-b plus both link to w2; a-b NOT adjacent
    # degrees: a:2 (w1,w2), b:2, w1:2 (a,b), w2:2 (a,b)
    edges = [("a", "w1"), ("w1", "b"), ("a", "w2"), ("w2", "b")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {(r["node_a"], r["node_b"]): r
           for r in link_features(df, min_common=1).collect()}
    import math
    ab = out[("a", "b")]
    assert ab["common"] == 2
    assert ab["adamic_adar"] == pytest.approx(2 / math.log(2), abs=1e-6)
    assert ab["resource_alloc"] == pytest.approx(1.0, abs=1e-6)
    # jaccard = 2 shared / (2 + 2 - 2) = 1.0 (identical neighbor sets)
    assert ab["jaccard"] == pytest.approx(1.0, abs=1e-6)
    # w1-w2 share neighbors a and b, also non-adjacent
    assert out[("w1", "w2")]["common"] == 2
    # adjacent pairs never appear
    assert ("a", "w1") not in out and ("w1", "b") not in out


def test_link_features_hub_cap_prunes(spark):
    from hipipe_spark.operators.graph import link_features

    # star hub h connects x1..x5: every xi,xj pair shares only h
    edges = [("h", f"x{i}") for i in range(5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    full = link_features(df, min_common=1).count()
    capped = link_features(df, max_degree=3, min_common=1).count()
    assert full == 10  # C(5,2) wedges through the hub
    assert capped == 0  # hub (deg 5) dropped before the wedge join


# ------------------------------------------------------------ k-core
def test_kcore_peels_tail_keeps_clique(spark):
    from hipipe_spark.operators.graph import k_core

    # K4 clique (deg 3 each) with a pendant path hanging off it
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
             ("b", "d"), ("c", "d"), ("d", "p1"), ("p1", "p2")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r for r in k_core(df, k=3).collect()}
    assert all(out[n]["in_core"] for n in "abcd")
    assert not out["p1"]["in_core"] and not out["p2"]["in_core"]
    assert all(out[n]["core_deg"] == 3 for n in "abcd")
    assert out["p1"]["core_deg"] == 0
    assert all(r["converged"] for r in out.values())
    # k above the clique degree peels everything
    out4 = k_core(df, k=4).collect()
    assert all(not r["in_core"] for r in out4)
    assert all(r["converged"] for r in out4)


def test_kcore_cascade_needs_multiple_rounds(spark):
    from hipipe_spark.operators.graph import k_core

    # chain c0-c1-...-c5 into a triangle: k=2 peels the chain one
    # node per round (a 5-round cascade), triangle survives
    edges = [(f"c{i}", f"c{i+1}") for i in range(5)]
    edges += [("c5", "t1"), ("t1", "t2"), ("t2", "c5")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r for r in k_core(df, k=2, n_rounds=10).collect()}
    assert all(out[n]["in_core"] for n in ("c5", "t1", "t2"))
    assert all(not out[f"c{i}"]["in_core"] for i in range(5))
    assert all(r["converged"] for r in out.values())
    # truncated run discloses itself
    out2 = k_core(df, k=2, n_rounds=2).collect()
    assert all(not r["converged"] for r in out2)


def test_kcore_validation(spark):
    from hipipe_spark.operators.graph import k_core

    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        k_core(df, k=0)
    with pytest.raises(ValueError):
        k_core(df, k=2, n_rounds=0)
