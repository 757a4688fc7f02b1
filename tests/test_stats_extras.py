"""Kendall tau-b vs brute force, classification metrics vs manual
confusion math, seasonal decomposition recovery, deterministic DP."""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from hipipe_spark.operators.evaluation import (
    classification_report, classifier_summary)
from hipipe_spark.operators.stats import kendall_tau
from hipipe_spark.operators.temporal import seasonal_decompose
from hipipe_spark.operators.validate import dp_counts


def _brute_tau(xs, ys):
    n = len(xs)
    nc = nd = n1 = n2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = xs[i] - xs[j], ys[i] - ys[j]
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
    n0 = n * (n - 1) // 2
    den = (n0 - n1) * (n0 - n2)
    tau = (nc - nd) / math.sqrt(den) if den > 0 else None
    return nc, nd, tau


def test_kendall_matches_brute_force_with_ties(spark):
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 8, 120).astype(float)      # heavy x ties
    ys = (xs * 2 + rng.randint(0, 5, 120)).astype(float)  # y ties too
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(xs, ys)],
        "g: string, x: double, y: double")
    r = kendall_tau(df, "g", "x", "y").collect()[0]
    nc, nd, tau = _brute_tau(list(xs), list(ys))
    assert (r.nc, r.nd) == (nc, nd)
    assert abs(r.tau_b - tau) < 5.1e-7   # operator rounds tau to 6dp


def test_kendall_perfect_and_constant(spark):
    df = spark.createDataFrame(
        [("up", float(i), float(i * 3)) for i in range(50)]
        + [("dn", float(i), float(-i)) for i in range(50)]
        + [("const", float(i), 1.0) for i in range(50)],
        "g: string, x: double, y: double")
    out = {r.g: r for r in kendall_tau(df, "g", "x", "y").collect()}
    assert out["up"].tau_b == 1.0
    assert out["dn"].tau_b == -1.0
    assert out["const"].tau_b is None      # zero denominator


@pytest.fixture(scope="module")
def clf(spark):
    # labels a,b,c; predictions with known confusion
    rows = (
        [("a", "a")] * 40 + [("a", "b")] * 10
        + [("b", "b")] * 30 + [("b", "c")] * 20
        + [("c", "c")] * 25 + [("c", "a")] * 5)
    return spark.createDataFrame(rows, "label: string, pred: string")


def test_classification_report_manual(clf):
    rep = {r["class"]: r for r in
           classification_report(clf, "label", "pred").collect()}
    assert rep["a"].tp == 40 and rep["a"].fp == 5 and rep["a"].fn == 10
    assert rep["a"].precision == round(40 / 45, 6)
    assert rep["a"].recall == round(40 / 50, 6)
    assert rep["b"].f1 == round(2 * 30 / (40 + 50), 6)
    assert rep["c"].support == 30


def test_classifier_summary_manual(clf):
    s = classifier_summary(clf, "label", "pred").collect()[0]
    assert s.n == 130
    assert s.accuracy == round(95 / 130, 6)
    # Gorodkin MCC from the known confusion matrix
    t = {"a": 50, "b": 50, "c": 30}
    p = {"a": 45, "b": 40, "c": 45}
    c, n = 95, 130
    num = c * n - sum(p[k] * t[k] for k in t)
    den = math.sqrt((n * n - sum(v * v for v in p.values()))
                    * (n * n - sum(v * v for v in t.values())))
    assert abs(s.mcc - num / den) < 1e-6


def test_classification_absent_predicted_class(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("b", "b"), ("c", "b")],
        "label: string, pred: string")
    rep = {r["class"]: r for r in
           classification_report(df, "label", "pred").collect()}
    assert rep["c"].precision is None     # never predicted
    assert rep["c"].recall == 0.0


def test_seasonal_recovers_planted_pattern(spark):
    period = 12
    n = 30 * period
    rows = [(t, 100.0 + 0.5 * t + 10.0 * math.sin(2 * math.pi
                                                  * (t % period) / period))
            for t in range(n)]
    df = spark.createDataFrame(rows, "t: bigint, v: double")
    out = seasonal_decompose(df, "t", "v", period=period).collect()
    by_t = {r.t: r for r in out}
    # edges have no trend; interior does
    assert by_t[0].trend is None and by_t[n - 1].trend is None
    mid = by_t[n // 2]
    assert mid.trend is not None
    # additivity where defined
    for r in out:
        if r.trend is not None:
            assert abs(r.v - (r.trend + r.seasonal + r.resid)) < 1e-4
    # planted amplitude-10 sinusoid recovered within 5%
    amp = max(abs(r.seasonal) for r in out)
    assert 9.5 < amp < 10.5
    # seasonal sums to ~0 across one period
    one = sorted({r.t % period: r.seasonal for r in out}.items())
    assert abs(sum(s for _, s in one)) < 1e-3
    # linear trend slope recovered on the interior
    a, b = by_t[100], by_t[200]
    assert abs((b.trend - a.trend) / 100 - 0.5) < 0.01


def test_dp_counts_deterministic_and_clamped(spark):
    df = spark.createDataFrame(
        [("x",)] * 50 + [("y",)] * 3, "g: string")
    r1 = {r.g: r for r in dp_counts(df, ["g"], epsilon=0.5,
                                    seed=1).collect()}
    r2 = {r.g: r for r in dp_counts(df, ["g"], epsilon=0.5,
                                    seed=1).collect()}
    assert r1["x"].noise == r2["x"].noise          # reproducible
    r3 = {r.g: r for r in dp_counts(df, ["g"], epsilon=0.5,
                                    seed=2).collect()}
    assert any(r1[g].noise != r3[g].noise for g in r1)  # seed matters
    assert all(r.dp_cnt >= 0 for r in r1.values())      # clamp
    assert r1["x"].true_cnt == 50
    with pytest.raises(ValueError):
        dp_counts(df, ["g"], epsilon=0.0)


def test_dp_noise_scale_tracks_epsilon(spark):
    # same cells, two epsilons: noise scales exactly by b2/b1
    df = spark.createDataFrame([(str(i),) for i in range(200)],
                               "g: string")
    lo = {r.g: r.noise for r in
          dp_counts(df, ["g"], epsilon=0.5, seed=3).collect()}
    hi = {r.g: r.noise for r in
          dp_counts(df, ["g"], epsilon=2.0, seed=3).collect()}
    for g in lo:
        assert abs(lo[g] - 4.0 * hi[g]) < 2e-3     # b=2.0 vs b=0.5
    # empirical mean |noise| ≈ b for Laplace
    mean_abs = float(np.mean([abs(v) for v in lo.values()]))
    assert 1.0 < mean_abs < 3.5                    # b = 2.0


def test_mde_shrinks_with_sqrt_n(spark):
    from hipipe_spark.operators.stats import mde_report
    import numpy as np
    rng = np.random.RandomState(4)
    rows = ([("small", float(v)) for v in rng.normal(10, 2, 100)]
            + [("big", float(v)) for v in rng.normal(10, 2, 400)])
    df = spark.createDataFrame(rows, "seg: string, v: double")
    out = {r.seg: r for r in mde_report(df, "seg", "v").collect()}
    # 4x the sample → half the MDE (same sigma)
    ratio = out["small"].mde_abs / out["big"].mde_abs
    assert 1.7 < ratio < 2.3
    # sanity: MDE ≈ 2.8 * sd * sqrt(4/n)
    r = out["big"]
    assert abs(r.mde_abs - 2.801585 * r.sd * (4 / 400) ** 0.5) < 1e-4


def test_burstiness_regimes(spark):
    import datetime as dt
    import numpy as np
    from hipipe_spark.operators.stats import burstiness
    base = dt.datetime(2026, 1, 1)
    rng = np.random.RandomState(6)
    rows = []
    # periodic: constant 60s gaps → B = -1
    t = base
    for i in range(200):
        rows.append(("periodic", t, i))
        t += dt.timedelta(seconds=60)
    # poisson: exponential gaps → B ≈ 0
    t = base
    for i in range(2000):
        rows.append(("poisson", t, i))
        t += dt.timedelta(seconds=float(rng.exponential(60)))
    # bursty: pareto-ish heavy gaps → B > 0.3
    t = base
    for i in range(2000):
        rows.append(("bursty", t, i))
        t += dt.timedelta(seconds=float(rng.pareto(1.2) * 10 + 0.001))
    df = spark.createDataFrame(rows, "k: string, ts: timestamp, i: long")
    out = {r.k: r for r in burstiness(df, "k", "ts", "i").collect()}
    assert out["periodic"].b == -1.0
    assert abs(out["poisson"].b) < 0.1
    assert out["bursty"].b > 0.3


def test_seq_patterns_planted_motif(spark):
    import datetime as dt
    from hipipe_spark.operators.temporal import seq_patterns
    base = dt.datetime(2026, 1, 1)
    rows = []
    for u in range(10):
        seq = ["a", "b", "c"] * 4 + ["x"]      # motif in every user
        for i, tok in enumerate(seq):
            rows.append((u, base + dt.timedelta(seconds=i), i, tok))
    df = spark.createDataFrame(rows,
                               "u: long, ts: timestamp, i: long, tok: string")
    out = seq_patterns(df, "u", "tok", ["ts", "i"], n=3,
                       min_support=2, top_k=5).collect()
    top = out[0]
    assert (top.t1, top.t2, top.t3) == ("a", "b", "c")
    assert top.support == 10 and top.occurrences == 40


def test_prop_ztest_detects_planted_lift(spark):
    from hipipe_spark.operators.stats import prop_ztest
    rows = ([("s", 1, "a")] * 300 + [("s", 0, "a")] * 700    # 30%
            + [("s", 1, "b")] * 200 + [("s", 0, "b")] * 800)  # 20%
    df = spark.createDataFrame(rows, "seg: string, hi: int, arm: string")
    r = prop_ztest(df, "seg", "hi", "arm", "a", "b").collect()[0]
    assert r.rate_a == 0.3 and r.rate_b == 0.2 and r.diff == 0.1
    assert r.p_value < 1e-5                      # ~5 sigma
    # null: identical arms
    rows2 = [("s", i % 2, "a") for i in range(400)] + \
            [("s", i % 2, "b") for i in range(400)]
    df2 = spark.createDataFrame(rows2, "seg: string, hi: int, arm: string")
    r2 = prop_ztest(df2, "seg", "hi", "arm", "a", "b").collect()[0]
    assert r2.p_value > 0.9


def test_chi2_independent_vs_dependent(spark):
    from hipipe_spark.operators.drift import chi2_test
    # independent: b uniform within each a
    ind = [(c, i % 2) for c in "xyz" for i in range(200)]
    dfi = spark.createDataFrame(ind, "a: string, b: int")
    ri = chi2_test(dfi, "a", "b").collect()[0]
    assert ri.chi2 == 0.0 and ri.dof == 2
    assert ri.p_value > 0.99
    # dependent: b == (a == 'x')
    dep = [("x", 1)] * 200 + [("y", 0)] * 200 + [("z", 0)] * 200
    dfd = spark.createDataFrame(dep, "a: string, b: int")
    rd = chi2_test(dfd, "a", "b").collect()[0]
    assert rd.chi2 > 300 and rd.p_value < 1e-6


def test_log_odds_finds_planted_vocabulary(spark):
    from hipipe_spark.operators.retrieval import log_odds_terms
    common = "the quick brown fox jumps over lazy dogs daily "
    a = spark.createDataFrame(
        [(i, common + "alpha alpha special") for i in range(50)],
        "doc_id: long, text: string")
    b = spark.createDataFrame(
        [(i, common + "omega omega different") for i in range(50)],
        "doc_id: long, text: string")
    out = log_odds_terms(a, b, "text", min_count=10,
                         top_k=3).collect()
    top_a = [r.term for r in out if r.side == "a"]
    top_b = [r.term for r in out if r.side == "b"]
    assert top_a[0] == "alpha" and "special" in top_a
    assert top_b[0] == "omega" and "different" in top_b
    # shared vocabulary stays near zero
    za = {r.term: r.z for r in out}
    assert "the" not in (top_a[:1] + top_b[:1])


def test_lorenz_curve_shapes(spark):
    from hipipe_spark.operators.stats import lorenz_curve
    rows = ([("equal", 5.0)] * 100
            + [("skew", 0.1)] * 99 + [("skew", 1000.0)])
    df = spark.createDataFrame(rows, "g: string, v: double")
    out = {}
    for r in lorenz_curve(df, "g", "v", max_points=20).collect():
        out.setdefault(r.g, []).append((r.pop_share, r.mass_share))
    # perfect equality: curve is the diagonal
    for p, m in out["equal"]:
        assert abs(p - m) < 1e-6
    # extreme concentration: curve hugs the floor then jumps to 1
    skew = dict(out["skew"])
    assert skew[1.0] == 1.0                     # endpoint always kept
    below = [m for p, m in out["skew"] if p < 1.0]
    assert max(below) < 0.01                    # 99% hold ~nothing
    # monotone nondecreasing in both coordinates
    pts = sorted(out["skew"])
    assert all(pts[i][1] <= pts[i + 1][1] + 1e-9
               for i in range(len(pts) - 1))


def test_kendall_group_size_guard_refuses_loudly(spark):
    # a group bigger than max_group_rows must fail fast with the group
    # name in the message, not OOM an executor (salted_join policy)
    df = spark.createDataFrame(
        [("big", float(i), float(i % 7)) for i in range(100)],
        "g: string, x: double, y: double")
    with pytest.raises(Exception, match="max_group_rows"):
        kendall_tau(df, "g", "x", "y", max_group_rows=50).collect()
    # the cap is per-group: under it, same frame computes fine
    assert kendall_tau(df, "g", "x", "y",
                       max_group_rows=100).count() == 1


def test_seq_patterns_window_full_test_is_positional(spark):
    # null token at a LEADING lag position must not drop the gram
    # while interior nulls keep it: the window-full test is
    # row_number() >= n, not t1 IS NOT NULL (ADVICE r3)
    import datetime as dt
    from hipipe_spark.operators.temporal import seq_patterns
    base = dt.datetime(2026, 1, 1)
    rows = []
    for u in range(3):
        seq = [None, "b", "c", None, "b", "c"]  # null leads 2 grams
        for i, tok in enumerate(seq):
            rows.append((u, base + dt.timedelta(seconds=i), i, tok))
    df = spark.createDataFrame(rows,
                               "u: long, ts: timestamp, i: long, tok: string")
    out = seq_patterns(df, "u", "tok", ["ts", "i"], n=3,
                       min_support=2, top_k=10).collect()
    pats = {(r.t1, r.t2, r.t3): r.support for r in out}
    # (null, b, c) is a legitimate full-window gram: rows 1-2 and 4-5
    assert pats.get((None, "b", "c")) == 3
    # first two rows of each user never form a gram (window not full)
    assert (None, None, "b") not in pats
