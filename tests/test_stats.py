"""Hypothesis-testing / survival operators (operators/stats.py) vs
pure-numpy reference implementations on small frames."""

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from hipipe_spark.operators.stats import (
    bh_fdr, cuped, cusum_flags, edit_distance_pairs, kaplan_meier,
    mann_whitney, welch_ttest,
)


def _phi2(z):
    a = abs(z)
    return 2.0 / (1.0 + math.exp(0.07056 * a ** 3 + 1.5976 * a))


@pytest.fixture(scope="module")
def metric_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for seg in ("s0", "s1", "s2"):
        for i in range(120):
            arm = "a" if i % 2 == 0 else "b"
            lift = 0.8 if (seg == "s1" and arm == "a") else 0.0
            rows.append((seg, arm, i,
                         float(rng.normal(5.0 + lift, 2.0))))
    return spark.createDataFrame(rows, "seg string, arm string, i int, v double")


def test_welch_matches_numpy(spark, metric_df):
    out = {r["seg"]: r for r in
           welch_ttest(metric_df, "seg", "v", "arm", "a", "b").collect()}
    pdf = metric_df.toPandas()
    for seg, g in pdf.groupby("seg"):
        a = g[g.arm == "a"].v.to_numpy()
        b = g[g.arm == "b"].v.to_numpy()
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        dof = se2 ** 2 / ((va / len(a)) ** 2 / (len(a) - 1)
                          + (vb / len(b)) ** 2 / (len(b) - 1))
        r = out[seg]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert abs(r["t_stat"] - t) < 1e-5
        assert abs(r["dof"] - dof) < 0.05
        assert abs(r["p_value"] - _phi2(t)) < 1e-5
    # the planted lift is the most significant segment
    assert out["s1"]["p_value"] == min(r["p_value"] for r in out.values())


def test_welch_degenerate_arm_null(spark):
    df = spark.createDataFrame(
        [("s", "a", 1.0), ("s", "b", 2.0), ("s", "b", 3.0)],
        "seg string, arm string, v double")
    r = welch_ttest(df, "seg", "v", "arm", "a", "b").collect()[0]
    assert r["t_stat"] is None and r["p_value"] is None


def test_bh_fdr_reference(spark):
    # classic worked example: m=5, alpha=.1
    ps = [0.01, 0.02, 0.03, 0.5, 0.9]
    expected_q = []
    m = len(ps)
    running = 1.0
    for i in range(m - 1, -1, -1):
        running = min(running, ps[i] * m / (i + 1))
        expected_q.append(running)
    expected_q.reverse()
    df = spark.createDataFrame(
        [(f"h{i}", p) for i, p in enumerate(ps)] + [("hnull", None)],
        "hyp string, p_value double")
    out = {r["hyp"]: r for r in
           bh_fdr(df, "p_value", tiebreak=["hyp"], alpha=0.1).collect()}
    for i, q in enumerate(expected_q):
        assert abs(out[f"h{i}"]["q_value"] - q) < 1e-9
    assert out["hnull"]["q_value"] is None and not out["hnull"]["reject"]
    assert out["h0"]["reject"] and not out["h4"]["reject"]


def _mwu_numpy(a, b):
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2  # average of ranks i+1..j
        i = j
    ra = ranks[: len(a)].sum()
    na, nb = len(a), len(b)
    n = na + nb
    u_a = ra - na * (na + 1) / 2
    _, counts = np.unique(allv, return_counts=True)
    tie = float((counts.astype(float) ** 3 - counts).sum())
    sig2 = na * nb / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u_a - na * nb / 2) / math.sqrt(sig2)
    return u_a, z


def test_mann_whitney_matches_numpy(spark, metric_df):
    # quantize to force ties through the average-rank path
    q = metric_df.withColumn("v", F.round("v", 1))
    out = {r["seg"]: r for r in
           mann_whitney(q, "seg", "v", "arm", "a", "b").collect()}
    pdf = q.toPandas()
    for seg, g in pdf.groupby("seg"):
        a = g[g.arm == "a"].v.to_numpy()
        b = g[g.arm == "b"].v.to_numpy()
        u_a, z = _mwu_numpy(a, b)
        r = out[seg]
        assert abs(r["u_a"] - u_a) < 1e-6
        assert abs(r["z_stat"] - z) < 1e-5
        assert abs(r["p_value"] - _phi2(z)) < 1e-5


def test_kaplan_meier_reference(spark):
    # textbook example: durations (d=died, c=censored)
    # t=1 d, t=2 c, t=3 d, t=4 d, t=5 c  on n=5
    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 1), (5, 0)], "t int, ev int")
    out = {r["t"]: r for r in kaplan_meier(df, "t", "ev").collect()}
    # S(1)=4/5=.8 ; t=2 censor keeps .8 ; S(3)=.8*(2/3) ; S(4)=.8*(2/3)*(1/2)
    assert out[1]["n_risk"] == 5 and abs(out[1]["survival"] - 0.8) < 1e-9
    assert out[2]["n_risk"] == 4 and abs(out[2]["survival"] - 0.8) < 1e-9
    assert out[3]["n_risk"] == 3
    assert abs(out[3]["survival"] - 0.8 * 2 / 3) < 1e-6
    assert abs(out[4]["survival"] - 0.8 * 2 / 3 * 0.5) < 1e-6
    assert out[5]["n_risk"] == 1 and abs(out[5]["survival"] -
                                         0.8 * 2 / 3 * 0.5) < 1e-6


def test_kaplan_meier_hits_zero(spark):
    df = spark.createDataFrame([(1, 1), (2, 1)], "t int, ev int")
    out = {r["t"]: r for r in kaplan_meier(df, "t", "ev").collect()}
    assert out[2]["survival"] == 0.0


def test_cuped_reduces_variance(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(10, 3, 600)
    y = 2.5 * x + rng.normal(0, 1, 600)
    grp = np.where(np.arange(600) % 2 == 0, "a", "b")
    pdf = pd.DataFrame({"g": grp, "y": y, "x": x})
    out = cuped(spark.createDataFrame(pdf), "g", "y", "x").collect()
    theta = out[0]["theta"]
    sxy = ((x - x.mean()) * (y - y.mean())).sum()
    assert abs(theta - sxy / ((x - x.mean()) ** 2).sum()) < 1e-3
    for r in out:
        assert r["var_cuped"] < r["var_raw"]
        assert r["var_reduction_pct"] > 80  # strongly correlated covariate


def test_cusum_matches_recursion(spark):
    rng = np.random.default_rng(3)
    rows = []
    for key in ("k1", "k2"):
        base = 5.0
        for i in range(80):
            if key == "k1" and i >= 50:
                base = 9.0  # planted shift
            rows.append((key, i, float(rng.normal(base, 1.0))))
    df = spark.createDataFrame(rows, "k string, i int, v double")
    out = cusum_flags(df, "k", "i", "v", k=6.0, h=8.0)
    got = {(r["k"], r["i"]): r for r in out.collect()}
    pdf = pd.DataFrame(rows, columns=["k", "i", "v"])
    for key, g in pdf.groupby("k"):
        s = 0.0
        for _, row in g.sort_values("i").iterrows():
            s = max(0.0, s + row.v - 6.0)
            r = got[(key, int(row.i))]
            assert abs(r["cusum"] - s) < 1e-6
            assert r["changed"] == (s > 8.0)
    # the planted shift is detected on k1, never on k2
    assert any(r["changed"] for kk, r in got.items() if kk[0] == "k1")
    assert not any(r["changed"] for kk, r in got.items() if kk[0] == "k2")


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_complete(spark):
    words = ["spark", "spork", "sparkle", "hadoop", "hadop", "haddop",
             "flink", "blink", "clink", "zzzzzzzzzz", "pipeline",
             "pipelines", "pypeline", "abc", "abd", "xbd"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id int, txt string")
    d = 2
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_pairs(df, "id", "txt", d).collect()}
    want = {}
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            dist = _lev(words[i], words[j])
            if dist <= d:
                want[(i, j)] = dist
    assert got == want
    assert len(want) >= 5  # the fixture actually exercises pairs


def test_nelson_aalen_textbook_and_km_consistency(spark):
    from hipipe_spark.operators.stats import kaplan_meier, nelson_aalen
    # classic 5-subject example: events at 1, 3; censored at 2, 4, 5
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)]
    df = spark.createDataFrame(rows, "dur: bigint, ev: int")
    na = {r.dur: r for r in nelson_aalen(df, "dur", "ev").collect()}
    assert na[1].n_risk == 5 and na[1].n_event == 1
    assert na[1].cum_hazard == 0.2                  # 1/5
    assert na[3].cum_hazard == round(0.2 + 1 / 3, 6)  # +1/3 at risk 3
    assert na[5].cum_hazard == na[3].cum_hazard     # censoring adds 0
    # Breslow survival upper-bounds (>=) Kaplan-Meier everywhere
    km = {r[0]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    for t in na:
        assert na[t].surv_breslow >= km[t]["survival"] - 1e-9


def test_sprt_decides_correctly_and_stops_early(spark):
    from hipipe_spark.operators.stats import sprt_bernoulli
    # key 'hi': rate 0.8 → accept H1 fast; 'lo': rate 0.1 → accept H0;
    # 'mid': alternating pattern near the indifference zone
    rows = []
    for i in range(200):
        rows.append(("hi", i, 1 if i % 5 != 0 else 0))        # 80%
        rows.append(("lo", i, 1 if i % 10 == 0 else 0))       # 10%
    for i in range(4):
        rows.append(("mid", i, i % 2))                        # 50/50 tiny n
    df = spark.createDataFrame(rows, "k: string, i: long, x: int")
    out = {r.k: r for r in
           sprt_bernoulli(df, "k", ["i"], "x", p0=0.3, p1=0.5).collect()}
    assert out["hi"].decision == "accept_h1"
    assert out["lo"].decision == "accept_h0"
    assert out["hi"].stop_step < 200       # sequential: stops early
    assert out["lo"].stop_step < 200
    assert out["mid"].decision in ("continue", "accept_h1")
    # llr is exact micro-unit arithmetic
    import math
    i1 = round(math.log(0.5 / 0.3) * 1_000_000)
    i0 = round(math.log(0.5 / 0.7) * 1_000_000)
    want = (2 * i1 + 2 * i0) / 1e6        # mid: 2 ones, 2 zeros
    assert abs(out["mid"].llr_final - round(want, 6)) < 1e-9
