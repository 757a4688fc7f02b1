"""Classical hypothesis-test battery: ANOVA, Brown-Forsythe,
Jarque-Bera, Kruskal-Wallis, CMH, TOST — each checked against an
independent pure-numpy replica on a deterministic synthetic frame."""

import math

import numpy as np
import pandas as pd
import pytest

from hipipe_spark.operators.stats import (
    anova_oneway, cmh_test, jarque_bera, kruskal_wallis, levene_bf,
    tost_equiv,
)


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.RandomState(7)
    n = 1200
    seg = rng.choice(["s1", "s2"], n)
    grp = rng.randint(0, 4, n)
    # group 3 gets a mean shift and variance inflation so the tests
    # have real signal to detect
    val = np.round(rng.normal(10 + (grp == 3) * 2.0,
                              1.0 + (grp == 3) * 1.5), 2)
    pdf = pd.DataFrame({"seg": seg, "grp": grp.astype("int32"),
                        "val": val})
    return spark.createDataFrame(pdf).cache(), pdf


def _anova_np(pdf, seg, grp, val):
    out = {}
    for s, sub in pdf.groupby(seg):
        groups = [g[val].to_numpy(float) for _, g in sub.groupby(grp)]
        allv = sub[val].to_numpy(float)
        gmean = allv.mean()
        ssb = sum(len(g) * (g.mean() - gmean) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        k, n = len(groups), len(allv)
        msw = ssw / (n - k)
        f = (ssb / (k - 1)) / msw
        sst = ssb + ssw
        out[s] = dict(k=k, n=n, ssb=ssb, ssw=ssw, f=f,
                      eta2=ssb / sst,
                      omega2=(ssb - (k - 1) * msw) / (sst + msw))
    return out


def test_anova_matches_numpy(spark, frame):
    df, pdf = frame
    got = {r["seg"]: r.asDict()
           for r in anova_oneway(df, "seg", "grp", "val").collect()}
    ref = _anova_np(pdf, "seg", "grp", "val")
    assert set(got) == set(ref)
    for s in ref:
        assert got[s]["k"] == ref[s]["k"]
        assert got[s]["n"] == ref[s]["n"]
        assert math.isclose(got[s]["ss_between"], ref[s]["ssb"],
                            rel_tol=1e-4, abs_tol=1e-3)
        assert math.isclose(got[s]["ss_within"], ref[s]["ssw"],
                            rel_tol=1e-4, abs_tol=1e-3)
        assert math.isclose(got[s]["f_stat"], ref[s]["f"], rel_tol=1e-4)
        assert math.isclose(got[s]["eta2"], ref[s]["eta2"], rel_tol=1e-4)
        assert math.isclose(got[s]["omega2"], ref[s]["omega2"],
                            rel_tol=1e-4)


def test_anova_flat_groups_low_f(spark):
    # identical group distributions -> F near 0..small, eta2 tiny
    pdf = pd.DataFrame({
        "seg": ["a"] * 400,
        "grp": [i % 4 for i in range(400)],
        "val": [float((i // 4) % 10) for i in range(400)],
    })
    row = anova_oneway(spark.createDataFrame(pdf),
                       "seg", "grp", "val").collect()[0]
    assert row["eta2"] < 0.01


def test_levene_detects_variance_inflation(spark, frame):
    df, pdf = frame
    got = {r["seg"]: r.asDict()
           for r in levene_bf(df, "seg", "grp", "val").collect()}
    # numpy Brown-Forsythe replica
    for s, sub in pdf.groupby("seg"):
        zs = []
        for _, g in sub.groupby("grp"):
            v = g["val"].to_numpy(float)
            zs.append(np.abs(v - np.round(np.median(v), 6)))
        allz = np.concatenate(zs)
        gmean = allz.mean()
        ssb = sum(len(z) * (z.mean() - gmean) ** 2 for z in zs)
        ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
        k, n = len(zs), len(allz)
        w = (ssb / (k - 1)) / (ssw / (n - k))
        assert math.isclose(got[s]["w_stat"], w, rel_tol=1e-3), s
        # variance inflation in group 3 must be detected
        assert got[s]["w_stat"] > 10.0


def test_jarque_bera_matches_numpy(spark, frame):
    df, pdf = frame
    got = {r["grp"]: r.asDict()
           for r in jarque_bera(df, "grp", "val").collect()}
    for g, sub in pdf.groupby("grp"):
        v = sub["val"].to_numpy(float)
        mu = round(v.mean(), 6)
        d = v - mu
        n = len(v)
        m2, m3, m4 = (d ** 2).mean(), (d ** 3).mean(), (d ** 4).mean()
        skew = m3 / m2 ** 1.5
        exk = m4 / m2 ** 2 - 3.0
        jb = n / 6.0 * (skew ** 2 + exk ** 2 / 4.0)
        assert got[g]["n"] == n
        assert math.isclose(got[g]["skew"], skew, abs_tol=1e-4)
        assert math.isclose(got[g]["ex_kurt"], exk, abs_tol=1e-4)
        assert math.isclose(got[g]["jb"], jb, rel_tol=1e-3, abs_tol=1e-3)


def test_jarque_bera_normal_sample_small(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({"g": ["x"] * 3000,
                        "v": np.round(rng.normal(0, 1, 3000), 3)})
    row = jarque_bera(spark.createDataFrame(pdf), "g", "v").collect()[0]
    assert row["jb"] < 9.0  # ~chi2(2): normal data stays small
    pdf["v"] = np.round(np.exp(rng.normal(0, 1, 3000)), 3)  # lognormal
    row = jarque_bera(spark.createDataFrame(pdf), "g", "v").collect()[0]
    assert row["jb"] > 100.0


def test_kruskal_wallis_matches_numpy(spark, frame):
    df, pdf = frame
    got = {r["seg"]: r.asDict()
           for r in kruskal_wallis(df, "seg", "grp", "val").collect()}
    for s, sub in pdf.groupby("seg"):
        v = sub["val"].to_numpy(float)
        g = sub["grp"].to_numpy()
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        r = np.arange(1, len(v) + 1, dtype=float)
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            r[i:j] = r[i:j].mean()
            i = j
        ranks[order] = r
        n = len(v)
        r2 = sum(ranks[g == lev].sum() ** 2 / (g == lev).sum()
                 for lev in np.unique(g))
        h = 12.0 / (n * (n + 1)) * r2 - 3.0 * (n + 1)
        _, t = np.unique(v, return_counts=True)
        corr = 1.0 - (t ** 3 - t).sum() / (n ** 3 - n)
        assert got[s]["n"] == n
        assert math.isclose(got[s]["h_stat"], h, rel_tol=1e-6,
                            abs_tol=1e-4)
        assert math.isclose(got[s]["h_tied"], h / corr, rel_tol=1e-6,
                            abs_tol=1e-4)
        assert got[s]["h_tied"] >= got[s]["h_stat"]  # ties inflate H


def test_cmh_matches_numpy(spark):
    rng = np.random.RandomState(11)
    n = 2000
    st = rng.randint(0, 5, n)
    ex = rng.rand(n) < 0.5
    # exposure doubles the outcome odds uniformly across strata
    base = 0.2 + 0.08 * st
    p = np.where(ex, base * 1.8, base)
    out = rng.rand(n) < p
    pdf = pd.DataFrame({"st": st.astype("int32"), "ex": ex, "out": out})
    import pyspark.sql.functions as F
    res = cmh_test(spark.createDataFrame(pdf), "st",
                   F.col("ex"), F.col("out")).collect()
    num = den = sa = sea = sva = 0.0
    for s in np.unique(st):
        m = st == s
        a = float((ex & out & m).sum())
        b = float((ex & ~out & m).sum())
        c = float((~ex & out & m).sum())
        d = float((~ex & ~out & m).sum())
        nn = a + b + c + d
        num += a * d / nn
        den += b * c / nn
        sa += a
        sea += (a + b) * (a + c) / nn
        sva += (a + b) * (c + d) * (a + c) * (b + d) / (nn * nn * (nn - 1))
    or_mh = num / den
    chi2 = (sa - sea) ** 2 / sva
    for row in res:
        assert math.isclose(row["or_mh"], or_mh, rel_tol=1e-4)
        assert math.isclose(row["cmh_chi2"], chi2, rel_tol=1e-3)
    assert or_mh > 1.3  # the planted effect survives pooling


def test_tost_equivalent_and_not(spark):
    rng = np.random.RandomState(5)
    n = 4000
    # seg "same": identical arms -> equivalent at margin 1.0
    # seg "far":  arms differ by 3 -> NOT equivalent
    pdf = pd.DataFrame({
        "seg": ["same"] * n + ["far"] * n,
        "arm": (["a", "b"] * (n // 2)) * 2,
        "val": np.concatenate([
            np.round(rng.normal(10, 2, n), 3),
            np.round(rng.normal(10, 2, n), 3)
            + np.where(np.arange(n) % 2 == 0, 3.0, 0.0),
        ]),
    })
    res = {r["seg"]: r.asDict()
           for r in tost_equiv(spark.createDataFrame(pdf), "seg", "val",
                               "arm", "a", "b", 1.0).collect()}
    assert res["same"]["equivalent"] is True
    assert res["same"]["p_tost"] < 0.05
    assert res["far"]["equivalent"] is False
    assert res["far"]["p_tost"] > 0.95
    # welch-consistency: diff recovered
    assert math.isclose(res["far"]["diff"], 3.0, abs_tol=0.25)
