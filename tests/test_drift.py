"""PSI drift metric vs an independent numpy reference."""

import math

import numpy as np

from hipipe_spark.operators.drift import psi, psi_table


def _ref_psi(a_vals, b_vals, lo, hi, nb, smooth=0.5):
    w = (hi - lo) / nb

    def bucketize(vals):
        raw = np.floor((vals.astype(float) - lo) / w)
        return np.clip(raw, 0, nb - 1).astype(int)

    na = np.bincount(bucketize(a_vals), minlength=nb)
    nb_ = np.bincount(bucketize(b_vals), minlength=nb)
    pa = (na + smooth) / (na.sum() + smooth * nb)
    pb = (nb_ + smooth) / (nb_.sum() + smooth * nb)
    terms = (pa - pb) * np.log(pa / pb)
    return na, nb_, terms, terms.sum()


def test_psi_matches_numpy(transcripts, transcripts_pdf):
    import pyspark.sql.functions as F

    t = transcripts.withColumn("text_len", F.length("text").cast("int"))
    a = t.filter(F.col("role") == "user")
    b = t.filter(F.col("role") == "assistant")
    out = psi_table(a, b, "text_len", lo=0, hi=60, n_buckets=6) \
        .toPandas().sort_values("bucket").reset_index(drop=True)

    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len()
    na, nb_, terms, total = _ref_psi(
        pdf.loc[pdf.role == "user", "text_len"].to_numpy(),
        pdf.loc[pdf.role == "assistant", "text_len"].to_numpy(),
        lo=0, hi=60, nb=6)

    assert len(out) == 6
    assert (out["n_a"].to_numpy() == na).all()
    assert (out["n_b"].to_numpy() == nb_).all()
    assert np.allclose(out["psi_term"], terms)
    assert np.allclose(out["psi"], total)
    assert math.isclose(psi(a, b, "text_len", 0, 60, 6), total, rel_tol=1e-9)


def test_psi_identical_slices_near_zero(transcripts):
    import pyspark.sql.functions as F

    t = transcripts.withColumn("text_len", F.length("text").cast("int"))
    v = psi(t, t, "text_len", 0, 60, 6)
    assert abs(v) < 1e-12


def test_psi_empty_buckets_finite(spark):
    a = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    b = spark.createDataFrame([(99.0,), (98.0,)], "x double")
    out = psi_table(a, b, "x", lo=0, hi=100, n_buckets=10).toPandas()
    assert len(out) == 10
    assert np.isfinite(out["psi_term"]).all()
    assert (out["psi"] > 0).all()  # fully disjoint slices drift hard


def _ref_ks(a_vals, b_vals):
    vals = np.unique(np.concatenate([a_vals, b_vals]).astype(float))
    cdf_a = np.searchsorted(np.sort(a_vals.astype(float)), vals, "right") / len(a_vals)
    cdf_b = np.searchsorted(np.sort(b_vals.astype(float)), vals, "right") / len(b_vals)
    return float(np.max(np.abs(cdf_a - cdf_b)))


def test_ks_matches_numpy(transcripts, transcripts_pdf):
    import pyspark.sql.functions as F

    from hipipe_spark.operators.drift import ks, ks_table

    t = transcripts.withColumn("text_len", F.length("text").cast("int"))
    a = t.filter(F.col("role") == "user")
    b = t.filter(F.col("role") == "assistant")
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len()
    av = pdf.loc[pdf["role"] == "user", "text_len"].to_numpy()
    bv = pdf.loc[pdf["role"] == "assistant", "text_len"].to_numpy()

    got = ks(a, b, "text_len")
    assert abs(got - _ref_ks(av, bv)) < 1e-12

    tab = ks_table(a, b, "text_len").toPandas()
    assert len(tab) == len(np.unique(np.concatenate([av, bv])))
    assert np.allclose(tab["ks"], got)
    assert (tab["d"] <= got + 1e-15).all()


def test_ks_identical_and_disjoint(spark):
    from hipipe_spark.operators.drift import ks

    a = spark.range(100).selectExpr("id % 10 AS x")
    assert ks(a, a, "x") == 0.0
    b = spark.range(100).selectExpr("id % 10 + 100 AS x")
    assert ks(a, b, "x") == 1.0


def test_cramers_v_matches_pandas(transcripts, transcripts_pdf):
    from hipipe_spark.operators.drift import cramers_v_table

    import pyspark.sql.functions as F

    t = transcripts.withColumn("len_bin", F.length("text") % 3)
    out = cramers_v_table(t, "role", "len_bin").toPandas()

    pdf = transcripts_pdf.copy()
    pdf["len_bin"] = pdf["text"].str.len() % 3
    ct = pdf.groupby(["role", "len_bin"]).size().unstack(fill_value=0)
    n = ct.to_numpy().sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = ((ct.to_numpy() - e) ** 2 / e).sum()
    v = math.sqrt(chi2 / (n * (min(ct.shape) - 1)))

    assert np.allclose(out["chi2"].iloc[0], chi2)
    assert np.allclose(out["cramers_v"].iloc[0], v)
    assert len(out) == ct.size  # full R x C grid, zero cells included
    got = {(r["a"], r["b"]): r["n"] for _, r in out.iterrows()}
    for role in ct.index:
        for lb in ct.columns:
            assert got[(role, lb)] == ct.loc[role, lb]


def test_cramers_v_independent_and_perfect(spark):
    from hipipe_spark.operators.drift import cramers_v_table

    ind = spark.range(400).selectExpr("id % 2 AS a", "CAST(id / 2 AS INT) % 2 AS b")
    v = cramers_v_table(ind, "a", "b").select("cramers_v").first()[0]
    assert abs(v) < 1e-12
    perf = spark.range(400).selectExpr("id % 2 AS a", "id % 2 AS b")
    v2 = cramers_v_table(perf, "a", "b").select("cramers_v").first()[0]
    assert abs(v2 - 1.0) < 1e-12


def test_mutual_info_matches_numpy(transcripts, transcripts_pdf):
    import pyspark.sql.functions as F

    from hipipe_spark.operators.core import release_cached
    from hipipe_spark.operators.drift import mutual_info_table

    t = transcripts.withColumn("len_bin", F.length("text") % 3)
    res = mutual_info_table(t, "role", "len_bin")
    out = res.toPandas()
    release_cached(res)

    pdf = transcripts_pdf.copy()
    pdf["len_bin"] = pdf["text"].str.len() % 3
    ct = pdf.groupby(["role", "len_bin"]).size().unstack(fill_value=0)
    p = ct.to_numpy() / ct.to_numpy().sum()
    pa, pb = p.sum(axis=1), p.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(p > 0, p * np.log(p / np.outer(pa, pb)), 0.0)
    mi = terms.sum()
    h_a = -(pa * np.log(pa)).sum()
    h_b = -(pb * np.log(pb)).sum()

    assert np.allclose(out["mi"].iloc[0], mi)
    assert np.allclose(out["h_a"].iloc[0], h_a)
    assert np.allclose(out["h_b"].iloc[0], h_b)
    assert np.allclose(out["nmi"].iloc[0], mi / math.sqrt(h_a * h_b))
    assert len(out) == (ct.to_numpy() > 0).sum()  # observed cells only


def test_mutual_info_independent_and_identical(spark):
    from hipipe_spark.operators.core import release_cached
    from hipipe_spark.operators.drift import mutual_info_table

    ind = spark.range(400).selectExpr("id % 2 AS a", "CAST(id / 2 AS INT) % 2 AS b")
    r1 = mutual_info_table(ind, "a", "b")
    row = r1.select("mi", "nmi").first()
    release_cached(r1)
    assert abs(row["mi"]) < 1e-12 and abs(row["nmi"]) < 1e-12

    same = spark.range(400).selectExpr("id % 4 AS a", "id % 4 AS b")
    r2 = mutual_info_table(same, "a", "b")
    row2 = r2.select("mi", "h_a", "nmi").first()
    release_cached(r2)
    assert abs(row2["mi"] - row2["h_a"]) < 1e-12  # identical cols: MI = H
    assert abs(row2["nmi"] - 1.0) < 1e-12


def test_wasserstein_known_shift(spark):
    from hipipe_spark.operators.drift import wasserstein_table
    # identical uniform supports shifted by exactly 3.0 → W1 = 3.0
    a = spark.createDataFrame([(float(i),) for i in range(100)],
                              "v: double")
    b = spark.createDataFrame([(float(i) + 3.0,) for i in range(100)],
                              "v: double")
    r = wasserstein_table(a, b, "v").collect()[0]
    assert abs(r.w1 - 3.0) < 1e-6
    assert r.n_a == 100 and r.n_b == 100
    # W1 of a distribution against itself is 0
    z = wasserstein_table(a, a, "v").collect()[0]
    assert z.w1 == 0.0
