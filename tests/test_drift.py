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
