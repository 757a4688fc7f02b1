"""group_znorm / turn_similarity / feature_corr vs pandas-numpy refs."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from hipipe_spark.operators.encoders import group_znorm
from hipipe_spark.operators.features import feature_corr, turn_similarity

KEYS = ["conv_id", "turn_idx"]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_group_znorm_matches_pandas(transcripts, transcripts_pdf):
    t = transcripts.withColumn("text_len", F.length("text").cast("double"))
    out = group_znorm(t, "text_len", by="conv_id").toPandas()
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype(float)
    g = pdf.groupby("conv_id")["text_len"]
    m, sd = g.transform("mean"), g.transform("std")
    ref = np.where(sd > 0, ((pdf["text_len"] - m) / sd).round(6), 0.0)
    pdf["ref"] = ref
    j = out.merge(pdf[KEYS + ["ref"]], on=KEYS, validate="1:1")
    assert len(j) == len(out)
    assert np.allclose(j["text_len_z"], j["ref"])


def test_group_znorm_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("a", 0, 5.0), ("a", 1, 5.0), ("b", 0, 3.0)],
        "conv_id string, turn_idx int, x double")
    out = {(r["conv_id"], r["turn_idx"]): r["x_z"]
           for r in group_znorm(df, "x", by="conv_id").collect()}
    # constant group and singleton group both emit the neutral 0.0
    assert out[("a", 0)] == 0.0 and out[("a", 1)] == 0.0
    assert out[("b", 0)] == 0.0


def test_turn_similarity_matches_python(transcripts, transcripts_pdf):
    out = turn_similarity(transcripts, cap=64).toPandas()
    pdf = transcripts_pdf.copy()
    pdf["tx"] = pdf["text"].str.slice(0, 64)
    pdf = pdf.sort_values(["conv_id", "ts", "turn_idx"])
    pdf["pv"] = pdf.groupby("conv_id")["tx"].shift(1)
    pdf["pvr"] = pdf.groupby(["conv_id", "role"])["tx"].shift(1)

    def sim(row, prev_col):
        p = row[prev_col]
        if not isinstance(p, str):
            return (None, None)
        d = _lev(row["tx"], p)
        return (d, round(1.0 - d / max(len(row["tx"]), len(p), 1), 6))

    ref = pdf.apply(lambda r: sim(r, "pv") + sim(r, "pvr"),
                    axis=1, result_type="expand")
    ref.columns = ["r_lev", "r_sim", "r_lev_role", "r_sim_role"]
    pdf = pd.concat([pdf, ref], axis=1)
    j = out.merge(pdf[KEYS + list(ref.columns)], on=KEYS, validate="1:1")
    assert len(j) == len(out)
    for a, b in [("lev_prev", "r_lev"), ("sim_prev", "r_sim"),
                 ("lev_prev_role", "r_lev_role"),
                 ("sim_prev_role", "r_sim_role")]:
        assert j[a].isna().equals(j[b].isna())
        mask = j[a].notna()
        assert np.allclose(j.loc[mask, a].astype(float),
                           j.loc[mask, b].astype(float))


def test_turn_similarity_identical_and_cap(spark):
    rows = [("c", 0, "u", "xyz" * 100, 1.0),
            ("c", 1, "u", "xyz" * 100, 2.0),   # identical after cap
            ("c", 2, "u", "abc", 3.0)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, "
              "text string, ts double")
    out = {r["turn_idx"]: r for r in
           turn_similarity(df, cap=16, order_cols=("ts",)).collect()}
    assert out[0]["lev_prev"] is None
    assert out[1]["lev_prev"] == 0 and out[1]["sim_prev"] == 1.0
    # cap=16 bounds the distance even though raw texts are 300 chars
    assert out[2]["lev_prev"] <= 16


def test_feature_corr_matches_numpy(transcripts, transcripts_pdf):
    t = transcripts.select(
        F.length("text").cast("double").alias("a"),
        (F.length("text") * 2 + F.col("turn_idx")).cast("double").alias("b"),
        F.col("turn_idx").cast("double").alias("c"))
    out = feature_corr(t, ["a", "b", "c"]).toPandas()
    pdf = transcripts_pdf.copy()
    fa = pdf["text"].str.len().astype(float)
    fc = pdf["turn_idx"].astype(float)
    fb = fa * 2 + fc
    ref = {("a", "b"): np.corrcoef(fa, fb)[0, 1],
           ("a", "c"): np.corrcoef(fa, fc)[0, 1],
           ("b", "c"): np.corrcoef(fb, fc)[0, 1]}
    assert len(out) == 3
    for _, r in out.iterrows():
        assert r["n_pairs"] == len(pdf)
        assert abs(r["corr"] - ref[(r["col_a"], r["col_b"])]) < 1e-5


def test_feature_corr_constant_and_null(spark):
    df = spark.createDataFrame(
        [(1.0, 7.0, 1.0), (2.0, 7.0, None), (3.0, 7.0, 6.0)],
        "a double, k double, c double")
    out = {(r["col_a"], r["col_b"]): r
           for r in feature_corr(df, ["a", "k", "c"]).collect()}
    # zero-variance column -> null corr (no ANSI divide-by-zero throw)
    assert out[("a", "k")]["corr"] is None
    assert out[("a", "k")]["n_pairs"] == 3
    # null rows drop from the pair count
    assert out[("a", "c")]["n_pairs"] == 2
    assert out[("a", "c")]["corr"] == 1.0
