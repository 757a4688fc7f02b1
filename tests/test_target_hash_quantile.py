"""target encoding (global + OOF), feature hashing, rolling quantile."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from hipipe_spark.operators.encoders import (
    apply_target_encode, fit_target_encode, hash_features,
    target_encode_oof)
from hipipe_spark.operators.temporal import rolling_quantile

_A, _C, _M = 1103515245, 12345, 2147483648


def _lcg(x: int, seed: int = 0) -> int:
    x = (x + seed) % _M
    x = (x * _A + _C) % _M
    x = (x * _A + _C) % _M
    return x


def _str_hash(s: str, seed: int = 0) -> int:
    base = seed % _M
    for ch in s:
        base = (base * 31 + ord(ch)) % _M
    return _lcg(base)


def test_fit_apply_target_encode(spark):
    fit = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0)],
        "cat string, y int")
    enc = fit_target_encode(fit, "cat", "y", smoothing=2.0)
    prior = 2 / 5
    rows = {r["value"]: r["te"] for r in enc.collect()}
    assert abs(rows["a"] - (2 + 2 * prior) / (3 + 2)) < 1e-12
    assert abs(rows["b"] - (0 + 2 * prior) / (2 + 2)) < 1e-12
    # unseen category encodes to the prior
    df = spark.createDataFrame([("a",), ("zz",), (None,)], "cat string")
    out = {r["cat"]: r["cat__te"] for r in
           apply_target_encode(df, enc, "cat").collect()}
    assert abs(out["zz"] - prior) < 1e-12
    assert abs(out[None] - prior) < 1e-12
    assert abs(out["a"] - rows["a"]) < 1e-12


def test_target_encode_oof_matches_python(transcripts, transcripts_pdf):
    t = transcripts.select(
        "conv_id", "turn_idx", "role",
        (F.col("turn_idx") % 3 == 0).cast("int").alias("y"))
    out = target_encode_oof(t, "role", "y", key="turn_idx",
                            n_folds=3, smoothing=5.0, seed=11).toPandas()
    pdf = transcripts_pdf[["conv_id", "turn_idx", "role"]].copy()
    pdf["y"] = (pdf["turn_idx"] % 3 == 0).astype(int)
    pdf["fold"] = pdf["turn_idx"].map(lambda k: _lcg(int(k), 11) % 3)
    cell = pdf.groupby(["role", "fold"])["y"].agg(["sum", "count"])
    cat = pdf.groupby("role")["y"].agg(["sum", "count"])
    ftot = pdf.groupby("fold")["y"].agg(["sum", "count"])
    ts_, tn = pdf["y"].sum(), len(pdf)
    m = 5.0

    def ref(row):
        c, f = row["role"], row["fold"]
        s, n = cell.loc[(c, f)]
        cs, cn = cat.loc[c]
        fs, fn = ftot.loc[f]
        prior = (ts_ - fs) / (tn - fn)
        return (cs - s + m * prior) / (cn - n + m)

    pdf["te_ref"] = pdf.apply(ref, axis=1)
    j = out.merge(pdf, on=["conv_id", "turn_idx"], suffixes=("", "_p"))
    assert len(j) == len(pdf)
    assert (j["role__fold"] == j["fold"]).all()
    assert np.allclose(j["role__te"], j["te_ref"])


def test_target_encode_oof_never_sees_own_label(spark):
    # one category, 2 folds: each row's encoding uses ONLY the other fold
    df = spark.createDataFrame(
        [(i, "c", 1 if i % 2 == 0 else 0) for i in range(40)],
        "k long, cat string, y int")
    out = target_encode_oof(df, "cat", "y", key="k", n_folds=2,
                            smoothing=0.0, seed=0).toPandas()
    for f in out["cat__fold"].unique():
        other = out[out["cat__fold"] != f]
        mine = out[out["cat__fold"] == f]["cat__te"].iloc[0]
        assert abs(mine - other["y"].mean()) < 1e-12


def test_hash_features_matches_python(spark):
    df = spark.createDataFrame(
        [("en", "web"), ("fr", None), (None, "book")],
        "lang string, source string")
    out = hash_features(df, ["lang", "source", ("lang", "source")],
                        n_buckets=32, seed=7).toPandas()
    for _, r in out.iterrows():
        lang = r["lang"] if r["lang"] is not None else "<NULL>"
        src = r["source"] if r["source"] is not None else "<NULL>"
        hs = [_str_hash(f"lang={lang}", 7),
              _str_hash(f"source={src}", 7),
              _str_hash(f"langxsource={lang}\x1f{src}", 7)]
        ref: dict[int, float] = {}
        for h in hs:
            b, s = h % 32, 1.0 - 2.0 * ((h // 32) % 2)
            ref[b] = ref.get(b, 0.0) + s
        assert list(r["fh_idx"]) == sorted(ref)
        assert np.allclose(list(r["fh_val"]),
                           [ref[b] for b in sorted(ref)])


def test_hash_features_same_row_collisions_add(spark):
    # 1 bucket: all three features collide; values sum signed
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    out = hash_features(df, ["x", "y", ("x", "y")],
                        n_buckets=1, seed=0).toPandas().iloc[0]
    assert list(out["fh_idx"]) == [0]
    assert abs(abs(out["fh_val"][0]) % 1.0) < 1e-12  # integer sum of ±1


def test_rolling_quantile_matches_pandas(transcripts, transcripts_pdf):
    t = transcripts.withColumn(
        "v", F.when(F.col("turn_idx") % 4 != 1,
                    F.length("text").cast("double")))
    out = rolling_quantile(t, "v", q=0.5, n=3).toPandas()
    pdf = transcripts_pdf.copy()
    pdf["v"] = np.where(pdf["turn_idx"] % 4 != 1,
                        pdf["text"].str.len().astype(float), np.nan)
    pdf = pdf.sort_values(["conv_id", "ts", "turn_idx"])
    ref = (pdf.groupby("conv_id")["v"]
           .rolling(3, min_periods=1).median()
           .reset_index(level=0, drop=True))
    j = out.sort_values(["conv_id", "ts", "turn_idx"])
    got = pd.Series(j["roll_q"].to_numpy(), index=pdf.index)
    both = pd.DataFrame({"got": got, "ref": ref})
    assert both["got"].isna().equals(both["ref"].isna())
    ok = ~both["ref"].isna()
    assert np.allclose(both.loc[ok, "got"], both.loc[ok, "ref"])


def test_rolling_quantile_interpolation(spark):
    df = spark.createDataFrame(
        [("c", 1, 10.0), ("c", 2, 20.0), ("c", 3, 5.0), ("c", 4, 7.0)],
        "conv_id string, turn_idx int, v double").withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
              + F.make_interval(secs=F.col("turn_idx")))
    out = (rolling_quantile(df, "v", q=0.25, n=3)
           .orderBy("turn_idx").toPandas())
    # numpy linear rule over each trailing window of ≤3
    refs = [np.quantile([10.0], 0.25),
            np.quantile([10.0, 20.0], 0.25),
            np.quantile([10.0, 20.0, 5.0], 0.25),
            np.quantile([20.0, 5.0, 7.0], 0.25)]
    assert np.allclose(out["roll_q"], refs)
