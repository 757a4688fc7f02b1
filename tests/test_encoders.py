"""Ordered target encoding + fit/apply standardizer vs pandas refs,
with explicit leakage pins."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from hipipe_spark.operators.encoders import (
    TargetEncode, apply_standardizer, fit_standardizer,
)

KEYS = ["conv_id", "turn_idx"]


def _with_len(transcripts):
    return transcripts.withColumn("text_len", F.length("text").cast("int"))


def test_target_encode_matches_pandas(transcripts, transcripts_pdf):
    out = TargetEncode("role", "text_len", prior=25.0, prior_weight=10.0)(
        _with_len(transcripts)).toPandas()
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len()
    pdf = pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    rows = []
    for (_, _), g in pdf.groupby(["conv_id", "role"], sort=False):
        s = n = 0.0
        for i in range(len(g)):
            te = (s + 10.0 * 25.0) / (n + 10.0)
            rows.append((g["conv_id"].iloc[i], int(g["turn_idx"].iloc[i]), te))
            s += float(g["text_len"].iloc[i])
            n += 1.0
    ref = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ref"])
    m = out.merge(ref, on=KEYS, validate="1:1")
    assert len(m) == len(out)
    assert np.allclose(m["role_te"], m["ref"])


def test_target_encode_first_occurrence_is_prior(transcripts):
    out = TargetEncode("role", "text_len", prior=25.0)(
        _with_len(transcripts))
    w = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window
        .partitionBy("conv_id", "role").orderBy("ts", "turn_idx"))
    firsts = out.withColumn("rn", w).filter(F.col("rn") == 1)
    vals = [r["role_te"] for r in firsts.select("role_te").collect()]
    assert all(abs(v - 25.0) < 1e-12 for v in vals)  # no past -> pure prior


def test_standardizer_fit_on_train_only(transcripts, transcripts_pdf):
    from hipipe_spark.operators.sampling import group_split

    t = group_split(_with_len(transcripts), "conv_id", seed=5)
    train = t.filter(F.col("split") == "train")
    stats = fit_standardizer(train, ["text_len"])
    out = apply_standardizer(t, stats, ["text_len"]).toPandas()

    tp = out[["conv_id", "split"]].drop_duplicates()
    pdf = out.copy()
    tr = pdf[pdf["split"] == "train"]
    m, s = tr["text_len"].mean(), tr["text_len"].std(ddof=1)
    assert np.allclose(pdf["text_len_z"], (pdf["text_len"] - m) / s)
    assert set(tp["split"]) >= {"train"}  # split column survived


def test_standardizer_grouped_and_constant(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)], "g string, x double")
    stats = fit_standardizer(df, ["x"], by="g")
    out = {(r["g"], r["x"]): r["x_z"]
           for r in apply_standardizer(df, stats, ["x"], by="g").collect()}
    assert abs(out[("a", 1.0)] + 0.7071067811865475) < 1e-12
    assert out[("b", 5.0)] is None  # zero-variance group -> null, not inf


def test_fit_apply_buckets_matches_numpy(transcripts):
    from hipipe_spark.operators.encoders import apply_buckets, fit_buckets

    t = _with_len(transcripts)
    bounds = fit_buckets(t, ["text_len"], n_buckets=4, exact=True)
    out = apply_buckets(t, bounds, ["text_len"]).toPandas()

    xs = np.array(sorted(out["text_len"].astype(float)))
    edges = [np.percentile(xs, 100 * p, method="linear")
             for p in (0.25, 0.5, 0.75)]
    ref = out["text_len"].astype(float).map(
        lambda x: int(sum(b <= x for b in edges)))
    assert (out["text_len_bin"] == ref).all()
    assert set(out["text_len_bin"]) == {0, 1, 2, 3}


def test_apply_buckets_null_and_boundary(spark):
    from hipipe_spark.operators.encoders import apply_buckets, fit_buckets

    df = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 20.0), (4, 30.0), (5, None)],
        "id int, x double")
    bounds = fit_buckets(df, ["x"], n_buckets=2, exact=True)  # median = 15
    out = {r["id"]: r["x_bin"]
           for r in apply_buckets(df, bounds, ["x"]).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: None}

    # a value exactly on the boundary takes the upper bin
    df2 = spark.createDataFrame([(1, 0.0), (2, 15.0)], "id int, x double")
    out2 = {r["id"]: r["x_bin"]
            for r in apply_buckets(df2, bounds, ["x"]).collect()}
    assert out2 == {1: 0, 2: 1}


def test_fit_buckets_approx_close_to_exact(transcripts):
    from hipipe_spark.operators.encoders import fit_buckets

    t = _with_len(transcripts)
    ex = fit_buckets(t, ["text_len"], n_buckets=4, exact=True).collect()[0][0]
    ap = fit_buckets(t, ["text_len"], n_buckets=4).collect()[0][0]
    assert len(ap) == 3
    assert all(abs(a - e) <= 2.0 for a, e in zip(ap, ex))


def test_robust_scaler_matches_numpy(transcripts):
    from hipipe_spark.operators.encoders import (
        apply_robust_scaler, fit_robust_scaler)

    t = _with_len(transcripts)
    stats = fit_robust_scaler(t, ["text_len"], exact=True)
    out = apply_robust_scaler(t, stats, ["text_len"]).toPandas()

    xs = out["text_len"].astype(float).to_numpy()
    q25, med, q75 = (np.percentile(xs, q, method="linear")
                     for q in (25, 50, 75))
    ref = (xs - med) / (q75 - q25)
    assert np.allclose(out["text_len_r"], ref)


def test_robust_scaler_zero_iqr_is_null(spark):
    from hipipe_spark.operators.encoders import (
        apply_robust_scaler, fit_robust_scaler)

    df = spark.createDataFrame([(i, 7.0) for i in range(10)], "id int, x double")
    stats = fit_robust_scaler(df, ["x"], exact=True)
    out = apply_robust_scaler(df, stats, ["x"]).select("x_r").collect()
    assert all(r["x_r"] is None for r in out)


def test_robust_scaler_outlier_resistance(spark):
    from hipipe_spark.operators.encoders import (
        apply_robust_scaler, fit_robust_scaler, fit_standardizer)

    base = [(i, float(i % 10)) for i in range(100)]
    clean = spark.createDataFrame(base, "id int, x double")
    dirty = spark.createDataFrame(base + [(999, 1e9)], "id int, x double")
    med_c, iqr_c = fit_robust_scaler(clean, ["x"], exact=True).collect()[0]
    med_d, iqr_d = fit_robust_scaler(dirty, ["x"], exact=True).collect()[0]
    assert abs(med_c - med_d) <= 0.5 and abs(iqr_c - iqr_d) <= 0.5
    std_c = fit_standardizer(clean, ["x"]).collect()[0]["x__std"]
    std_d = fit_standardizer(dirty, ["x"]).collect()[0]["x__std"]
    assert std_d > 100 * std_c  # the mean/std fit blew up; the robust one didn't


def test_winsorize_matches_numpy(transcripts):
    from hipipe_spark.operators.encoders import apply_clip, fit_clip

    t = _with_len(transcripts)
    stats = fit_clip(t, ["text_len"], lo_p=0.05, hi_p=0.95, exact=True)
    out = apply_clip(t, stats, ["text_len"]).toPandas()

    xs = out["text_len"].astype(float).to_numpy()
    lo = np.percentile(xs, 5, method="linear")
    hi = np.percentile(xs, 95, method="linear")
    assert np.allclose(out["text_len_clip"], np.clip(xs, lo, hi))
    assert out["text_len_clip"].min() == lo
    assert out["text_len_clip"].max() == hi


def test_winsorize_null_stays_null(spark):
    from hipipe_spark.operators.encoders import apply_clip, fit_clip

    df = spark.createDataFrame(
        [(1, 0.0), (2, 50.0), (3, 100.0), (4, None)], "id int, x double")
    stats = fit_clip(df, ["x"], lo_p=0.25, hi_p=0.75, exact=True)
    out = {r["id"]: r["x_clip"] for r in apply_clip(df, stats, ["x"]).collect()}
    assert out[4] is None
    assert out[1] == 25.0 and out[3] == 75.0 and out[2] == 50.0


def test_frequency_encoder(spark):
    from hipipe_spark.operators.encoders import (
        apply_frequency_encoder, fit_frequency_encoder)

    fit = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, None)],
        "id int, cat string")
    freqs = fit_frequency_encoder(fit, "cat")
    # frequencies over non-null fit rows: a=3/4, b=1/4
    fmap = {r["cat"]: r["cat__freq"] for r in freqs.collect()}
    assert fmap == {"a": 0.75, "b": 0.25}

    apply = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zzz"), (4, None)], "id int, cat string")
    out = {r["id"]: r["cat_freq"]
           for r in apply_frequency_encoder(apply, freqs, "cat").collect()}
    # unseen and null encode 0.0, not NULL
    assert out == {1: 0.75, 2: 0.25, 3: 0.0, 4: 0.0}

    # min_count drops the tail from the map -> encodes like unseen
    freqs2 = fit_frequency_encoder(fit, "cat", min_count=2)
    out2 = {r["id"]: r["cat_freq"]
            for r in apply_frequency_encoder(apply, freqs2, "cat").collect()}
    assert out2[2] == 0.0 and out2[1] == 0.75


def test_collapse_rare(spark):
    from hipipe_spark.operators.encoders import collapse_rare

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "en"), (4, "de"), (5, "de"),
         (6, "tlh"), (7, None)],
        "id int, lang string")
    out = {r["id"]: r["lang_c"]
           for r in collapse_rare(df, "lang", min_count=2).collect()}
    assert out[1] == "en" and out[4] == "de"
    assert out[6] == "__other__" and out[7] == "__other__"

    # fit/apply split: vocabulary frozen on the fit frame
    fit = df.filter(F.col("id") <= 3)  # only "en" is frequent there
    out2 = {r["id"]: r["lang_c"]
            for r in collapse_rare(df, "lang", min_count=2,
                                   fit_df=fit).collect()}
    assert out2[1] == "en"
    assert out2[4] == "__other__"  # frequent overall, unseen in fit


def test_onehot(spark):
    from hipipe_spark.operators.encoders import apply_onehot, fit_onehot

    fit = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c"),
         (7, None)],
        "id int, cat string")
    vocab = fit_onehot(fit, "cat", min_count=2)
    pos = {r["cat"]: r["cat__pos"] for r in vocab.collect()}
    # count-desc, value-asc: a(3) -> 0, b(2) -> 1; c(1) dropped
    assert pos == {"a": 0, "b": 1}

    apply = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "zz"), (5, None)],
        "id int, cat string")
    out = {r["id"]: (r["cat_idx"], r["cat_vec"])
           for r in apply_onehot(apply, vocab, "cat", dense=True).collect()}
    assert out[1] == (0, [1, 0])
    assert out[2] == (1, [0, 1])
    assert out[3] == (-1, [0, 0])   # below min_count in fit
    assert out[4] == (-1, [0, 0])   # never seen
    assert out[5] == (-1, [0, 0])   # null


def test_onehot_max_categories_and_empty(spark):
    from hipipe_spark.operators.encoders import apply_onehot, fit_onehot

    fit = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id int, cat string")
    vocab = fit_onehot(fit, "cat", max_categories=2)
    # a(2) -> 0, then ties b/c(1 each) broken by value: b -> 1, c clipped
    assert {r["cat"]: r["cat__pos"] for r in vocab.collect()} == \
        {"a": 0, "b": 1}

    empty_vocab = fit_onehot(fit, "cat", min_count=99)
    out = apply_onehot(fit, empty_vocab, "cat", dense=True).collect()
    assert all(r["cat_idx"] == -1 and r["cat_vec"] == [] for r in out)


def test_woe(spark):
    import math

    from hipipe_spark.operators.encoders import apply_woe, fit_woe

    # cat a: 3 pos / 1 neg; cat b: 1 pos / 3 neg; totals 4 pos, 4 neg
    rows = [("a", 1)] * 3 + [("a", 0)] + [("b", 1)] + [("b", 0)] * 3
    fit = spark.createDataFrame(
        [(i, c, y) for i, (c, y) in enumerate(rows)],
        "id int, cat string, y int")
    woe = fit_woe(fit, "cat", "y", smoothing=0.5)
    got = {r["cat"]: r for r in woe.collect()}
    pp_a, pn_a = 3.5 / 5.0, 1.5 / 5.0
    assert abs(got["a"]["cat__woe"] - round(math.log(pp_a / pn_a), 6)) < 1e-9
    assert abs(got["a"]["cat__iv"]
               - round((pp_a - pn_a) * math.log(pp_a / pn_a), 6)) < 1e-9
    # symmetric classes -> symmetric woe
    assert abs(got["a"]["cat__woe"] + got["b"]["cat__woe"]) < 1e-6

    apply = spark.createDataFrame(
        [(1, "a"), (2, "zz"), (3, None)], "id int, cat string")
    out = {r["id"]: r["cat_woe"]
           for r in apply_woe(apply, woe, "cat").collect()}
    assert abs(out[1] - got["a"]["cat__woe"]) < 1e-9
    assert out[2] == 0.0 and out[3] == 0.0
