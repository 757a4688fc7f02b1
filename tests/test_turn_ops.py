"""lag_autocorr, dialogue_flags, relevance_context."""

import numpy as np
from pyspark.sql import functions as F

from hipipe_spark.functions.text import dialogue_flags
from hipipe_spark.operators.features import lag_autocorr
from hipipe_spark.operators.transcripts import relevance_context


def test_lag_autocorr_matches_numpy(transcripts, transcripts_pdf):
    t = transcripts.withColumn("v", F.length("text").cast("double"))
    out = lag_autocorr(t, "v", lag=1).toPandas().set_index("conv_id")
    pdf = transcripts_pdf.copy()
    pdf["v"] = pdf["text"].str.len().astype(float)
    for conv, g in pdf.sort_values(["ts", "turn_idx"]).groupby("conv_id"):
        x = g["v"].to_numpy()
        if len(x) < 2:
            continue
        a, b = x[1:], x[:-1]
        r = out.loc[conv]
        assert r["n_pairs"] == len(a)
        if np.std(a) > 0 and np.std(b) > 0 and len(a) >= 2:
            ref = np.corrcoef(a, b)[0, 1]
            assert abs(r["autocorr"] - ref) < 1e-4


def test_lag_autocorr_degenerate(spark):
    # constant series: zero variance -> NaN from Spark's corr
    df = spark.createDataFrame(
        [("c", i, float(i), 5.0) for i in range(6)],
        "conv_id string, turn_idx int, es double, v double"
    ).selectExpr("conv_id", "turn_idx",
                 "timestamp_seconds(es) AS ts", "v")
    out = lag_autocorr(df, "v", lag=1).toPandas().iloc[0]
    assert out["n_pairs"] == 5
    assert np.isnan(out["autocorr"]) or out["autocorr"] is None


def test_dialogue_flags(spark):
    rows = [
        ("is it up?",),
        ("run this:\n```py\nx=1\n```",),
        ("see https://a.b/c for docs",),
        ("done.",),
        ("plain text no ending",),
        ("  trailing spaces ?  ",),
    ]
    df = spark.createDataFrame(rows, "text string")
    flags = dialogue_flags(F.col("text"))
    out = df.select(*[c.alias(n) for n, c in flags.items()]).toPandas()
    assert list(out["is_question"]) == [1, 0, 0, 0, 0, 1]
    assert list(out["has_code"]) == [0, 1, 0, 0, 0, 0]
    assert list(out["has_url"]) == [0, 0, 1, 0, 0, 0]
    assert list(out["n_lines"]) == [1, 4, 1, 1, 1, 1]
    assert list(out["ends_clean"]) == [1, 0, 0, 1, 0, 1]


def test_relevance_context_greedy(spark):
    # scores pick turns 3 (9.0), 1 (7.0), 4 (5.0), ...; budget cuts
    # after cumulative tokens exceed it
    rows = [
        ("c", 0, "a b", 1.0),          # 2 tokens, score 1
        ("c", 1, "c d e", 7.0),        # 3 tokens, score 7
        ("c", 2, "f", 2.0),            # 1 token,  score 2
        ("c", 3, "g h i j", 9.0),      # 4 tokens, score 9
        ("c", 4, "k l", 5.0),          # 2 tokens, score 5
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, score double")
    out = (relevance_context(df, "score", budget=9)
           .orderBy("turn_idx").toPandas())
    # selection order: t3 (4), t1 (7), t4 (9), t2 (10 > 9), t0
    assert list(out["kept"]) == [0, 1, 0, 1, 1]
    sel = out[out["kept"] == 1]
    assert sel["turn_tokens"].sum() <= 9


def test_relevance_context_tie_prefers_recent(spark):
    rows = [("c", 0, "a a", 1.0), ("c", 1, "b b", 1.0)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, score double")
    out = (relevance_context(df, "score", budget=2)
           .orderBy("turn_idx").toPandas())
    assert list(out["kept"]) == [0, 1]


def test_transcript_integrity(spark):
    from hipipe_spark.operators.transcripts import transcript_integrity
    rows = [
        # clean conversation
        ("a", 0, "user", 0.0), ("a", 1, "asst", 1.0), ("a", 2, "user", 2.0),
        # ts inversion at idx 2 + role repeat
        ("b", 0, "user", 0.0), ("b", 1, "user", 5.0), ("b", 2, "asst", 3.0),
        # duplicate idx 1, gap 1->4, starts at 1
        ("c", 1, "user", 0.0), ("c", 1, "asst", 1.0), ("c", 4, "user", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, es double"
    ).selectExpr("conv_id", "turn_idx", "role",
                 "timestamp_seconds(es) AS ts")
    out = (transcript_integrity(df).toPandas()
           .set_index("conv_id").sort_index())
    a, b, c = out.loc["a"], out.loc["b"], out.loc["c"]
    assert (a["n_dup_idx"], a["n_ts_inversions"], a["n_idx_gaps"],
            a["n_role_repeats"], a["first_idx"], a["is_clean"]) == \
        (0, 0, 0, 0, 0, 1)
    assert (b["n_ts_inversions"], b["n_role_repeats"], b["is_clean"]) == \
        (1, 1, 0)
    assert (c["n_dup_idx"], c["n_idx_gaps"], c["first_idx"],
            c["is_clean"]) == (1, 1, 1, 0)
