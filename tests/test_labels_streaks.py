"""future_window_label strict-futurity pins + role_streak islands."""

import numpy as np
from pyspark.sql import functions as F

from hipipe_spark.operators.features import future_window_label, role_streak


def test_future_label_matches_python(transcripts, transcripts_pdf):
    t = transcripts.withColumn("v", F.length("text").cast("double"))
    out = future_window_label(t, horizon_s=600.0, value="v").toPandas()
    pdf = transcripts_pdf.copy()
    pdf["es"] = pdf["ts"].astype("int64") / 1e9
    pdf["v"] = pdf["text"].str.len().astype(float)
    ref_c, ref_s = {}, {}
    for _, g in pdf.groupby("conv_id"):
        es = g["es"].to_numpy()
        v = g["v"].to_numpy()
        for i in range(len(g)):
            m = (es > es[i]) & (es <= es[i] + 600.0)
            k = (g["conv_id"].iloc[i], int(g["turn_idx"].iloc[i]))
            ref_c[k] = int(m.sum())
            ref_s[k] = round(float(v[m].sum()), 6) if m.any() else 0.0
    for _, r in out.iterrows():
        k = (r["conv_id"], int(r["turn_idx"]))
        assert r["label_future_count"] == ref_c[k]
        assert abs(r["label_future_sum"] - ref_s[k]) < 1e-5


def test_future_label_ties_not_future(spark):
    rows = [("c", 0, "2024-01-01 00:00:00", 1.0),
            ("c", 1, "2024-01-01 00:00:00", 2.0),   # same ts tie
            ("c", 2, "2024-01-01 00:05:00", 4.0),
            ("c", 3, "2024-01-01 00:20:00", 8.0)]   # beyond horizon
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["turn_idx"]: r for r in
           future_window_label(df, horizon_s=600.0, value="v").collect()}
    # ties at the row's own ts never count as future
    assert out[0]["label_future_count"] == 1
    assert out[0]["label_future_sum"] == 4.0
    assert out[1]["label_future_count"] == 1
    # last row within any horizon: zero future, sum 0.0 by contract
    assert out[3]["label_future_count"] == 0
    assert out[3]["label_future_sum"] == 0.0


def test_role_streak_islands(spark):
    seq = ["u", "u", "a", "u", "u", "u", "a", "a"]
    rows = [("c", i, r, float(i)) for i, r in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts double")
    out = role_streak(df, order_cols=("ts",)).orderBy("turn_idx").collect()
    assert [r["role_streak"] for r in out] == [1, 2, 1, 1, 2, 3, 1, 2]
    assert [r["role_island"] for r in out] == [0, 0, 1, 2, 2, 2, 3, 3]


def test_role_streak_matches_python(transcripts, transcripts_pdf):
    out = role_streak(transcripts).toPandas()
    pdf = transcripts_pdf.sort_values(["conv_id", "ts", "turn_idx"])
    ref = {}
    for _, g in pdf.groupby("conv_id"):
        streak = island = 0
        prev = object()
        for _, r in g.iterrows():
            if r["role"] == prev:
                streak += 1
            else:
                streak = 1
                island += 1
                prev = r["role"]
            ref[(r["conv_id"], int(r["turn_idx"]))] = (streak, island - 1)
    for _, r in out.iterrows():
        k = (r["conv_id"], int(r["turn_idx"]))
        assert (r["role_streak"], r["role_island"]) == ref[k]


def test_future_label_no_value_column(transcripts):
    out = future_window_label(transcripts, horizon_s=60.0)
    assert "label_future_count" in out.columns
    assert "label_future_sum" not in out.columns
    assert out.count() == transcripts.count()
