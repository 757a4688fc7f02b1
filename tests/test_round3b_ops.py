"""Round-3b operators: asof_interpolate, PriorSessionStats,
transition_matrix, salted_join, time_grid_resample."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.asof import asof_interpolate, asof_join
from hipipe_spark.operators.joins import salted_join
from hipipe_spark.operators.temporal import (
    PriorSessionStats,
    Sessionize,
    time_grid_resample,
    transition_matrix,
)
from hipipe_spark.reference_impl import sessionize as ref_sessionize


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def interp_sides(spark):
    left = spark.createDataFrame(
        [("u1", _ts("2026-01-01 10:00:00"), 1),
         ("u1", _ts("2026-01-01 10:30:00"), 2),
         ("u1", _ts("2026-01-01 11:00:00"), 3),   # exact hit
         ("u1", _ts("2026-01-01 12:30:00"), 4),   # after last right
         ("u2", _ts("2026-01-01 09:00:00"), 5),   # before first right
         ("u2", _ts("2026-01-01 10:45:00"), 6),
         ("u3", _ts("2026-01-01 10:00:00"), 7)],  # no right rows at all
        "user_id string, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2026-01-01 09:00:00"), 10.0),
         ("u1", _ts("2026-01-01 11:00:00"), 30.0),
         ("u1", _ts("2026-01-01 12:00:00"), 60.0),
         ("u2", _ts("2026-01-01 10:00:00"), 100.0),
         ("u2", _ts("2026-01-01 11:00:00"), 200.0)],
        "user_id string, ts timestamp, val double",
    )
    return left, right


def test_asof_interpolate_values(interp_sides):
    left, right = interp_sides
    out = asof_interpolate(left, right, on="ts", by="user_id").toPandas()
    got = dict(zip(out["event_id"], out["val_interp"]))
    assert got[1] == pytest.approx(20.0)      # midpoint 09:00→11:00
    assert got[2] == pytest.approx(25.0)      # 3/4 of the way
    assert got[3] == pytest.approx(30.0)      # exact hit
    assert got[4] == pytest.approx(60.0)      # hold last (no forward)
    assert got[5] == pytest.approx(100.0)     # hold first (no backward)
    assert got[6] == pytest.approx(175.0)     # 45/60 between 100 and 200
    assert np.isnan(got[7]) or got[7] is None  # u3: no right rows
    assert len(out) == left.count()


def test_asof_interpolate_tolerance(interp_sides):
    left, right = interp_sides
    out = asof_interpolate(left, right, on="ts", by="user_id",
                           tolerance_sec=1800).toPandas()
    got = dict(zip(out["event_id"], out["val_interp"]))
    # event 1 (10:00): backward 09:00 is 3600s away -> dropped; forward
    # 11:00 is 3600s away -> dropped; both out of tolerance -> null
    assert pd.isna(got[1])
    # event 2 (10:30): forward 11:00 within 1800 -> hold forward
    assert got[2] == pytest.approx(30.0)
    assert got[3] == pytest.approx(30.0)      # exact hit always in tol
    assert got[4] == pytest.approx(60.0)      # 12:30 vs 12:00 = 1800s, in
    # event 6 (10:45): backward 10:00 is 2700s away -> dropped; holds
    # the in-tolerance forward bracket (11:00 -> 200)
    assert got[6] == pytest.approx(200.0)


def test_asof_interpolate_matches_pandas_on_random(spark, transcripts_pdf):
    """Randomized cross-check: interpolate text_len over conversation
    ts against a pandas merge_asof-based reference."""
    pdf = transcripts_pdf[["conv_id", "turn_idx", "ts", "text"]].copy()
    pdf["text_len"] = pdf["text"].str.len().astype("float64")
    # left = odd turns, right = even turns (disjoint, same conv keying)
    lpdf = pdf[pdf["turn_idx"] % 2 == 1][["conv_id", "turn_idx", "ts"]]
    # one right row per (conv, ts): equal-ts right rows have no defined
    # winner in either engine (same caveat as the asof_* family)
    rpdf = (pdf[pdf["turn_idx"] % 2 == 0]
            .groupby(["conv_id", "ts"], as_index=False)
            .agg(text_len=("text_len", "max")))
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    out = asof_interpolate(left, right, on="ts", by="conv_id").toPandas()

    l = lpdf.sort_values("ts", kind="mergesort")
    r = rpdf.sort_values("ts", kind="mergesort")
    b = pd.merge_asof(l, r.rename(columns={"ts": "bts", "text_len": "bval"}),
                      left_on="ts", right_on="bts", by="conv_id",
                      direction="backward")
    f = pd.merge_asof(l, r.rename(columns={"ts": "fts", "text_len": "fval"}),
                      left_on="ts", right_on="fts", by="conv_id",
                      direction="forward")
    exp = b.merge(f[["conv_id", "turn_idx", "fts", "fval"]],
                  on=["conv_id", "turn_idx"])
    span = (exp["fts"] - exp["bts"]).dt.total_seconds()
    frac = (exp["ts"] - exp["bts"]).dt.total_seconds() / span
    interp = exp["bval"] + (exp["fval"] - exp["bval"]) * frac
    exp["want"] = np.where(
        exp["bts"].notna() & exp["fts"].notna() & (span > 0), interp,
        np.where(exp["bts"].notna(), exp["bval"], exp["fval"]))

    m = out.merge(exp[["conv_id", "turn_idx", "want"]],
                  on=["conv_id", "turn_idx"])
    assert len(m) == len(lpdf)
    assert np.allclose(m["text_len_interp"].astype(float),
                       m["want"].astype(float), equal_nan=True)


def test_prior_session_stats(transcripts, transcripts_pdf):
    df = Sessionize("30 minutes")(
        transcripts.withColumn("text_len", F.length("text").cast("int"))
    )
    out = PriorSessionStats(value_cols="text_len")(df).toPandas()

    pdf = ref_sessionize(transcripts_pdf.copy(), gap_sec=1800)
    pdf["text_len"] = pdf["text"].str.len()
    sess = pdf.groupby(["conv_id", "session_seq"]).agg(
        n=("turn_idx", "size"), mean_len=("text_len", "mean"),
        end=("ts", "max")).reset_index()
    prev = sess.copy()
    prev["session_seq"] += 1
    pdf = pdf.merge(
        prev.rename(columns={"n": "p_n", "mean_len": "p_mean", "end": "p_end"}),
        on=["conv_id", "session_seq"], how="left")

    m = out.merge(pdf[["conv_id", "turn_idx", "p_n", "p_mean", "p_end", "ts"]],
                  on=["conv_id", "turn_idx"], suffixes=("", "_ref"))
    assert len(m) == len(out) == len(transcripts_pdf)
    assert np.allclose(m["prev_session_n_turns"].astype(float),
                       m["p_n"].astype(float), equal_nan=True)
    assert np.allclose(m["prev_session_mean_text_len"].astype(float),
                       m["p_mean"].astype(float), equal_nan=True)
    want_secs = (m["ts_ref"] - m["p_end"]).dt.total_seconds()
    assert np.allclose(m["secs_since_prev_session_end"].astype(float),
                       want_secs.astype(float), equal_nan=True)
    # leakage: a prior session must have ended strictly before this turn
    done = m[m["prev_session_n_turns"].notna()]
    assert (done["secs_since_prev_session_end"] > 0).all()


def test_transition_matrix(transcripts, transcripts_pdf):
    out = transition_matrix(transcripts, col="role").toPandas()
    pdf = transcripts_pdf.sort_values(
        ["conv_id", "ts", "turn_idx"], kind="mergesort").copy()
    pdf["from_role"] = pdf.groupby("conv_id")["role"].shift(1)
    pairs = (pdf.dropna(subset=["from_role"])
             .groupby(["from_role", "role"]).size().reset_index(name="n"))
    pairs["p"] = (pairs["n"] / pairs.groupby("from_role")["n"].transform("sum")
                  ).round(6)
    m = out.merge(pairs, left_on=["from_role", "to_role"],
                  right_on=["from_role", "role"], suffixes=("", "_ref"))
    assert len(m) == len(out) == len(pairs)
    assert (m["n"] == m["n_ref"]).all()
    assert np.allclose(m["p"], m["p_ref"])
    # row-stochastic
    sums = out.groupby("from_role")["p"].sum()
    assert np.allclose(sums, 1.0, atol=1e-4)


def test_salted_join_matches_plain(transcripts):
    dim = (transcripts.groupBy("conv_id")
           .agg(F.count(F.lit(1)).alias("conv_turns")))
    # left join with half the dim missing exercises null-padding
    dim_half = dim.filter(F.crc32(F.col("conv_id")) % 2 == 0)
    for how in ("inner", "left"):
        plain = (transcripts.join(dim_half, on="conv_id", how=how)
                 .select("conv_id", "turn_idx", "conv_turns"))
        salted = salted_join(transcripts, dim_half, on="conv_id",
                             how=how, salts=4).select(
            "conv_id", "turn_idx", "conv_turns")
        a = plain.toPandas().sort_values(
            ["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
        b = salted.toPandas().sort_values(
            ["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
        assert len(a) == len(b)
        assert (a["conv_id"] == b["conv_id"]).all()
        assert np.allclose(a["conv_turns"].astype(float),
                           b["conv_turns"].astype(float), equal_nan=True)


def test_salted_join_refuses_right(transcripts):
    with pytest.raises(ValueError):
        salted_join(transcripts, transcripts, on="conv_id", how="right")
    with pytest.raises(ValueError):
        salted_join(transcripts, transcripts, on="conv_id", salts=1)


def test_time_grid_resample(spark):
    turns = spark.createDataFrame(
        [("c1", 0, _ts("2026-01-01 10:00:00"), 5),
         ("c1", 1, _ts("2026-01-01 10:20:00"), 7),
         ("c1", 2, _ts("2026-01-01 11:05:00"), 9),
         ("c2", 0, _ts("2026-01-01 00:00:00"), 1)],
        "conv_id string, turn_idx int, ts timestamp, text_len int",
    )
    out = time_grid_resample(turns, step="15 minutes",
                             cols=["turn_idx", "text_len"]).toPandas()
    c1 = out[out["conv_id"] == "c1"].sort_values("ts").reset_index(drop=True)
    # span 10:00 -> 11:05 at 15 min = 10:00, :15, :30, :45, 11:00 (5 rows)
    assert len(c1) == 5
    # 10:00 exact-hits turn 0; turn 1 (10:20) first visible at 10:30;
    # turn 2 (11:05) is after the last grid point
    assert list(c1["text_len"]) == [5, 5, 7, 7, 7]
    assert list(c1["turn_idx"]) == [0, 0, 1, 1, 1]
    c2 = out[out["conv_id"] == "c2"]
    assert len(c2) == 1 and c2["text_len"].iloc[0] == 1


def test_time_grid_matches_asof_strategies(transcripts):
    """Grid values must be identical across as-of strategies."""
    # one row per (conv, ts): equal-ts rows have no defined as-of
    # winner, so strategies could legitimately differ on them
    small = (transcripts.filter(F.crc32("conv_id") % 7 == 0)
             .groupBy("conv_id", "ts")
             .agg(F.max(F.length("text")).cast("int").alias("text_len")))
    a = time_grid_resample(small, step="10 minutes", cols=["text_len"],
                           strategy="union").toPandas()
    b = time_grid_resample(small, step="10 minutes", cols=["text_len"],
                           strategy="broadcast").toPandas()
    a = a.sort_values(["conv_id", "ts"], kind="mergesort").reset_index(drop=True)
    b = b.sort_values(["conv_id", "ts"], kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    assert np.allclose(a["text_len"].astype(float),
                       b["text_len"].astype(float), equal_nan=True)
