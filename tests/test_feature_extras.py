"""Round-3 feature-engineering extras: time-decayed aggregates,
cumulative distinct counts, rolling quantiles. Each is checked against
an independent pandas reference on the skewed transcripts fixture and
pinned for leakage (first rows see nothing) and parallelism
invariance."""

import math

import numpy as np
import pandas as pd

from hipipe_spark.operators.temporal import (
    CumulativeDistinct, DecayAgg, RollingQuantile,
)

KEYS = ["conv_id", "turn_idx"]


def _sorted(pdf):
    return pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)


def _decay_ref(pdf, lookback, tau_sec):
    rows = []
    for _, g in _sorted(pdf).groupby("conv_id", sort=False):
        tss = g["ts"].astype("int64").to_numpy() / 1e9
        vals = g["text_len"].astype(float).to_numpy()
        for i in range(len(g)):
            s = ws = 0.0
            for j in range(1, lookback + 1):
                if i - j < 0:
                    break
                w = math.exp(-(tss[i] - tss[i - j]) / tau_sec)
                ws += w
                s += w * vals[i - j]
            rows.append((g["conv_id"].iloc[i], int(g["turn_idx"].iloc[i]), s, ws))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ref_sum", "ref_wsum"])


def test_decay_time_matches_pandas(transcripts, transcripts_pdf):
    import pyspark.sql.functions as F

    t = transcripts.withColumn("text_len", F.length("text").cast("int"))
    out = DecayAgg("text_len", lookback=5, tau="10 minutes")(t).toPandas()
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len()
    ref = _decay_ref(pdf, lookback=5, tau_sec=600.0)
    m = out.merge(ref, on=KEYS, validate="1:1")
    assert len(m) == len(out)
    assert np.allclose(m["text_len_decay_sum"], m["ref_sum"])
    assert np.allclose(m["decay_wsum"], m["ref_wsum"])
    mean = m["text_len_decay_mean"].to_numpy(dtype=float)
    expect = np.where(m["ref_wsum"] > 0, m["ref_sum"] / m["ref_wsum"], np.nan)
    assert np.allclose(mean, expect, equal_nan=True)


def test_decay_rows_mode_exact(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [("c", i, base + dt.timedelta(seconds=10 * i), float(v))
            for i, v in enumerate([1, 2, 4, 8])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, x double")
    out = {r.turn_idx: r for r in
           DecayAgg("x", lookback=3, mode="rows", alpha=0.5)(df).collect()}
    # row 3: 0.5*4 + 0.25*2 + 0.125*1 = 2.625 ; wsum = 0.875
    assert math.isclose(out[3].x_decay_sum, 2.625)
    assert math.isclose(out[3].decay_wsum, 0.875)
    assert math.isclose(out[0].decay_wsum, 0.0)
    assert out[0].x_decay_mean is None  # no past rows -> null mean


def test_cumulative_distinct_matches_pandas(transcripts, transcripts_pdf):
    import pyspark.sql.functions as F

    t = transcripts.withColumn(
        "tool_v", F.when(F.col("tool") != "", F.col("tool")))
    out = CumulativeDistinct("tool_v")(t).toPandas()
    rows = []
    pdf = transcripts_pdf.copy()
    pdf["tool_v"] = pdf["tool"].where(pdf["tool"] != "")
    for _, g in _sorted(pdf).groupby("conv_id", sort=False):
        seen = set()
        for i in range(len(g)):
            rows.append((g["conv_id"].iloc[i], int(g["turn_idx"].iloc[i]), len(seen)))
            v = g["tool_v"].iloc[i]
            if isinstance(v, str):
                seen.add(v)
    ref = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ref"])
    m = out.merge(ref, on=KEYS, validate="1:1")
    assert len(m) == len(out)
    assert (m["tool_v_distinct_sofar"] == m["ref"]).all()


def test_rolling_quantile_matches_pandas(transcripts, transcripts_pdf):
    import pyspark.sql.functions as F

    t = transcripts.withColumn("text_len", F.length("text").cast("int"))
    out = RollingQuantile("text_len", q=0.5, lookback=7)(t).toPandas()
    rows = []
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len()
    for _, g in _sorted(pdf).groupby("conv_id", sort=False):
        vals = g["text_len"].to_numpy()
        for i in range(len(g)):
            window = sorted(vals[max(0, i - 7):i])
            med = window[math.ceil(0.5 * len(window)) - 1] if window else None
            rows.append((g["conv_id"].iloc[i], int(g["turn_idx"].iloc[i]), med))
    ref = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ref"])
    m = out.merge(ref, on=KEYS, validate="1:1")
    assert len(m) == len(out)
    got = m["text_len_q50"].astype("Int64")
    want = m["ref"].astype("Int64")
    assert got.equals(want)


def test_extras_parallelism_invariance(transcripts):
    import pyspark.sql.functions as F

    t = transcripts.withColumn("text_len", F.length("text").cast("int")) \
                   .withColumn("tool_v", F.when(F.col("tool") != "", F.col("tool")))

    def run(d):
        d = DecayAgg("text_len", lookback=5, tau="10 minutes")(d)
        d = CumulativeDistinct("tool_v")(d)
        d = RollingQuantile("text_len", q=0.5, lookback=7)(d)
        return (d.select("conv_id", "turn_idx", "text_len_decay_sum",
                         "tool_v_distinct_sofar", "text_len_q50")
                 .toPandas().sort_values(KEYS).reset_index(drop=True))

    a, b = run(t.repartition(2)), run(t.repartition(17))
    assert np.allclose(a["text_len_decay_sum"], b["text_len_decay_sum"])
    assert a["tool_v_distinct_sofar"].equals(b["tool_v_distinct_sofar"])
    assert a["text_len_q50"].equals(b["text_len_q50"])


def test_decay_bucketed_equals_plain(transcripts):
    """Skew-proof bucketed decay == plain decay on the hot fixture
    (same recipe as BucketedRollingAgg, applied to the lag formula)."""
    import pyspark.sql.functions as F

    t = transcripts.withColumn("text_len", F.length("text").cast("int"))
    plain = DecayAgg("text_len", lookback=5, tau="10 minutes")(t) \
        .select("conv_id", "turn_idx", "decay_wsum", "text_len_decay_sum") \
        .toPandas().sort_values(KEYS).reset_index(drop=True)
    bucketed = DecayAgg("text_len", lookback=5, tau="10 minutes",
                        bucket_size=16)(t) \
        .select("conv_id", "turn_idx", "decay_wsum", "text_len_decay_sum") \
        .toPandas().sort_values(KEYS).reset_index(drop=True)
    assert len(plain) == len(bucketed)
    assert np.allclose(plain["decay_wsum"], bucketed["decay_wsum"])
    assert np.allclose(plain["text_len_decay_sum"],
                       bucketed["text_len_decay_sum"])


def test_lift_table(spark):
    from hipipe_spark.operators.features import lift_table

    # scores 1..100, label 1 iff score > 80: top bins catch all positives
    df = spark.createDataFrame(
        [(float(i), 1 if i > 80 else 0) for i in range(1, 101)],
        "x double, y int")
    out = lift_table(df, "x", "y", n_bins=10, exact=True).collect()
    rows = {r["bin"]: r for r in out}
    assert len(rows) == 10 and rows[9]["n"] == 10
    assert rows[9]["rate"] == 1.0 and rows[8]["rate"] == 1.0
    assert rows[7]["rate"] == 0.0
    # overall rate 0.2 -> lift of a pure bin = 5
    assert rows[9]["lift"] == 5.0
    # cumulative from the top: bins 9+8 = 20 rows, all positive
    assert rows[8]["cum_n"] == 20 and rows[8]["cum_rate"] == 1.0
    assert rows[0]["cum_n"] == 100 and rows[0]["cum_rate"] == 0.2
    assert rows[0]["cum_lift"] == 1.0


def test_conv_tempo(spark):
    import datetime as dt

    from hipipe_spark.operators.features import conv_tempo

    base = dt.datetime(2024, 1, 1)
    rows = [("c1", i, base + dt.timedelta(seconds=s))
            for i, s in enumerate([0, 10, 20, 90])]
    rows += [("c2", 0, base)]  # single turn: no gaps
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = {r["conv_id"]: r for r in conv_tempo(df).collect()}

    c1 = out["c1"]
    assert c1["n_turns"] == 4 and c1["duration_s"] == 90.0
    assert c1["mean_gap"] == 30.0 and c1["max_gap"] == 70.0
    # gaps (10, 10, 70): sample var = 2400/2 = 1200, std = 34.641016
    assert abs(c1["std_gap"] - 34.641016) < 1e-5
    assert abs(c1["burstiness"] - (34.641016 - 30) / (34.641016 + 30)) < 1e-5

    c2 = out["c2"]
    assert c2["n_turns"] == 1 and c2["duration_s"] == 0.0
    assert c2["mean_gap"] is None and c2["std_gap"] is None
    assert c2["burstiness"] is None
