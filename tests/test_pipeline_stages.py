"""Ewma / Calendar pipeline stages: composition, one-exchange plan,
leakage safety (past-only), value replicas."""

import numpy as np
import pandas as pd

from hipipe_spark.operators.temporal import (
    Calendar, Ewma, LagLead, RollingAgg, Sessionize, TimeSincePrev,
)
from hipipe_spark.plans.pipeline import Pipeline

import pyspark.sql.functions as F


def _exchanges(df):
    s = df._jdf.queryExecution().executedPlan().toString()
    import re
    return len(re.findall(r"\bExchange ", s))


def test_composed_pipeline_adds_no_exchange(spark, transcripts):
    base = Pipeline([
        Sessionize(gap="30 minutes"),
        TimeSincePrev(),
        LagLead("turn_idx", lags=[1]),
        RollingAgg({"mean_len_10": (F.avg, F.length("text"))},
                   lookback=10),
    ])
    full = base | Ewma("turn_idx", alpha=0.5, window=4) | Calendar()
    n_base = _exchanges(base(transcripts))
    out = full(transcripts)
    # Ewma shares the pipeline's (conv_id, ts, turn_idx) window and
    # Calendar is row-local: together they add ZERO exchanges
    assert _exchanges(out) == n_base
    cols = set(out.columns)
    assert "turn_idx_ewma" in cols
    assert {"hour_sin", "dow_cos", "is_weekend"} <= cols


def test_ewma_stage_past_only(spark):
    # mutate a FUTURE row; earlier ewma values must not move
    pdf = pd.DataFrame({
        "conv_id": ["c"] * 6,
        "turn_idx": range(6),
        "ts": pd.date_range("2024-01-01", periods=6, freq="1min"),
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })
    base = Ewma("v", window=3)(spark.createDataFrame(pdf)) \
        .orderBy("turn_idx").toPandas()
    pdf2 = pdf.copy()
    pdf2.loc[5, "v"] = 1000.0
    mut = Ewma("v", window=3)(spark.createDataFrame(pdf2)) \
        .orderBy("turn_idx").toPandas()
    assert np.allclose(base["v_ewma"][:5], mut["v_ewma"][:5])
    assert mut["v_ewma"].iloc[5] != base["v_ewma"].iloc[5]


def test_ewma_stage_matches_manual(spark):
    pdf = pd.DataFrame({
        "conv_id": ["c"] * 4,
        "turn_idx": range(4),
        "ts": pd.date_range("2024-01-01", periods=4, freq="1min"),
        "v": [8.0, 4.0, 2.0, 1.0],
    })
    out = Ewma("v", alpha=0.5, window=8)(spark.createDataFrame(pdf)) \
        .orderBy("turn_idx").toPandas()
    # t=3: (1 + .5*2 + .25*4 + .125*8)/(1+.5+.25+.125) = 4/1.875
    assert abs(out["v_ewma"].iloc[3] - 4.0 / 1.875) < 1e-6
    assert out["v_ewma"].iloc[0] == 8.0
