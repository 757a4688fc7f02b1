"""Property-based temporal-feature test: random conversations (ties,
duplicate timestamps, singleton convs) -> full flagship feature set on
Spark must allclose the single-node pandas reference implementation at
every (conv_id, turn_idx). Random shapes probe tie/boundary behavior
the fixtures don't."""

import datetime as dt

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hipipe_spark import reference_impl as ref
from hipipe_spark.operators.flagship import featurize

EPOCH = dt.datetime(2025, 3, 1)

conv = st.sampled_from(["c0", "c1", "c2"])
row = st.tuples(conv, st.integers(0, 7200),
                st.sampled_from(["user", "assistant"]),
                st.sampled_from(["", "search", "code"]),
                st.text(alphabet="abc d", max_size=8))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(row, min_size=1, max_size=25))
def test_flagship_matches_pandas_reference(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "secs", "role", "tool", "text"])
    pdf["ts"] = pdf["secs"].map(lambda s: EPOCH + dt.timedelta(seconds=s))
    pdf = pdf.drop(columns=["secs"])
    pdf["turn_idx"] = pdf.groupby("conv_id").cumcount().astype("int32")
    sdf = spark.createDataFrame(
        pdf, schema="conv_id string, role string, tool string, text string, "
                    "ts timestamp, turn_idx int")
    got = (featurize(sdf).toPandas()
           .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
           .reset_index(drop=True))
    want = ref.featurize(pdf)
    want = (want.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
            .reset_index(drop=True))
    assert len(got) == len(want)
    # per-turn text byte-equality under the stable ordering (north rule)
    assert got["text"].tolist() == want["text"].tolist()
    num_cols = ["secs_since_prev", "text_len_lag_1", "assistant_turns_10",
                "mean_text_len_10"]
    for c in num_cols:
        a = got[c].astype("float64").to_numpy()
        b = want[c].astype("float64").to_numpy()
        assert np.allclose(a, b, equal_nan=True), c
    for c in ["session_id", "role_lag_1", "tool_filled"]:
        assert got[c].fillna("<N>").tolist() == want[c].fillna("<N>").tolist(), c
