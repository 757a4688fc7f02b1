"""Zero-temporal-leakage gate (BASELINE.md "Temporal integrity").

Perturb rows strictly in the future of a cut timestamp → every feature
at or before the cut must be byte-identical. If any feature read
ts' > ts, the perturbation would change it."""

import pandas as pd
from pyspark.sql import functions as F

from hipipe_spark import reference_impl as ri
from hipipe_spark.operators.flagship import featurize

FEATURES = [
    "session_seq", "session_id", "secs_since_prev", "role_lag_1",
    "role_lag_2", "text_len_lag_1", "assistant_turns_10",
    "mean_text_len_10", "tool_filled", "temperature_asof", "model_asof",
]


def test_future_perturbation_changes_nothing(spark, transcripts, transcripts_pdf,
                                             profiles):
    cut = transcripts_pdf["ts"].quantile(0.5)

    base = featurize(transcripts, profiles).filter(F.col("ts") <= cut).toPandas()

    # mangle everything after the cut: different text/role/tool, shifted ts
    fut = F.col("ts") > F.lit(cut)
    mutated = (
        transcripts
        .withColumn("text", F.when(fut, F.lit("XXXX")).otherwise(F.col("text")))
        .withColumn("role", F.when(fut, F.lit("tool")).otherwise(F.col("role")))
        .withColumn("tool", F.when(fut, F.lit("evil")).otherwise(F.col("tool")))
        .withColumn(
            "ts",
            F.when(fut, F.col("ts") + F.make_interval(hours=F.lit(5))).otherwise(F.col("ts")),
        )
    )
    mut_profiles = profiles.withColumn(
        "temperature",
        F.when(F.col("ts") > F.lit(cut), F.col("temperature") + 100).otherwise(F.col("temperature")),
    )
    after = featurize(mutated, mut_profiles).filter(F.col("ts") <= cut).toPandas()

    assert len(base) == len(after) and len(base) > 50
    assert ri.allclose_frames(base, after, FEATURES + ["text"])


def test_lead_is_labelled_not_feature(spark, transcripts):
    """Leads read the future by definition; the API forces the _label
    suffix so they can't silently masquerade as features."""
    from hipipe_spark.operators.temporal import LagLead
    out = LagLead("role", lags=[], leads=[1])(transcripts)
    lead_cols = [c for c in out.columns if "lead" in c]
    assert lead_cols == ["role_lead_1_label"]
