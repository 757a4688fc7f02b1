"""funnel ordering semantics + cohort_retention vs a python ref."""

from pyspark.sql import functions as F

from hipipe_spark.operators.analytics import cohort_retention, funnel


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_funnel_ordering_required(spark):
    ev = _events(spark, [
        # u1 completes in order
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 01:00:00"),
        (1, "buy", "2024-01-01 02:00:00"),
        # u2 clicks BEFORE viewing: view counted, click (post-view) missing
        (2, "click", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 01:00:00"),
        # u3 views only
        (3, "view", "2024-01-01 00:00:00"),
    ])
    out = {r["step"]: r for r in
           funnel(ev, ["view", "click", "buy"]).collect()}
    assert out[1]["n_users"] == 3
    assert out[2]["n_users"] == 1
    assert out[3]["n_users"] == 1
    assert abs(out[2]["conv_rate"] - 1 / 3) < 1e-6


def test_funnel_greedy_earliest_recovers_late_chain(spark):
    # earliest click is pre-view, but a later click completes the chain
    ev = _events(spark, [
        (1, "click", "2024-01-01 00:00:00"),
        (1, "view", "2024-01-01 01:00:00"),
        (1, "click", "2024-01-01 02:00:00"),
    ])
    out = {r["step"]: r["n_users"] for r in
           funnel(ev, ["view", "click"]).collect()}
    assert out[2] == 1


def test_funnel_within_window(spark):
    ev = _events(spark, [
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 00:30:00"),   # inside 1h
        (2, "view", "2024-01-01 00:00:00"),
        (2, "click", "2024-01-01 02:00:00"),   # outside 1h
    ])
    out = {r["step"]: r["n_users"] for r in
           funnel(ev, ["view", "click"], within_s=3600.0).collect()}
    assert out[1] == 2 and out[2] == 1


def test_cohort_retention_triangle(spark):
    day = 86400.0
    ev = _events(spark, [
        # u1 cohort day0, active day0 + day2
        (1, "x", "2024-01-01 01:00:00"),
        (1, "x", "2024-01-03 01:00:00"),
        # u2 cohort day0, active day0 only (two events, one period)
        (2, "x", "2024-01-01 02:00:00"),
        (2, "x", "2024-01-01 23:00:00"),
        # u3 cohort day2
        (3, "x", "2024-01-03 05:00:00"),
    ])
    out = {(r["cohort"], r["age"]): r for r in
           cohort_retention(ev, period_s=day).collect()}
    c0 = min(k[0] for k in out)
    assert out[(c0, 0)]["n_active"] == 2
    assert out[(c0, 0)]["retention"] == 1.0
    assert out[(c0, 2)]["n_active"] == 1
    assert out[(c0, 2)]["retention"] == 0.5
    assert out[(c0 + 2, 0)]["n_active"] == 1
    assert len(out) == 3
