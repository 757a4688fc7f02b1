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


def test_sliding_distinct_exact_matches_python(spark):
    from hipipe_spark.operators.analytics import sliding_distinct
    # users active on specific days (epoch days 0..9)
    acts = [(1, 0), (1, 1), (2, 1), (3, 4), (1, 4), (2, 8), (3, 8),
            (3, 9), (1, 9)]
    rows = [(u, float(day * 86400 + 3 * 3600)) for u, day in acts]
    df = spark.createDataFrame(rows, "user_id long, es double") \
        .selectExpr("user_id", "timestamp_seconds(es) AS ts")
    out = (sliding_distinct(df, window_s=3 * 86400.0, slide_s=86400.0)
           .toPandas())
    got = {int(r["window_start_s"] // 86400): r["n_active"]
           for _, r in out.iterrows()}
    # python reference: window w covers days [w, w+2]
    days = {}
    for u, d in acts:
        days.setdefault(d, set()).add(u)
    ref = {}
    for w in range(-2, 10):
        s = set()
        for d in range(w, w + 3):
            s |= days.get(d, set())
        if s:
            ref[w] = len(s)
    assert got == ref


def test_sliding_distinct_approx_close(spark):
    import numpy as np
    from hipipe_spark.operators.analytics import sliding_distinct
    rng = np.random.default_rng(2)
    rows = [(int(rng.integers(200)),
             float(86400 * rng.integers(0, 20) + rng.integers(0, 86400)))
            for _ in range(3000)]
    df = spark.createDataFrame(rows, "user_id long, es double") \
        .selectExpr("user_id", "timestamp_seconds(es) AS ts")
    ex = sliding_distinct(df, window_s=7 * 86400.0,
                          slide_s=86400.0).toPandas()
    ap = sliding_distinct(df, window_s=7 * 86400.0, slide_s=86400.0,
                          approximate=True).toPandas()
    j = ex.merge(ap, on="window_start_s", suffixes=("_e", "_a"))
    assert len(j) == len(ex) == len(ap)
    rel = abs(j["n_active_a"] - j["n_active_e"]) / j["n_active_e"]
    assert (rel < 0.1).all()


def test_rfm_segments_tiles_and_anchor(spark):
    import datetime as dt
    from hipipe_spark.operators.analytics import rfm_segments
    base = dt.datetime(2026, 1, 1)
    rows = []
    for u in range(10):
        # user u: u+1 events, last activity u days before the anchor,
        # spend 100*(u+1) — perfectly anti-correlated R vs F/M
        for i in range(u + 1):
            rows.append((u, base - dt.timedelta(days=u, hours=i),
                         100.0))
    df = spark.createDataFrame(rows, "u: long, ts: timestamp, v: double")
    out = {r.u: r for r in
           rfm_segments(df, "u", "ts", "v", n_tiles=5).collect()}
    assert out[0].r == 1 and out[9].r == 5     # most/least recent
    assert out[9].f == 1 and out[0].f == 5     # most/least frequent
    assert out[9].m == 1 and out[0].m == 5
    assert out[0].rfm == "155" and out[9].rfm == "511"
    assert out[0].recency_s == 0.0             # anchor = corpus max


def test_entropy_rate_cycle_vs_random(spark):
    import datetime as dt
    import numpy as np
    from hipipe_spark.operators.analytics import entropy_rate
    base = dt.datetime(2026, 1, 1)
    rng = np.random.RandomState(13)
    # strict a->b->c cycle: marginal entropy log2(3), rate 0
    cyc = [(1, base + dt.timedelta(seconds=i), i, "abc"[i % 3])
           for i in range(300)]
    df = spark.createDataFrame(cyc, "k: long, ts: timestamp, i: long, "
                                    "tok: string")
    r = entropy_rate(df, "k", "tok", ["ts", "i"]).collect()[0]
    assert abs(r.h_marginal - 1.584963) < 1e-3
    assert r.h_rate == 0.0
    assert r.predictability == 1.0
    # iid uniform tokens: rate ≈ marginal, predictability ≈ 0
    rnd = [(1, base + dt.timedelta(seconds=i), i,
            "abc"[rng.randint(3)]) for i in range(3000)]
    df2 = spark.createDataFrame(rnd, "k: long, ts: timestamp, i: long, "
                                     "tok: string")
    r2 = entropy_rate(df2, "k", "tok", ["ts", "i"]).collect()[0]
    assert r2.predictability < 0.02


def test_ccf_finds_planted_lead(spark):
    import math
    from hipipe_spark.operators.temporal import ccf
    # a_t = b_{t-3}: b leads a by 3 → peak at lag +3
    n = 400
    b = [math.sin(t / 7.0) + 0.1 * ((t * 37) % 11) for t in range(n + 3)]
    rows = [(t, b[t], b[t + 3]) for t in range(n)]
    df = spark.createDataFrame(rows, "t: bigint, a: double, b: double")
    out = {r.lag: r.r for r in ccf(df, "t", "a", "b", max_lag=6).collect()}
    assert out[3] > 0.99                        # the planted lead
    assert all(out[k] < 0.9 for k in out if k != 3)
