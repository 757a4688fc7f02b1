"""pit_window_agg: delta-encoded point-in-time windowed aggregates must
match the naive range join exactly, including boundary and same-ts
cases. The delta encoding is the scale path (O(S+E) rows, one shuffle);
the naive join is the O(S × density) oracle."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.joins import pit_window_agg
from hipipe_spark.operators.temporal import ts_seconds


@pytest.fixture(scope="module")
def pit_events(spark):
    """90 events, 6 users, engineered collisions: same-ts pairs,
    exact-horizon-boundary gaps (ts step is a divisor of the 600s
    horizon used in tests), bursty user 0."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    for e in range(90):
        u = e % 6 if e % 7 else 0          # user 0 is hot
        step = 120 if u == 0 else 300      # 600 % 120 == 600 % 300 == 0
        rows.append((e, u, base + dt.timedelta(seconds=step * (e // 6)),
                     float(e % 13)))
    return spark.createDataFrame(
        rows, "event_id int, user_id int, ts timestamp, value double"
    ).cache()


@pytest.fixture(scope="module")
def pit_spine(pit_events):
    # spine = a subset of the event timestamps plus shifted copies, so
    # both aligned (same-ts) and unaligned spine rows exist
    a = pit_events.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("spine_id"), "user_id", "ts")
    b = pit_events.filter(F.col("event_id") % 4 == 1).select(
        (F.col("event_id") + 1000).alias("spine_id"), "user_id",
        (F.col("ts") + F.expr("INTERVAL 37 SECONDS")).alias("ts"))
    return a.unionByName(b).cache()


def _naive(spine, events, horizon, strict, value=True):
    s = spine.select("*", ts_seconds(F.col("ts")).alias("__st"))
    e = events.select(F.col("user_id").alias("__eu"),
                      ts_seconds(F.col("ts")).alias("__et"),
                      F.col("value").alias("__ev"))
    cond = s["user_id"] == e["__eu"]
    cond &= (e["__et"] < s["__st"]) if strict else (e["__et"] <= s["__st"])
    if horizon is not None:
        cond &= e["__et"] >= s["__st"] - F.lit(float(horizon))
    j = s.join(e, cond, "left")
    agg = [F.count("__ev").alias("pit_count")]
    if value:
        agg.append(F.round(F.coalesce(F.sum("__ev"), F.lit(0.0)), 6)
                   .alias("pit_sum"))
    return (j.groupBy("spine_id", "user_id", "ts").agg(*agg))


def _cmp(got, want):
    g = sorted(got.collect())
    w = sorted(want.collect())
    assert g == w


@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("horizon", [600.0, None])
def test_pit_matches_naive(pit_spine, pit_events, horizon, strict):
    got = pit_window_agg(pit_spine, pit_events, by="user_id", on="ts",
                         horizon=horizon, value_col="value",
                         strict=strict)
    want = _naive(pit_spine, pit_events, horizon, strict)
    _cmp(got.select("spine_id", "user_id", "ts", "pit_count", "pit_sum"),
         want)


def test_pit_count_only(pit_spine, pit_events):
    got = pit_window_agg(pit_spine, pit_events, by="user_id", on="ts",
                         horizon=600.0, value_col=None)
    assert "pit_sum" not in got.columns
    want = _naive(pit_spine, pit_events, 600.0, True, value=False)
    _cmp(got.select("spine_id", "user_id", "ts", "pit_count"), want)


def test_pit_row_count_and_schema(pit_spine, pit_events):
    out = pit_window_agg(pit_spine, pit_events, by="user_id",
                         value_col="value")
    assert out.count() == pit_spine.count()
    assert set(out.columns) == {"spine_id", "user_id", "ts",
                                "pit_count", "pit_sum"}


def test_pit_boundary_semantics(spark):
    """Hand-built micro case pinning the exact boundary rules:
    event exactly `horizon` old counts; event at spine ts counts
    only when strict=False."""
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, base, 10.0),                                   # age 600
         (1, base + dt.timedelta(seconds=600), 3.0)],       # age 0
        "user_id int, ts timestamp, value double")
    sp = spark.createDataFrame(
        [(0, 1, base + dt.timedelta(seconds=600))],
        "spine_id int, user_id int, ts timestamp")
    strict = pit_window_agg(sp, ev, by="user_id", horizon=600.0,
                            value_col="value", strict=True).collect()[0]
    assert (strict["pit_count"], strict["pit_sum"]) == (1, 10.0)
    lenient = pit_window_agg(sp, ev, by="user_id", horizon=600.0,
                             value_col="value", strict=False).collect()[0]
    assert (lenient["pit_count"], lenient["pit_sum"]) == (2, 13.0)


def test_pit_validation(pit_spine, pit_events):
    with pytest.raises(ValueError, match="horizon"):
        pit_window_agg(pit_spine, pit_events, by="user_id", horizon=0.0)


def test_pit_plan_single_shuffle(pit_spine, pit_events):
    """The scale contract: no join in the plan (delta union + one
    window), so no O(S × density) blowup is even expressible."""
    out = pit_window_agg(pit_spine, pit_events, by="user_id",
                         horizon=600.0, value_col="value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # entity hash + any AQE reuse


# ------------------------------------------------------- multi-horizon
from hipipe_spark.operators.joins import pit_window_multi  # noqa: E402


@pytest.mark.parametrize("strict", [True, False])
def test_pit_multi_matches_single(pit_spine, pit_events, strict):
    """Each horizon column of the one-pass multi operator must equal
    the single-horizon operator run separately."""
    hs = [240.0, 600.0, 1800.0]
    multi = pit_window_multi(pit_spine, pit_events, by="user_id",
                             on="ts", horizons=hs, value_col="value",
                             strict=strict)
    for h in hs:
        lab = f"{int(h)}s"
        single = pit_window_agg(pit_spine, pit_events, by="user_id",
                                on="ts", horizon=h, value_col="value",
                                strict=strict)
        got = sorted(multi.select("spine_id", f"pit_count_{lab}",
                                  f"pit_sum_{lab}").collect())
        want = sorted(single.select("spine_id", "pit_count",
                                    "pit_sum").collect())
        assert got == want, f"horizon {h}"


def test_pit_multi_one_shuffle_one_sort(pit_spine, pit_events):
    """The amortization contract: 3 horizons, still exactly one
    entity-key Exchange and one Sort in the executed plan."""
    out = pit_window_multi(pit_spine, pit_events, by="user_id",
                           horizons=[240.0, 600.0, 1800.0],
                           value_col="value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    import re
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"^\s*[+:]?-?\s*\*?\(?\d*\)?\s*Sort ",
                          plan, re.M)) <= 1


def test_pit_multi_validation(pit_spine, pit_events):
    with pytest.raises(ValueError, match="positive"):
        pit_window_multi(pit_spine, pit_events, by="user_id",
                         horizons=[])
    with pytest.raises(ValueError, match="distinct"):
        pit_window_multi(pit_spine, pit_events, by="user_id",
                         horizons=[60.0, 60.0])
    with pytest.raises(ValueError, match="labels"):
        pit_window_multi(pit_spine, pit_events, by="user_id",
                         horizons=[60.0, 60.5])


# ------------------------------------------------------------- extrema
from hipipe_spark.operators.joins import pit_window_extrema  # noqa: E402


def _naive_extrema(spine, events, horizon, strict):
    s = spine.select("*", ts_seconds(F.col("ts")).alias("__st"))
    e = events.select(F.col("user_id").alias("__eu"),
                      ts_seconds(F.col("ts")).alias("__et"),
                      F.col("value").alias("__ev"))
    cond = s["user_id"] == e["__eu"]
    cond &= (e["__et"] < s["__st"]) if strict else (e["__et"] <= s["__st"])
    if horizon is not None:
        cond &= e["__et"] >= s["__st"] - F.lit(float(horizon))
    return (s.join(e, cond, "left")
            .groupBy("spine_id", "user_id", "ts")
            .agg(F.max("__ev").alias("pit_max"),
                 F.min("__ev").alias("pit_min")))


@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("horizon", [600.0, 240.0, None])
def test_pit_extrema_matches_naive(pit_spine, pit_events, horizon,
                                   strict):
    got = pit_window_extrema(pit_spine, pit_events, by="user_id",
                             value_col="value", on="ts",
                             horizon=horizon, strict=strict)
    want = _naive_extrema(pit_spine, pit_events, horizon, strict)
    _cmp(got.select("spine_id", "user_id", "ts", "pit_max", "pit_min"),
         want)


def test_pit_extrema_boundaries(spark):
    """Slice-boundary micro case: spine exactly on a slice edge, events
    at the window's left edge (in), right edge (strict-dependent), and
    just outside."""
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=s), v) for s, v in
         [(0, 99.0),      # exactly horizon old -> IN (left-inclusive)
          (-1, 500.0),    # 601s old -> OUT
          (300, 7.0),     # mid-window
          (600, 42.0)]],  # at spine ts -> strict OUT / lenient IN
        "user_id int, ts timestamp, value double")
    sp = spark.createDataFrame(
        [(0, 1, base + dt.timedelta(seconds=600))],
        "spine_id int, user_id int, ts timestamp")
    r = pit_window_extrema(sp, ev, by="user_id", value_col="value",
                           horizon=600.0, strict=True).collect()[0]
    assert (r["pit_max"], r["pit_min"]) == (99.0, 7.0)
    r = pit_window_extrema(sp, ev, by="user_id", value_col="value",
                           horizon=600.0, strict=False).collect()[0]
    assert (r["pit_max"], r["pit_min"]) == (99.0, 7.0)
    # lenient max catches the at-ts event when it is the largest
    r = pit_window_extrema(
        sp, ev.withColumn("value", F.col("value") * F.when(
            F.col("value") == 42.0, 10.0).otherwise(1.0)),
        by="user_id", value_col="value", horizon=600.0,
        strict=False).collect()[0]
    assert r["pit_max"] == 420.0


def test_pit_extrema_empty_window_null(spark):
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame([(2, base, 1.0)],
                               "user_id int, ts timestamp, value double")
    sp = spark.createDataFrame(
        [(0, 1, base + dt.timedelta(seconds=60))],
        "spine_id int, user_id int, ts timestamp")
    r = pit_window_extrema(sp, ev, by="user_id", value_col="value",
                           horizon=600.0).collect()[0]
    assert r["pit_max"] is None and r["pit_min"] is None


def test_pit_extrema_no_pair_blowup(pit_spine, pit_events):
    """Plan contract: the only join is the final narrow rejoin on
    (entity, ts) — no range/theta join, no cartesian."""
    out = pit_window_extrema(pit_spine, pit_events, by="user_id",
                             value_col="value", horizon=600.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
