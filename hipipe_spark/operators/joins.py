"""Skew-aware join strategies.

A handful of hot keys (the 1% of conversations holding half the turns —
datagen's hot_frac, and the reality of any web-scale corpus) turn a
plain shuffle join into one straggler task. AQE's skew-join split
handles *sort-merge* skew when statistics surface it; ``salted_join``
is the explicit, deterministic version that works on any plan shape and
any Spark version, at the cost of replicating the small side ``salts``
times.

hipipe sidesteps the problem entirely (single-node column streams have
no shuffle — reference ``stream/transform.hpp`` operates in-core); at
10^12 rows the shuffle IS the architecture, so the engine must own it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Join a skewed ``fact`` table to a (relatively) small ``dim``
    table on ``on``, splitting every hot fact key across ``salts``
    shuffle partitions.

    Mechanics: each fact row gets a round-robin salt in ``[0, salts)``
    (derived from ``monotonically_increasing_id`` — the salt VALUE
    never affects results, only placement, so any uniform source is
    correct); the dim side is exploded ``salts`` times so every
    (key, salt) bucket finds its dim rows. The join key becomes
    ``on + [salt]`` — a single hot key now lands in ``salts`` tasks
    instead of one.

    Result is row-identical to ``fact.join(dim, on, how)`` for
    ``how in ("inner", "left")``; right/full joins are refused because
    replicated unmatched dim rows would multiply. Cost trade: dim-side
    rows shuffled ×``salts`` — use when |dim| ≪ |fact| but too big to
    broadcast (the broadcast join needs no salting at all).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(replicated dim rows would multiply unmatched right rows)"
        )
    if salts < 2:
        raise ValueError("salts must be >= 2 (1 is a plain join)")
    keys = [on] if isinstance(on, str) else list(on)
    fact_s = fact.withColumn(
        SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salts)).cast("int")
    )
    # sequence of int literals yields array<int> — no cast (a generator
    # cannot nest inside another expression)
    dim_s = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return fact_s.join(dim_s, on=keys + [SALT], how=how).drop(SALT)


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    time_col: str,
    start_col: str,
    end_col: str,
    on: str | Sequence[str] | None = None,
    how: str = "inner",
    slice_seconds: int | None = None,
    closed: str = "left",
) -> DataFrame:
    """Join each ``facts`` row to every ``intervals`` row whose
    ``[start, end)`` window contains ``facts[time_col]`` (optionally
    also matching equi-keys ``on``) — the point-in-interval range join
    hipipe expresses as an in-core column scan (reference
    ``stream/transform.hpp`` — single-node streams never join; at
    cluster scale the range predicate IS the problem).

    ``closed``: ``"left"`` = ``start <= t < end`` (default),
    ``"both"`` = ``start <= t <= end``.

    Strategy — why not a plain ``facts.join(intervals, range_pred)``:
    a pure theta join compiles to BroadcastNestedLoopJoin (fine only
    while intervals broadcast) or a cartesian product. With
    ``slice_seconds`` set, both sides are bucketed onto a time grid:
    each interval explodes into the ``(end-start)/slice + 1`` slices it
    covers, facts map to exactly ONE slice, and the join becomes an
    equi-join on ``on + [slice]`` followed by the exact range filter —
    shuffle-partitionable, AQE-skew-splittable, no nested loop. Slice
    replication is bounded by the longest interval (document/cap your
    interval length); pick ``slice_seconds`` ≈ the median interval
    length so the explode factor stays ~2.

    With ``slice_seconds=None`` the plain predicate join is used
    (correct at any size, only sensible when one side broadcasts).

    ``how="left"`` keeps unmatched facts (interval columns null).
    """
    from hipipe_spark.operators.temporal import ts_seconds

    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    t = ts_seconds(F.col(time_col))
    lo = ts_seconds(F.col(start_col))
    hi = ts_seconds(F.col(end_col))
    in_range = (t >= lo) & ((t <= hi) if closed == "both" else (t < hi))

    if slice_seconds is None:
        pred = in_range
        for k in keys:
            pred = pred & (facts[k] == intervals[k])
        joined = facts.join(intervals, pred, how)
        return joined.drop(*[intervals[k] for k in keys])

    if slice_seconds <= 0:
        raise ValueError("slice_seconds must be positive")
    s = F.lit(float(slice_seconds))
    SLICE, FID = "__slice", "__fid"
    facts_id = facts.withColumn(FID, F.monotonically_increasing_id())
    facts_s = facts_id.withColumn(SLICE, F.floor(t / s))
    # sequence(floor(lo/s), floor(hi/s)) covers every slice the interval
    # touches; hi exactly on a slice boundary with closed="left" still
    # generates that (empty) last slice — harmless, filtered exactly.
    iv_s = intervals.withColumn(
        SLICE, F.explode(F.sequence(F.floor(lo / s), F.floor(hi / s)))
    )
    joined = facts_s.join(iv_s, on=keys + [SLICE], how="inner").filter(
        in_range
    ).drop(SLICE)
    if how == "inner":
        return joined.drop(FID)
    # left: add back facts with no interval — anti-join on the synthetic
    # row id (narrow key; all-columns equality would choke on map types
    # and shuffle the full row width)
    unmatched = facts_id.join(
        joined.select(FID).distinct(), on=FID, how="left_anti"
    )
    for c in joined.columns:
        if c not in facts_id.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(joined.schema[c].dataType)
            )
    return joined.unionByName(unmatched).drop(FID)


def pit_window_agg(
    spine: DataFrame,
    events: DataFrame,
    by: str,
    on: str = "ts",
    horizon: float | None = 3600.0,
    value_col: str | None = None,
    strict: bool = True,
    prefix: str = "pit_",
) -> DataFrame:
    """Point-in-time windowed aggregate join — the feature-store
    primitive: for every spine row, the COUNT (``{prefix}count``) and
    SUM (``{prefix}sum``, when ``value_col`` is given) of the entity's
    events inside ``(spine_ts − horizon, spine_ts)``. ``strict=True``
    excludes events AT the spine timestamp (the zero-leakage default:
    a feature computed while the event is happening must not see it);
    ``strict=False`` includes them. ``horizon=None`` means all history.
    Window bounds: ``[spine_ts − horizon, spine_ts)`` when strict,
    ``[spine_ts − horizon, spine_ts]`` when lenient — the trailing
    edge is always left-inclusive (an event exactly ``horizon`` old
    still counts).

    THE SCALE TRICK — no range-join explosion: a naive
    ``spine JOIN events ON entity AND ts range`` materializes one row
    per (spine, event-in-window) pair — O(S × density) rows, quadratic
    for bursty entities. Instead each event becomes TWO signed delta
    rows — (+1/+v at event_ts) and (−1/−v at event_ts + horizon) — and
    the spine row reads a RUNNING SUM over the union, ordered by
    (ts, kind) within the entity. One shuffle on the entity key, one
    conversation/user-bounded window sort, output exactly |spine| rows.
    The kind ordering encodes the boundary semantics: with strict=True
    the spine row sorts BEFORE same-ts adds; expiry rows sort after
    the spine either way (left-inclusive window).

    Hot entities: partitions stay entity-bounded (the lag/lead skew
    profile). An entity whose event+spine count exceeds one task's
    memory needs time-slice salting upstream — same documented trade
    as ``cap_per_group``.

    Reference contrast: hipipe's in-core batch columns have no
    cross-table temporal join at all; this is the engine's as-of
    machinery (``asof.py``) generalized from "latest value" to
    "windowed aggregate".
    """
    from pyspark.sql import Window

    from hipipe_spark.operators.temporal import ts_seconds

    sec_e = ts_seconds(F.col(on))
    val = (F.col(value_col).cast("double") if value_col
           else F.lit(0.0))
    # kind ordering at equal ts: strict  -> spine(0) < expiry(1) < add(2)
    #                            lenient -> add(0) < spine(1) < expiry(2)
    k_spine, k_exp, k_add = (0, 1, 2) if strict else (1, 2, 0)

    adds = events.select(
        F.col(by).alias("__e"), sec_e.alias("__t"),
        F.lit(k_add).alias("__k"), F.lit(1).cast("long").alias("__dc"),
        F.coalesce(val, F.lit(0.0)).alias("__dv"))
    deltas = adds
    if horizon is not None:
        if horizon <= 0:
            raise ValueError("horizon must be positive")
        expiries = adds.select(
            "__e", (F.col("__t") + F.lit(float(horizon))).alias("__t"),
            F.lit(k_exp).alias("__k"), (-F.col("__dc")).alias("__dc"),
            (-F.col("__dv")).alias("__dv"))
        deltas = adds.unionByName(expiries)

    spine_cols = spine.columns
    s = spine.select(
        "*", F.col(by).alias("__e"), ts_seconds(F.col(on)).alias("__t"),
        F.lit(k_spine).alias("__k"), F.lit(0).cast("long").alias("__dc"),
        F.lit(0.0).alias("__dv"))
    d = deltas.select(
        *[F.lit(None).cast(spine.schema[c].dataType).alias(c)
          for c in spine_cols],
        "__e", "__t", "__k", "__dc", "__dv")

    w = (Window.partitionBy("__e").orderBy("__t", "__k")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (s.unionByName(d)
         .withColumn("__rc", F.sum("__dc").over(w))
         .withColumn("__rv", F.sum("__dv").over(w)))
    out = (u.filter(F.col("__k") == k_spine)
           .withColumn(f"{prefix}count", F.col("__rc"))
           .drop("__e", "__t", "__k", "__dc", "__dv", "__rc"))
    if value_col:
        out = out.withColumn(f"{prefix}sum", F.round(F.col("__rv"), 6))
    return out.drop("__rv")


def pit_window_multi(
    spine: DataFrame,
    events: DataFrame,
    by: str,
    on: str = "ts",
    horizons: Sequence[float] = (3600.0, 86400.0),
    value_col: str | None = None,
    strict: bool = True,
    prefix: str = "pit_",
) -> DataFrame:
    """Multi-horizon :func:`pit_window_agg`: for every spine row, the
    count (and sum of ``value_col``) of the entity's events inside
    EACH of several trailing windows — ``{prefix}count_{h}s`` /
    ``{prefix}sum_{h}s`` per horizon ``h`` (labelled by whole seconds).
    Boundary semantics identical to ``pit_window_agg``:
    ``[spine_ts − h, spine_ts)`` strict, ``[spine_ts − h, spine_ts]``
    lenient.

    Why one operator instead of H calls: a feature vector usually
    wants the same event stream at 1h/24h/7d. H separate calls cost H
    shuffles and H window sorts over the full union; the delta encoding
    amortizes them — each event emits ONE add row carrying a +1/+v
    delta for EVERY horizon column plus H expiry rows each cancelling
    one column, and a single entity-keyed window computes all 2H
    running sums in one sort. Rows = |S| + |E|·(1+H), shuffles = 1,
    sorts = 1, independent of H's spread (a 7-day horizon costs the
    same as a 1-hour one).

    Skew profile matches ``pit_window_agg`` (entity-bounded
    partitions); memory per row grows by 2H longs/doubles — trivial.
    """
    from pyspark.sql import Window

    from hipipe_spark.operators.temporal import ts_seconds

    hs = [float(h) for h in horizons]
    if not hs or any(h <= 0 for h in hs):
        raise ValueError("horizons must be non-empty and positive")
    if len(set(hs)) != len(hs):
        raise ValueError("horizons must be distinct")
    labels = [f"{int(h)}s" for h in hs]
    if len(set(labels)) != len(labels):
        raise ValueError("horizons collide at whole-second labels")
    k_spine, k_exp, k_add = (0, 1, 2) if strict else (1, 2, 0)

    sec_e = ts_seconds(F.col(on))
    val = (F.coalesce(F.col(value_col).cast("double"), F.lit(0.0))
           if value_col else F.lit(0.0))
    dc = [f"__dc{i}" for i in range(len(hs))]
    dv = [f"__dv{i}" for i in range(len(hs))]

    # one add row: +1/+v in EVERY horizon column
    adds = events.select(
        F.col(by).alias("__e"), sec_e.alias("__t"),
        F.lit(k_add).alias("__k"),
        *[F.lit(1).cast("long").alias(c) for c in dc],
        *[val.alias(c) for c in dv])
    # H expiry rows: −1/−v in exactly one column
    deltas = adds
    for i, h in enumerate(hs):
        exp = adds.select(
            "__e", (F.col("__t") + F.lit(h)).alias("__t"),
            F.lit(k_exp).alias("__k"),
            *[(-F.col(c) if j == i else F.lit(0).cast("long")).alias(c)
              for j, c in enumerate(dc)],
            *[(-F.col(c) if j == i else F.lit(0.0)).alias(c)
              for j, c in enumerate(dv)])
        deltas = deltas.unionByName(exp)

    spine_cols = spine.columns
    s = spine.select(
        "*", F.col(by).alias("__e"), ts_seconds(F.col(on)).alias("__t"),
        F.lit(k_spine).alias("__k"),
        *[F.lit(0).cast("long").alias(c) for c in dc],
        *[F.lit(0.0).alias(c) for c in dv])
    d = deltas.select(
        *[F.lit(None).cast(spine.schema[c].dataType).alias(c)
          for c in spine_cols],
        "__e", "__t", "__k", *dc, *dv)

    w = (Window.partitionBy("__e").orderBy("__t", "__k")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = s.unionByName(d)
    out_cols = list(spine_cols)
    proj = u
    for i, lab in enumerate(labels):
        proj = proj.withColumn(f"{prefix}count_{lab}",
                               F.sum(dc[i]).over(w))
        out_cols.append(f"{prefix}count_{lab}")
        if value_col:
            proj = proj.withColumn(f"{prefix}sum_{lab}",
                                   F.round(F.sum(dv[i]).over(w), 6))
            out_cols.append(f"{prefix}sum_{lab}")
    return proj.filter(F.col("__k") == k_spine).select(*out_cols)


def pit_window_extrema(
    spine: DataFrame,
    events: DataFrame,
    by: str,
    value_col: str,
    on: str = "ts",
    horizon: float | None = 3600.0,
    strict: bool = True,
    aggs: Sequence[str] = ("max", "min"),
    prefix: str = "pit_",
) -> DataFrame:
    """Trailing-window MIN/MAX of ``value_col`` over the entity's
    events in ``[spine_ts − horizon, spine_ts)`` (strict) /
    ``[... , spine_ts]`` (lenient) — the extrema companion to
    :func:`pit_window_agg`. Empty window → null.

    Extrema are not delta-invertible (an expiring event can't be
    "subtracted" from a running max), so the running-sum trick doesn't
    apply. Instead, the PANES decomposition (the two-level sliding
    aggregation of Li et al. "No pane, no gain", SIGMOD Record 2005 —
    also Flink's slice-based window state): tile time into slices of
    width exactly ``horizon``; any trailing window of width
    ``horizon`` spans AT MOST two slices, splitting as

        [spine_ts − h, slice_start)   suffix of the PREVIOUS slice
        [slice_start, spine_ts)       prefix of the spine's OWN slice

    Each part is a running extreme over a (entity, slice)-keyed sorted
    window — the prefix part ascending, the suffix part descending with
    the spine's boundary row (ts − h) planted into the previous slice.
    Spine rows carry null values, so they never contribute to anyone's
    extreme (max/min ignore nulls). Cost: O(S+E) rows through two
    window sorts plus one narrow rejoin on (entity, ts) — never the
    O(S × density) pair materialization of the naive range join, and
    bounded per-task state (one slice of one entity), unlike a
    RANGE-frame window whose frame Spark re-scans per row.

    All boundary arithmetic runs in int64 MICROSECONDS (``horizon``
    is rounded to whole µs) — slice ids and window edges are
    fp-exact; ties at the exact boundary resolve by the documented
    rule, not rounding luck.

    ``horizon=None``: all-history running extreme — one entity-keyed
    window, one shuffle, no rejoin needed (still emitted via the same
    rejoin path for a single code shape).

    Reference contrast: hipipe's in-core ``transform`` with a mutable
    running-max lambda (test/core/stream/transform1.cpp's stateful
    idiom) is single-stream; this is that semantic made distributed,
    leakage-safe and boundary-exact.
    """
    from pyspark.sql import Window

    from hipipe_spark.operators.temporal import ts_seconds

    aggs = tuple(aggs)
    if not aggs or any(a not in ("max", "min") for a in aggs):
        raise ValueError(f"aggs must be drawn from max/min, got {aggs!r}")
    fns = {"max": F.max, "min": F.min}

    tu = F.round(ts_seconds(F.col(on)) * 1e6).cast("long")
    k_probe, k_event = (0, 1) if strict else (1, 0)

    ev = events.select(F.col(by).alias("__e"), tu.alias("__tu"),
                       F.col(value_col).cast("double").alias("__v"))
    probes = (spine.select(F.col(by).alias("__e"), tu.alias("__tu"))
              .distinct())

    if horizon is None:
        u = (probes.select("__e", "__tu", F.lit(k_probe).alias("__k"),
                           F.lit(None).cast("double").alias("__v"))
             .unionByName(ev.select(
                 "__e", "__tu", F.lit(k_event).alias("__k"), "__v")))
        w = (Window.partitionBy("__e").orderBy("__tu", "__k")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        res = u.select(
            "__e", "__tu", "__k",
            *[fns[a]("__v").over(w).alias(f"{prefix}{a}") for a in aggs]
        ).filter(F.col("__k") == k_probe).drop("__k")
    else:
        h_us = int(round(float(horizon) * 1e6))
        if h_us <= 0:
            raise ValueError("horizon must be positive")
        # exact slice id: remove the remainder first, then divide
        sl = ((F.col("__tu") - F.pmod(F.col("__tu"), F.lit(h_us)))
              / F.lit(h_us)).cast("long")
        ev_s = ev.withColumn("__sl", sl)

        # prefix part: running extreme within the spine's own slice,
        # ascending; strict puts the probe BEFORE same-ts events
        pre_u = (probes.select(
                     "__e", "__tu", sl.alias("__sl"),
                     F.lit(k_probe).alias("__k"),
                     F.lit(None).cast("double").alias("__v"))
                 .unionByName(ev_s.select(
                     "__e", "__tu", "__sl",
                     F.lit(k_event).alias("__k"), "__v")))
        w_pre = (Window.partitionBy("__e", "__sl").orderBy("__tu", "__k")
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
        pre = pre_u.select(
            "__e", "__tu", "__k",
            *[fns[a]("__v").over(w_pre).alias(f"__pre_{a}") for a in aggs]
        ).filter(F.col("__k") == k_probe).drop("__k")

        # suffix part: the probe's boundary row (ts − h) planted in the
        # PREVIOUS slice; descending running extreme. Events AT the
        # boundary are inside the window (left-inclusive) for strict
        # and lenient alike, so events always sort before the probe.
        suf_u = (probes.select(
                     "__e", "__tu",
                     (F.col("__tu") - F.lit(h_us)).alias("__bu"))
                 .select("__e", "__tu", F.col("__bu").alias("__su"),
                         ((F.col("__bu") - F.pmod(F.col("__bu"),
                                                  F.lit(h_us)))
                          / F.lit(h_us)).cast("long").alias("__sl"),
                         F.lit(1).alias("__k"),
                         F.lit(None).cast("double").alias("__v"))
                 .unionByName(ev_s.select(
                     "__e", F.lit(None).cast("long").alias("__tu"),
                     F.col("__tu").alias("__su"), "__sl",
                     F.lit(0).alias("__k"), "__v")))
        w_suf = (Window.partitionBy("__e", "__sl")
                 .orderBy(F.col("__su").desc(), F.col("__k").asc())
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
        suf = suf_u.select(
            "__e", "__tu", "__k",
            *[fns[a]("__v").over(w_suf).alias(f"__suf_{a}") for a in aggs]
        ).filter(F.col("__k") == 1).drop("__k")

        comb = {"max": F.greatest, "min": F.least}
        res = pre.join(suf, on=["__e", "__tu"], how="inner").select(
            "__e", "__tu",
            *[comb[a](F.col(f"__pre_{a}"), F.col(f"__suf_{a}"))
              .alias(f"{prefix}{a}") for a in aggs])

    out = spine.withColumn("__tu", tu).withColumn("__e", F.col(by))
    res = res.withColumnRenamed("__e", "__re")
    joined = out.join(
        res, (out["__e"] == res["__re"]) & (out["__tu"] == res["__tu"]),
        "left").drop(res["__tu"])
    return joined.drop("__e", "__re", "__tu")
