"""Event-sequence analytics: funnels and cohort retention.

The reference pipeline stops at row/column transforms; a production
events table also gets asked the two classic sequence questions —
"how many users completed step A, then B, then C?" (funnel) and "of
the users who arrived in period P, how many were still active k
periods later?" (cohort retention). Both are expressed as chained
hash aggregates on the entity key — no windows over the corpus, no
per-row Python — so they keep the map-side-combine scale shape of
the rest of the engine.

Reference contrast: hipipe's column transforms
(``include/hipipe/core/stream/transform.hpp``) see one in-core batch
and cannot relate rows across an entity's history; these operators
exist only because Spark's shuffle makes the entity regroup cheap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hipipe_spark.operators.temporal import ts_seconds


def funnel(events: DataFrame, steps: Sequence[str],
           key: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts",
           within_s: float | None = None) -> DataFrame:
    """Ordered-funnel table: one row per step with ``step`` (1-based),
    ``name``, ``n_users`` (entities whose EARLIEST completion of steps
    1..k is ordered ``t1 ≤ t2 ≤ … ≤ tk``), and ``conv_rate`` =
    n_users(step k) / n_users(step 1). ``within_s`` additionally
    requires the whole chain to finish within that many seconds of
    step 1 (the classic "signup → first query → first export within
    7 days").

    Completion uses the standard greedy-earliest rule: step k's time
    is the MIN event time of type ``steps[k]`` at/after step k-1's
    time — the earliest possible completion, so a user is counted iff
    ANY ordered subsequence exists.

    Plan: one filtered min-aggregate per step, each joined to the
    previous step's per-entity time (k-1 equi-joins on the
    high-cardinality entity key, broadcast-eligible as the funnel
    narrows); each step's scan carries a pushed type filter. The
    result is ONE lazy plan (a k-row union of scalar counts + a
    k-row window for the conversion rate) — no eager driver-side
    counting, so callers compose it like any other operator. Step k's
    branch re-derives steps 1..k-1 inside the union; with small k the
    repeated subplans are filtered scans + shrinking aggregates, and
    exchange reuse collapses the shared prefixes.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    es = ts_seconds(F.col(ts_col))
    prev = None
    parts = []
    for i, s in enumerate(steps):
        stage = events.filter(F.col(type_col) == s).select(
            F.col(key).alias("__k"), es.alias("__ts"))
        if prev is None:
            cur = stage.groupBy("__k").agg(F.min("__ts").alias("__t"))
            cur = cur.withColumn("__t0", F.col("__t"))
        else:
            cur = (stage.join(prev, "__k")
                   .filter(F.col("__ts") >= F.col("__t"))
                   .groupBy("__k", "__t0")
                   .agg(F.min("__ts").alias("__t")))
        if within_s is not None and i > 0:
            cur = cur.filter(
                F.col("__t") - F.col("__t0") <= F.lit(float(within_s)))
        parts.append(cur.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(i + 1).alias("step"), F.lit(s).alias("name"), "n_users"))
        prev = cur.select("__k", "__t", "__t0")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = (Window.orderBy("step")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    base = F.max(F.when(F.col("step") == 1, F.col("n_users"))).over(w)
    return out.withColumn(
        "conv_rate",
        F.when(base > 0, F.round(F.col("n_users") / base, 6)))


def cohort_retention(events: DataFrame, key: str = "user_id",
                     ts_col: str = "ts",
                     period_s: float = 604800.0) -> DataFrame:
    """Cohort-retention triangle: entities are bucketed by their FIRST
    event period (``cohort`` — epoch-seconds divided by ``period_s``,
    engine-portable, no calendar arithmetic), and each later period of
    activity increments ``age`` = period − cohort. Returns one row per
    (cohort, age): ``n_active`` distinct entities plus ``retention`` =
    n_active / cohort size (age 0 row is the cohort size itself,
    retention 1.0).

    Plan: one per-entity min aggregate (cohort assignment), one
    distinct on (entity, period), one broadcast-scale join back, one
    count aggregate — every shuffle keys on the entity or the
    dimension-sized (cohort, age) pair.
    """
    es = ts_seconds(F.col(ts_col))
    period = F.floor(es / F.lit(float(period_s))).cast("bigint")
    acts = (events.select(F.col(key).alias("__k"),
                          period.alias("__p")).distinct())
    first = acts.groupBy("__k").agg(F.min("__p").alias("__cohort"))
    joined = acts.join(first, "__k").select(
        "__k", "__cohort", (F.col("__p") - F.col("__cohort")).alias("__age"))
    per_cell = (joined.groupBy(F.col("__cohort").alias("cohort"),
                               F.col("__age").alias("age"))
                .agg(F.countDistinct("__k").alias("n_active")))
    size = (per_cell.filter(F.col("age") == 0)
            .select("cohort", F.col("n_active").alias("__size")))
    return (per_cell.join(size, "cohort")
            .select("cohort", "age",
                    F.col("n_active").cast("bigint").alias("n_active"),
                    F.round(F.col("n_active") / F.col("__size"), 6)
                     .alias("retention")))


def sliding_distinct(events: DataFrame, key: str = "user_id",
                     ts_col: str = "ts", window_s: float = 604800.0,
                     slide_s: float = 86400.0,
                     approximate: bool = False) -> DataFrame:
    """Distinct active entities per SLIDING window — the rolling
    "7-day active users, daily" series a tumbling groupBy can't
    produce (windows overlap) and a naive self-join produces at
    O(|events|·windows). Windows are aligned at multiples of
    ``slide_s``; window ``i`` covers ``[i·slide, i·slide + window)``.
    Returns ``(window_start_s, window_end_s, n_active)`` for every
    window that saw at least one event.

    Exact mode: each event explodes into the ``window/slide`` windows
    containing it (a small CONSTANT fan-out — 7 for the weekly/daily
    case, independent of corpus size), then one distinct + count per
    window. ``approximate=True`` is the 100-TB path: ONE Datasketches
    HLL sketch per slide bucket (no row fan-out — the stream
    aggregates straight to ``n_buckets`` sketch rows), window counts
    by unioning each window's ``window/slide`` bucket sketches —
    mergeability is the whole point of the sketch."""
    es = ts_seconds(F.col(ts_col))
    s = F.lit(float(slide_s))
    i_min = (F.floor((es - F.lit(float(window_s))) / s) + 1).cast("long")
    i_max = F.floor(es / s).cast("long")
    if approximate:
        bucket = i_max  # the event's own slide bucket
        sk = (events.select(F.col(key).alias("__k"), bucket.alias("__b"))
              .groupBy("__b").agg(F.hll_sketch_agg("__k").alias("__sk")))
        r = int(round(window_s / slide_s))
        # window w spans buckets [w, w+r-1] => bucket b feeds windows
        # [b-r+1, b]
        wins = sk.select(
            F.explode(F.sequence(F.col("__b") - r + 1,
                                 F.col("__b"))).alias("__w"),
            "__sk")
        out = wins.groupBy("__w").agg(
            F.hll_sketch_estimate(F.hll_union_agg("__sk"))
             .alias("n_active"))
    else:
        ev = events.select(F.col(key).alias("__k"),
                           F.explode(F.sequence(i_min, i_max))
                            .alias("__w"))
        out = (ev.distinct()
               .groupBy("__w")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_active")))
    return out.select(
        F.round(F.col("__w") * s, 6).alias("window_start_s"),
        F.round(F.col("__w") * s + F.lit(float(window_s)), 6)
         .alias("window_end_s"),
        "n_active")


def cooccurrence(df: DataFrame, group: str = "conv_id",
                 item: str = "tool",
                 min_group_count: int = 1,
                 ndigits: int = 6) -> DataFrame:
    """Item co-occurrence / association stats: for every unordered
    pair of items that appear in the same group ("conversations that
    call web_search also call code_exec — how often, and is that more
    than chance?"), emit::

        item_a, item_b, n_a, n_b, n_ab, support, conf_a_b, conf_b_a,
        lift

    with ``n_a`` = groups containing a, ``n_ab`` = groups containing
    both, ``support = n_ab / N`` (N = total groups with >= 1 item),
    ``conf_a_b = n_ab / n_a`` (P(b | a)), and
    ``lift = n_ab * N / (n_a * n_b)`` — lift > 1 means the pair
    attracts, < 1 repels. ``item_a < item_b`` canonicalizes the pair.

    Plan shape, scale-first: rows collapse to DISTINCT (group, item)
    first (one map-side-combinable shuffle), so the self-join fan-out
    is bounded by the number of distinct items per group squared —
    tool vocabularies are tens, never corpus-sized — and the final
    count is another hash agg. The denominators broadcast (item
    marginals: one row per item). Null/empty items are dropped before
    anything shuffles. ``min_group_count`` prunes long-tail items
    before the join (doc-frequency filter, same role as
    ``ngram_jaccard``'s max_df but from the other side).
    """
    gi = (df.select(F.col(group).alias("__g"), F.col(item).alias("__i"))
            .filter(F.col("__i").isNotNull() & (F.col("__i") != ""))
            .distinct())
    marg = gi.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    if min_group_count > 1:
        marg = marg.filter(F.col("__n") >= min_group_count)
        gi = gi.join(F.broadcast(marg.select("__i")), "__i")
    total = gi.agg(F.countDistinct("__g").alias("__N"))
    a = gi.select("__g", F.col("__i").alias("item_a"))
    b = gi.select("__g", F.col("__i").alias("item_b"))
    pairs = (a.join(b, "__g")
              .filter(F.col("item_a") < F.col("item_b"))
              .groupBy("item_a", "item_b")
              .agg(F.count(F.lit(1)).alias("n_ab")))
    out = (pairs
           .join(F.broadcast(marg.select(F.col("__i").alias("item_a"),
                                         F.col("__n").alias("n_a"))),
                 "item_a")
           .join(F.broadcast(marg.select(F.col("__i").alias("item_b"),
                                         F.col("__n").alias("n_b"))),
                 "item_b")
           .crossJoin(F.broadcast(total)))
    N = F.col("__N").cast("double")
    return out.select(
        "item_a", "item_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("n_ab").cast("bigint").alias("n_ab"),
        F.round(F.col("n_ab") / N, ndigits).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), ndigits).alias("conf_a_b"),
        F.round(F.col("n_ab") / F.col("n_b"), ndigits).alias("conf_b_a"),
        F.round(F.col("n_ab") * N / (F.col("n_a") * F.col("n_b")),
                ndigits).alias("lift"),
    )


def attribution(events: DataFrame, touch_types: Sequence[str],
                conversion_type: str, model: str = "linear",
                key: str = "user_id", type_col: str = "event_type",
                ts_col: str = "ts", tiebreak: str = "event_id") -> DataFrame:
    """Multi-touch attribution: distribute each conversion's credit
    over the touch events that preceded it (since the previous
    conversion — attribution windows never overlap).

    Models: ``first`` (all credit to the earliest touch), ``last``
    (latest touch), ``linear`` (1/n each), ``position`` (40% first,
    40% last, 20% spread over the middle; 100%/50-50 for 1/2 touches).

    Returns per-channel totals: ``(channel, n_touches, credit)`` —
    ``n_touches`` counts attributed touches, ``credit`` sums to the
    number of attributed conversions (conversions with >= 1 preceding
    touch) across channels.

    Plan: one window over ``key`` assigns every touch to the next
    conversion (running conversion count — no touch-x-conversion
    join), one window over (key, conversion) ranks touches for the
    positional models, one hash aggregate to channels. Two exchanges
    total, both on high-cardinality keys; no quadratic blowup on hot
    users because each touch lands in exactly one attribution window.
    """
    if model not in ("first", "last", "linear", "position"):
        raise ValueError(f"unknown attribution model {model!r}")
    is_conv = F.col(type_col) == conversion_type
    is_touch = F.col(type_col).isin(list(touch_types))
    order = [F.col(ts_col).asc(), F.col(tiebreak).asc()]
    wu = Window.partitionBy(key).orderBy(*order)

    base = (events
            .filter(is_conv | is_touch)
            .select(key, type_col, ts_col, tiebreak,
                    is_conv.cast("int").alias("is_conv")))
    # conversion id a touch belongs to = conversions seen so far + 1;
    # a conversion row closes its own window (running sum INCLUDES it)
    tagged = base.withColumn(
        "conv_id",
        F.sum("is_conv").over(wu.rowsBetween(Window.unboundedPreceding, 0))
        + (1 - F.col("is_conv")))
    n_convs = F.max(F.when(F.col("is_conv") == 1, F.col("conv_id"))
                    .otherwise(0)).over(Window.partitionBy(key))
    touches = (tagged.withColumn("n_convs", n_convs)
               .filter((F.col("is_conv") == 0)
                       & (F.col("conv_id") <= F.col("n_convs"))))

    wc = Window.partitionBy(key, "conv_id").orderBy(*order)
    wc_all = Window.partitionBy(key, "conv_id")
    ranked = (touches
              .withColumn("rk", F.row_number().over(wc))
              .withColumn("n", F.count(F.lit(1)).over(wc_all)))
    n = F.col("n").cast("double")
    if model == "first":
        credit = F.when(F.col("rk") == 1, 1.0).otherwise(0.0)
    elif model == "last":
        credit = F.when(F.col("rk") == F.col("n"), 1.0).otherwise(0.0)
    elif model == "linear":
        credit = F.lit(1.0) / n
    else:  # position: 40/20-split/40, degenerate 1 -> 100%, 2 -> 50/50
        credit = (F.when(F.col("n") == 1, 1.0)
                  .when(F.col("n") == 2, 0.5)
                  .when(F.col("rk") == 1, 0.4)
                  .when(F.col("rk") == F.col("n"), 0.4)
                  .otherwise(F.lit(0.2) / (n - 2)))
    return (ranked.withColumn("credit", credit)
            .groupBy(F.col(type_col).alias("channel"))
            .agg(F.count(F.lit(1)).alias("n_touches"),
                 F.round(F.sum("credit"), 6).alias("credit")))


def rfm_segments(df: DataFrame, key: str, ts_col: str, value: str,
                 n_tiles: int = 5,
                 ref_ts: str | None = None) -> DataFrame:
    """RFM segmentation (the classic CRM triad): per key, Recency =
    seconds from last activity to the corpus reference instant,
    Frequency = event count, Monetary = value sum — each scored into
    ``n_tiles`` quantile tiles (ntile over the KEY-dimension frame,
    never raw rows; recency tile 1 = most recent). One raw-data
    aggregate; three ntile windows on the per-key result.

    ``ref_ts``: ISO timestamp string for the "now" anchor; defaults
    to the corpus max(ts) (computed in the same aggregate pass, no
    extra scan). Ties inside ntile break by key (deterministic).

    Output: ``key, recency_s, frequency (bigint), monetary, r, f, m
    (ints), rfm (string like '125')``, ordered by key.
    """
    sec = F.col(ts_col).cast("timestamp").cast("double")
    per = df.groupBy(key).agg(
        F.max(sec).alias("__last"),
        F.count("*").alias("frequency"),
        F.round(F.sum(F.col(value).cast("double")), 4)
         .alias("monetary"))
    if ref_ts is None:
        anchor = per.agg(F.max("__last").alias("__now"))
        per = per.crossJoin(F.broadcast(anchor))
    else:
        per = per.withColumn(
            "__now", F.lit(ref_ts).cast("timestamp").cast("double"))
    per = per.withColumn(
        "recency_s", F.round(F.col("__now") - F.col("__last"), 6))
    w_r = Window.orderBy(F.col("recency_s").asc(), F.col(key))
    w_f = Window.orderBy(F.col("frequency").desc(), F.col(key))
    w_m = Window.orderBy(F.col("monetary").desc(), F.col(key))
    out = (per.withColumn("r", F.ntile(n_tiles).over(w_r))
           .withColumn("f", F.ntile(n_tiles).over(w_f))
           .withColumn("m", F.ntile(n_tiles).over(w_m)))
    return (out.select(
        key, "recency_s",
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary", "r", "f", "m",
        F.concat(F.col("r").cast("string"), F.col("f").cast("string"),
                 F.col("m").cast("string")).alias("rfm"))
        .orderBy(key))


def entropy_rate(df: DataFrame, key: str, token: str,
                 order: Sequence[str]) -> DataFrame:
    """Entropy rate of the token process (first-order Markov):
    ``H = −Σ_i π(i) Σ_j p(j|i) log2 p(j|i)`` over the observed
    transition matrix, with π the empirical source distribution of
    transition origins — how predictable is the next event given the
    current one, in bits. Complements the marginal event entropy:
    a process can have high marginal entropy yet near-zero rate
    (strict cycles).

    One lag window per key (bigram extraction) + two
    state²-dimension aggregates. Output: one row — ``n_transitions
    (bigint), h_marginal, h_rate, predictability`` (doubles rounded
    6; predictability = 1 − h_rate/h_marginal, null when marginal
    entropy is 0).
    """
    w = Window.partitionBy(key).orderBy(*order)
    big = (df.select(F.col(key).alias("__k"),
                     F.lag(F.col(token)).over(w).alias("__a"),
                     F.col(token).alias("__b"))
           .where(F.col("__a").isNotNull()))
    cells = big.groupBy("__a", "__b").agg(F.count("*").alias("n"))
    tot = cells.agg(F.sum("n").alias("nt"))
    # conditional entropy: Σ_ij (n_ij/N) log2(n_i./n_ij)
    w_a = Window.partitionBy("__a")
    rate_terms = cells.select(
        F.col("n"),
        (F.col("n") / F.sum("n").over(w_a)).alias("p_cond"))
    h_rate = rate_terms.agg(
        F.sum("n").alias("nt2"),
        F.sum(F.col("n") * -F.log2("p_cond")).alias("hr_num"))
    # marginal entropy of transition origins
    marg = (cells.groupBy("__a").agg(F.sum("n").alias("na"))
            .crossJoin(F.broadcast(tot))
            .agg(F.sum(F.col("na") * -F.log2(F.col("na") / F.col("nt")))
                 .alias("hm_num"),
                 F.first("nt").alias("nt3")))
    j = h_rate.crossJoin(F.broadcast(marg))
    hr = F.col("hr_num") / F.col("nt2")
    hm = F.col("hm_num") / F.col("nt3")
    return j.select(
        F.col("nt2").cast("bigint").alias("n_transitions"),
        F.round(hm, 6).alias("h_marginal"),
        F.round(hr, 6).alias("h_rate"),
        F.round(F.when(hm > 0, 1.0 - hr / hm), 6)
         .alias("predictability"))
