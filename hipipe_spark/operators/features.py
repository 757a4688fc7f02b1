"""Group-level distribution features and explicit label generation.

Two sides of the leakage line, kept in one module so the contrast is
documented where a user will read it:

- :func:`categorical_entropy` — a FEATURE: per-group Shannon entropy of
  a categorical column (role/tool/event-type mix of a conversation).
  Reads only rows of its own group, no temporal ordering involved.
- :func:`make_labels` — LABELS, not features: next-event gap and
  end-of-session flags read the FUTURE row via ``lead()``. They exist
  for supervised target construction; the leakage pytest suite pins
  that :func:`hipipe_spark.operators.flagship.featurize` never emits
  them. hipipe has no such distinction (its ``transform`` stages see
  whole in-core columns — reference ``stream/transform.hpp``); at
  feature-store scale the distinction is the whole game.

Scale notes: ``categorical_entropy`` is two map-side-combinable
aggregations (group×category, then group) — no window, no skew
hazard beyond the group key itself. ``make_labels`` is one window
sort per group, identical shape to lag/lead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hipipe_spark.operators.temporal import ts_seconds


def categorical_entropy(
    df: DataFrame,
    key: str,
    cat: str,
    out_prefix: str | None = None,
) -> DataFrame:
    """Per-``key`` Shannon entropy (nats) of the ``cat`` distribution.

    Returns one row per key: ``n`` (rows), ``n_cats`` (distinct
    categories), ``entropy`` = -Σ p·ln p, and ``norm_entropy`` =
    entropy / ln(n_cats) in [0, 1] (0.0 when only one category —
    the ln(1)=0 denominator is guarded, not divided).

    Entropy is computed as ln(n) - Σ c·ln(c) / n from the category
    counts, so the whole thing is two hash aggregations with map-side
    partial combine — no window, no per-row Python.
    """
    p = (out_prefix + "_") if out_prefix else ""
    counts = df.groupBy(key, cat).agg(F.count(F.lit(1)).alias("__c"))
    ent = F.round(
        F.log(F.sum("__c")) - F.sum(F.col("__c") * F.log("__c")) / F.sum("__c"),
        6,
    )
    n_cats = F.count(F.lit(1))
    return counts.groupBy(key).agg(
        F.sum("__c").cast("bigint").alias(f"{p}n"),
        n_cats.cast("int").alias(f"{p}n_cats"),
        ent.alias(f"{p}entropy"),
        F.when(n_cats > 1, F.round(
            (F.log(F.sum("__c")) - F.sum(F.col("__c") * F.log("__c")) / F.sum("__c"))
            / F.log(n_cats.cast("double")), 6))
        .otherwise(F.lit(0.0)).alias(f"{p}norm_entropy"),
    )


def make_labels(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    gap: float = 1800.0,
) -> DataFrame:
    """Attach supervised-target columns that deliberately read the
    future row: ``label_next_gap`` (seconds to the group's next event;
    null on the last), ``label_is_last`` (no later event exists) and
    ``label_session_end`` (next gap exceeds ``gap`` seconds, or last).

    These are LABELS — a model trained to predict session end needs
    them — and must never ride along as features: the leakage suite
    asserts ``featurize()`` output is disjoint from ``label_*``.
    ``order_cols`` breaks ts ties deterministically (pass turn_idx /
    event id).
    """
    w = Window.partitionBy(key).orderBy(
        ts_col, *order_cols
    )
    nxt: Column = F.lead(ts_seconds(F.col(ts_col))).over(w)
    next_gap = F.round(nxt - ts_seconds(F.col(ts_col)), 6)
    return (
        df.withColumn("label_next_gap", next_gap)
        .withColumn("label_is_last", nxt.isNull())
        .withColumn(
            "label_session_end",
            nxt.isNull() | (next_gap > F.lit(float(gap))),
        )
    )


def lift_table(df: DataFrame, score: str, label: str, n_bins: int = 10,
               exact: bool = False) -> DataFrame:
    """Decile/lift report for a score against a binary label: one row
    per quantile bin of ``score`` (bin ``n_bins - 1`` = highest scores)
    with ``n``, ``n_pos``, ``rate``, ``lift`` (bin rate / overall
    rate), and top-down cumulative ``cum_n`` / ``cum_rate`` /
    ``cum_lift`` — the table a ranking-model review starts from, and a
    drift check when recomputed per data slice.

    Plan: quantile edges via :func:`~hipipe_spark.operators.encoders.
    fit_buckets` (``exact=False`` → mergeable percentile_approx sketch,
    the 100-TB path), bin assignment as a broadcast scan-local
    expression, then ONE map-side-combinable aggregate to ``n_bins``
    rows. The cumulative window runs over those ``n_bins`` rows —
    dimension-sized by construction, single partition is free. Overall
    rate comes from a window total over the same rows: no driver-side
    collect, no second pass over the data."""
    from hipipe_spark.operators.encoders import apply_buckets, fit_buckets

    bounds = fit_buckets(df, [score], n_buckets=n_bins, exact=exact)
    binned = apply_buckets(df, bounds, [score])
    lbl = F.col(label).cast("double")
    per_bin = (binned
               .filter(F.col(f"{score}_bin").isNotNull())
               .groupBy(F.col(f"{score}_bin").cast("int").alias("bin"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(lbl).cast("long").alias("n_pos")))
    all_w = Window.partitionBy()
    cum_w = Window.partitionBy().orderBy(F.desc("bin")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    overall = F.sum("n_pos").over(all_w) / F.sum("n").over(all_w)
    rate = F.col("n_pos") / F.col("n")
    cum_rate = F.sum("n_pos").over(cum_w) / F.sum("n").over(cum_w)
    return (per_bin
            .withColumn("rate", F.round(rate, 6))
            .withColumn("lift", F.when(overall > 0,
                                       F.round(rate / overall, 6)))
            .withColumn("cum_n", F.sum("n").over(cum_w))
            .withColumn("cum_rate", F.round(cum_rate, 6))
            .withColumn("cum_lift", F.when(overall > 0,
                                           F.round(cum_rate / overall, 6)))
            .orderBy(F.desc("bin")))


def conv_tempo(df: DataFrame, key: str = "conv_id", ts_col: str = "ts",
               order_cols: tuple[str, ...] = ("turn_idx",)) -> DataFrame:
    """Per-conversation pacing features: ``n_turns``, ``duration_s``,
    inter-turn gap stats (``mean_gap`` / ``std_gap`` / ``max_gap``,
    sample stddev — null under two gaps, like the SQL twin) and
    ``burstiness`` = (σ-μ)/(σ+μ) in [-1, 1] (−1 = metronome, →1 =
    bursty; null when σ+μ is 0 or gaps are missing). These are
    GROUP-level features: join them back to turns only for models that
    may legitimately see the whole conversation (retrieval filtering,
    corpus curation) — they read every turn's timestamp, including
    the future, so the leakage suite keeps them out of
    :func:`~hipipe_spark.operators.flagship.featurize`.

    Plan: one window sort per conversation for the lag gap (bounded by
    conversation length — the same shape and skew profile as lag/lead),
    then one map-side-combinable aggregate. No per-row Python."""
    w = Window.partitionBy(key).orderBy(ts_col, *order_cols)
    es = ts_seconds(F.col(ts_col))
    gap = es - F.lag(es).over(w)
    g = df.select(key, es.alias("__es"), gap.alias("__gap"))
    mu, sd = F.avg("__gap"), F.stddev_samp("__gap")
    return (g.groupBy(key)
            .agg(F.count(F.lit(1)).cast("int").alias("n_turns"),
                 F.round(F.max("__es") - F.min("__es"), 6).alias("duration_s"),
                 F.round(mu, 6).alias("mean_gap"),
                 F.round(sd, 6).alias("std_gap"),
                 F.round(F.max("__gap"), 6).alias("max_gap"),
                 F.when((mu + sd) > 0,
                        F.round((sd - mu) / (sd + mu), 6))
                 .alias("burstiness")))


def turn_similarity(
    df: DataFrame,
    text_col: str = "text",
    key: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    role_col: str | None = "role",
    cap: int = 256,
) -> DataFrame:
    """Consecutive-turn edit-distance features — the assistant-loop /
    echo detector. For every turn: Levenshtein distance and normalized
    similarity against (a) the previous turn in the conversation and
    (b) the previous turn by the SAME role (``role_col``; pass None to
    skip). High same-role similarity across many turns is the classic
    degenerate-model signature ("the assistant repeats itself"); high
    cross-role similarity flags tool echo chains. Complements the
    WITHIN-document Gopher repetition stats in
    :mod:`hipipe_spark.functions.text` (`dup_ngram_frac` et al.) —
    this one reads ACROSS turns, never inside one.

    ``sim_prev`` = 1 − lev / max(len_a, len_b, 1) in [0, 1]; 1.0 means
    byte-identical (after the cap), null on the first turn.

    Scale notes: texts are capped to ``cap`` chars BEFORE the distance
    — Levenshtein is O(len²) per row, so the cap bounds worst-case
    per-row cost no matter what a 100 TB corpus contains (a 1 MB tool
    dump would otherwise own the task). Both windows partition by
    conversation (± role), so partitions stay conversation-bounded —
    the lag/lead skew profile, no global sort. All JVM expressions;
    no Python.

    Reference contrast: hipipe's ``transform`` sees one in-core batch
    (``stream/transform.hpp``) — cross-row text comparison would need
    its buffered column view; here it is one window lag.
    """
    t = F.substring(F.col(text_col), 1, cap)
    order = [F.col(o) for o in order_cols]
    w = Window.partitionBy(key).orderBy(*order)
    out = df.withColumn("__t", t)
    prev = F.lag("__t").over(w)
    lev = F.levenshtein(F.col("__t"), prev)
    sim = F.lit(1.0) - lev / F.greatest(
        F.length("__t"), F.length(prev), F.lit(1))
    out = (out.withColumn("lev_prev", lev.cast("int"))
              .withColumn("sim_prev", F.round(sim, 6)))
    if role_col is not None:
        wr = Window.partitionBy(key, role_col).orderBy(*order)
        prev_r = F.lag("__t").over(wr)
        lev_r = F.levenshtein(F.col("__t"), prev_r)
        sim_r = F.lit(1.0) - lev_r / F.greatest(
            F.length("__t"), F.length(prev_r), F.lit(1))
        out = (out.withColumn("lev_prev_role", lev_r.cast("int"))
                  .withColumn("sim_prev_role", F.round(sim_r, 6)))
    return out.drop("__t")


def feature_corr(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation over numeric feature columns in ONE
    scan — the feature-QA pass run before training (near-duplicate
    features inflate importance and waste width; |corr| ≈ 1 pairs get
    pruned). Returns one row per unordered pair: ``col_a``, ``col_b``,
    ``n_pairs`` (rows where both are non-null), ``corr`` (rounded 6,
    null when either side is constant).

    Plan: all d·(d−1)/2 ``F.corr`` aggregates evaluate in a single
    map-side-combinable pass over the input — one scan at any corpus
    size, reduced state is O(d²) scalars. The pair melt happens on the
    ONE-row aggregate result, not the corpus. For wide d (hundreds of
    columns) assemble an array column and use
    :func:`hipipe_spark.operators.decomposition.covariance_matrix`
    instead — same single-scan shape, BLAS per batch.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = []
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        # covar/stddev instead of F.corr: under ANSI mode (Spark 4
        # default) Corr THROWS DIVIDE_BY_ZERO on a zero-variance
        # column; the F.when guard short-circuits the division and
        # yields the same null-on-constant semantics as DuckDB corr().
        xa = F.when(both, F.col(a))
        xb = F.when(both, F.col(b))
        cov = F.covar_samp(xa, xb)
        sa, sb = F.stddev_samp(xa), F.stddev_samp(xb)
        aggs.append(
            F.when((sa > 0) & (sb > 0), cov / (sa * sb))
            .alias(f"__r__{a}__{b}"))
        aggs.append(F.count(F.when(both, 1)).alias(f"__n__{a}__{b}"))
    row = df.agg(*aggs)
    melted = F.array(*[
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__n__{a}__{b}").cast("bigint").alias("n_pairs"),
            F.round(F.col(f"__r__{a}__{b}"), 6).alias("corr"),
        )
        for a, b in pairs
    ])
    return row.select(F.inline(melted))


def _avg_ranks(df: DataFrame, col: str,
               n_partitions: int | None = None) -> DataFrame:
    """(value, average rank) over a column's rows — DISTRIBUTED average
    rank with no single-task sort. ``rank() over (order by col)`` moves
    every row through one task; instead the distinct-value COUNT table
    is range-partitioned by value, the per-partition count sums (a
    driver-sized vector, one long per partition — the
    ``generate_groups`` two-phase recipe) become offsets, and
    ``avg_rank(v) = offset + running count − (n_v − 1)/2`` (ties get
    the midpoint rank, scipy convention). Returns ``(__v, __rk)``;
    caller owns the persisted range layout via ``release_cached``."""
    from hipipe_spark.operators.core import register_cached
    counts = (df.select(F.col(col).alias("__v"))
              .filter(F.col("__v").isNotNull())
              .groupBy("__v").agg(F.count(F.lit(1)).alias("__n")))
    n_parts = int(n_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    ranged = (counts.repartitionByRange(n_parts, "__v")
              .withColumn("__pid", F.spark_partition_id()).persist())
    psums = {r["__pid"]: r["s"] for r in
             ranged.groupBy("__pid").agg(F.sum("__n").alias("s")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(psums):
        offsets[pid] = acc
        acc += psums[pid]
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid int, __off long")
    w = (Window.partitionBy("__pid").orderBy("__v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.col("__off") + F.sum("__n").over(w)
    return register_cached(
        ranged.join(F.broadcast(off_df), "__pid")
        .select("__v",
                (cum.cast("double") - (F.col("__n") - 1) / 2.0)
                .alias("__rk")),
        ranged)


def spearman_corr(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Spearman rank correlation — :func:`feature_corr`'s
    robust sibling (monotone association, immune to the heavy-tailed
    magnitudes that dominate Pearson on length/latency features).
    Listwise-complete semantics: rows with a null in ANY of ``cols``
    are dropped first, then each column is ranked (average ranks for
    ties) and Pearson runs on the ranks. One row per unordered pair:
    ``col_a, col_b, n_pairs, rho`` (rounded 6, null when a rank column
    is constant).

    Plan: per column, one distinct-count shuffle + the two-phase
    range-partitioned average rank (:func:`_avg_ranks` — no
    single-task sort anywhere) + one value-equi-join of the
    dimension-of-distinct-values rank table back onto the rows (AQE
    broadcasts it when small); then ALL pairs aggregate in the single
    map-side-combinable pass of :func:`feature_corr`. d columns cost
    d rank passes + one scan — no d² shuffles.
    """
    from hipipe_spark.operators.core import register_cached
    base = df.select(*cols)
    for c in cols:
        base = base.filter(F.col(c).isNotNull())
    base = base.persist()
    cached = [base]
    ranked = base
    for c in cols:
        rk = _avg_ranks(base, c)
        cached.extend(getattr(rk, "_hipipe_cached", ()))
        ranked = ranked.join(
            rk.withColumnRenamed("__v", c)
              .withColumnRenamed("__rk", f"__rk_{c}"), c)
    rank_view = ranked.select(*[F.col(f"__rk_{c}").alias(c) for c in cols])
    out = feature_corr(rank_view, cols).withColumnRenamed("corr", "rho")
    return register_cached(out, *cached)


def mad_outliers(df: DataFrame, group: str, value: str,
                 threshold: float = 3.5, exact: bool = False,
                 accuracy: int = 10000, out: str = "is_outlier",
                 ndigits: int = 6) -> DataFrame:
    """Per-group robust outlier flags via the modified z-score
    (Iglewicz & Hoaglin): ``rz = 0.6745 (x − median_g) / MAD_g``,
    flagged when ``|rz| > threshold`` — the data-quality pass that a
    mean/std z-score can't do, because the outliers being hunted
    corrupt the mean/std themselves. Adds ``rz`` (null when the group
    MAD is 0 — degenerate group, more than half identical) and the
    boolean ``out`` flag.

    Plan: two group aggregates (median, then median of |x − med|) and
    two joins of the group-dimension stat tables back onto the rows —
    AQE broadcasts them; the row side never shuffles. ``exact=True``
    uses exact interpolated percentiles (oracle-grade); the default
    approx sketch is the 100-TB path (same split as
    :func:`hipipe_spark.operators.encoders.fit_robust_scaler`).
    """
    x = F.col(value).cast("double")
    def _median(col):
        return (F.percentile(col, F.lit(0.5)) if exact
                else F.percentile_approx(col, 0.5, accuracy))
    med = df.groupBy(group).agg(_median(x).alias("__med"))
    j = df.join(med, group)
    mad = (j.groupBy(group)
           .agg(_median(F.abs(x - F.col("__med"))).alias("__mad")))
    rz = F.when(F.col("__mad") > 0,
                0.6745 * (x - F.col("__med")) / F.col("__mad"))
    return (j.join(mad, group)
            .withColumn("rz", F.round(rz, ndigits))
            .withColumn(out, F.coalesce(F.abs("rz") > threshold,
                                        F.lit(False)))
            .drop("__med", "__mad"))


def future_window_label(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    horizon_s: float = 3600.0,
    value: str | None = None,
    prefix: str = "label_",
) -> DataFrame:
    """Horizon labels that deliberately read the future: for each row,
    the count (and, with ``value``, the sum) of STRICTLY-LATER rows of
    the same ``key`` within ``(ts, ts + horizon_s]`` — "does the user
    come back within the hour", "how many tool calls follow in the
    next 5 minutes". Like :func:`make_labels`, these are targets, not
    features: the leakage suite pins ``featurize()`` output disjoint
    from ``label_*``.

    Strict futurity with a RANGE frame: Spark range frames are
    boundary-inclusive, so ``[0, h]`` minus ``[0, 0]`` (the row's own
    ts tie group, itself included) leaves ``(0, h]`` exactly — ties at
    the row's own timestamp never count as future. One
    conversation-bounded window sort shared by both frames; no
    self-join, no shuffle beyond the key exchange.
    """
    from hipipe_spark.operators.temporal import ts_seconds
    es = ts_seconds(F.col(ts_col))
    base = Window.partitionBy(key).orderBy(es)
    w_h = base.rangeBetween(0, int(horizon_s))
    w_0 = base.rangeBetween(0, 0)
    out = df.withColumn(
        f"{prefix}future_count",
        (F.count(F.lit(1)).over(w_h) - F.count(F.lit(1)).over(w_0))
        .cast("bigint"))
    if value is not None:
        x = F.col(value).cast("double")
        diff = (F.coalesce(F.sum(x).over(w_h), F.lit(0.0))
                - F.coalesce(F.sum(x).over(w_0), F.lit(0.0)))
        out = out.withColumn(
            f"{prefix}future_sum",
            F.when(F.col(f"{prefix}future_count") > 0,
                   F.round(diff, 6)).otherwise(F.lit(0.0)))
    return out


def role_streak(
    df: DataFrame,
    col: str = "role",
    key: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
) -> DataFrame:
    """Run-length (gaps-and-islands) features over a categorical turn
    column: ``{col}_streak`` — how many consecutive turns (including
    this one) carry the same value — and ``{col}_island`` — the
    0-based index of the run within the conversation. Five identical
    ``role='tool'`` rows in a row show ``streak 1..5`` on one island;
    paired with :func:`turn_similarity` this is the degenerate
    agent-loop detector (same role, same text, long streak).

    The classic two-window identity: ``island = row_number − per-value
    row_number`` is constant within a run and distinct across runs of
    the same value; streak position is a row_number inside
    ``(key, value, island)``. Islands are renumbered 0..n by dense
    ordering of their first row so the id is stable and compact. All
    three windows share the conversation exchange — partition sizes
    stay conversation-bounded at any corpus size.
    """
    order = [F.col(o) for o in order_cols]
    w_all = Window.partitionBy(key).orderBy(*order)
    w_val = Window.partitionBy(key, col).orderBy(*order)
    marker = (F.row_number().over(w_all)
              - F.row_number().over(w_val))
    out = df.withColumn("__mk", marker)
    w_run = Window.partitionBy(key, col, "__mk").orderBy(*order)
    out = out.withColumn(f"{col}_streak", F.row_number().over(w_run))
    # island index = number of run STARTS seen so far in the conv - 1
    is_start = (F.col(f"{col}_streak") == 1).cast("int")
    out = out.withColumn(
        f"{col}_island",
        (F.sum(is_start).over(
            w_all.rowsBetween(Window.unboundedPreceding, 0)) - 1)
        .cast("int"))
    return out.drop("__mk")


def lag_autocorr(
    df: DataFrame,
    value: str,
    key: str = "conv_id",
    lag: int = 1,
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    round_to: int = 6,
) -> DataFrame:
    """Per-key lag-k autocorrelation of a numeric turn series — the
    rhythm detector: gap series with strong lag-1 autocorrelation =
    machine-paced retries; near zero = human burstiness. Returns one
    row per key: ``n_pairs`` (non-null (x, lag(x)) pairs) and
    ``autocorr`` = Pearson r between the series and its lag (null when
    fewer than 2 pairs or zero variance — undefined, not 0).

    One conversation-bounded window (the lag) + one hash aggregate
    (covar/stddev are single-pass central-moment aggregates with
    map-side partial combine) — partition sizes stay
    conversation-bounded. Pearson r is assembled as
    ``try_divide(covar_samp, stddev*stddev)`` rather than ``F.corr``:
    under Spark 4 ANSI mode ``corr`` THROWS DIVIDE_BY_ZERO on a
    zero-variance series instead of returning null."""
    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(key).orderBy(*order)
    x = F.col(value).cast("double")
    out = df.withColumn("__xl", F.lag(x, lag).over(w))
    pair = x.isNotNull() & F.col("__xl").isNotNull()
    # mask both sides to pair rows so the stddevs see exactly the
    # rows covar_samp sees
    xm = F.when(pair, x)
    ym = F.when(pair, F.col("__xl"))
    r = F.try_divide(F.covar_samp(xm, ym),
                     F.stddev_samp(xm) * F.stddev_samp(ym))
    return (out.groupBy(key)
            .agg(F.sum(pair.cast("int")).cast("bigint")
                  .alias("n_pairs"),
                 F.round(r, round_to).alias("autocorr")))


def hbos_fit(df: DataFrame, feature_cols: list[str],
             n_bins: int = 16) -> dict:
    """Fit the equal-width histograms for :func:`hbos_scores`
    (Goldstein & Dengel, "Histogram-based Outlier Score", KI 2012).
    Returns a plain-python model ``{col: {"min", "width", "logp":
    [per-bin -ln(count/max_count)]}}`` suitable for baking into a
    plan (and into an oracle) as literals.

    Exactly TWO corpus scans — the algorithm's lower bound for exact
    equal-width bins: (1) one aggregate row of per-feature min/max;
    (2) one aggregate row of n_features x n_bins conditional counts
    (map-side-combinable; no explode, no shuffle of fact rows). Both
    collect() sites are dimension-sized by contract (one row each).
    Degenerate features (min == max) get a single all-mass bin —
    their score contribution is 0 for every row.
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    mm = df.agg(*[a for c in feature_cols
                  for a in (F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                            F.max(F.col(c).cast("double")).alias(f"mx_{c}"))]
                ).collect()[0]
    aggs, meta = [], {}
    for c in feature_cols:
        mn, mx = mm[f"mn_{c}"], mm[f"mx_{c}"]
        if mn is None:
            raise ValueError(f"hbos_fit: feature {c!r} is all-null")
        width = (mx - mn) / n_bins if mx > mn else 1.0
        meta[c] = (float(mn), float(width), mx > mn)
        x = F.col(c).cast("double")
        # least/greatest SKIP nulls in Spark — guard explicitly or a
        # null value silently lands in an edge bin
        b = F.when(x.isNotNull(),
                   F.least(F.lit(n_bins - 1),
                           F.floor((x - F.lit(mn))
                                   / F.lit(width)).cast("int")))
        for i in range(n_bins):
            aggs.append(F.sum(F.when(b == i, 1).otherwise(0))
                         .alias(f"c_{c}_{i}"))
    counts = df.agg(*aggs).collect()[0]
    model = {}
    for c in feature_cols:
        mn, width, spread = meta[c]
        if not spread:
            model[c] = {"min": mn, "width": width, "logp": [0.0]}
            continue
        cs = [int(counts[f"c_{c}_{i}"] or 0) for i in range(n_bins)]
        peak = max(cs)
        import math
        model[c] = {
            "min": mn, "width": width,
            # -ln(count/peak); empty bins get None — a row can only
            # land there in transform mode (data it wasn't fit on)
            "logp": [None if v == 0 else math.log(peak) - math.log(v)
                     for v in cs],
        }
    return model


def hbos_scores(df: DataFrame, feature_cols: list[str],
                model: dict | None = None, n_bins: int = 16,
                out: str = "hbos", round_to: int = 6) -> DataFrame:
    """Histogram-based outlier score: ``hbos = Σ_f -ln(p_f(bin_f(x)))``
    with each feature's histogram normalized to its peak bin (the
    paper's convention — a row in every feature's modal bin scores
    0). Higher = more anomalous. The fast unsupervised outlier pass
    for training-data quality filtering: linear, no pairwise
    distances, features treated independently.

    Scoring is a pure JVM projection — the fitted per-bin log-scores
    are literals (``element_at`` on a baked array), so the scan is
    narrow, shuffle-free, and oracle-reproducible. Rows landing in an
    EMPTY bin (only possible when scoring data the model wasn't fit
    on) get a null score rather than an arbitrary cap — callers
    decide the policy. Null feature values score null.
    """
    if model is None:
        model = hbos_fit(df, feature_cols, n_bins)
    total: Column = F.lit(0.0)
    for c in feature_cols:
        m = model[c]
        logp = m["logp"]
        if len(logp) == 1:  # degenerate feature: contributes 0
            contrib = F.when(F.col(c).isNotNull(), F.lit(0.0))
        else:
            x = F.col(c).cast("double")
            # same null guard as hbos_fit: least/greatest skip nulls
            b = F.when(
                x.isNotNull(),
                F.least(F.lit(len(logp) - 1),
                        F.greatest(F.lit(0),
                                   F.floor((x - F.lit(m["min"]))
                                           / F.lit(m["width"]))
                                    .cast("int"))))
            arr = F.array(*[F.lit(v).cast("double") for v in logp])
            # gate on the value, not on element_at's null index
            # propagation — Catalyst folds element_at over a
            # constant array of equal values to the value even for a
            # null index (measured), which would score null rows 0
            contrib = F.when(x.isNotNull(),
                             F.element_at(arr, b + F.lit(1)))
        total = total + contrib
    return df.withColumn(out, F.round(total, round_to))


def calendar_features(df: DataFrame, ts_col: str = "ts",
                      ndigits: int = 6) -> DataFrame:
    """Cyclical calendar encodings — the feature-engineering staple
    for any time-stamped event stream: appends ``hour_sin/hour_cos``
    (hour of day), ``dow_sin/dow_cos`` (day of week, Sunday = 0),
    ``month_sin/month_cos`` (month of year, 1-based mapped to the
    0..11 circle), ``mod_sin/mod_cos`` (minute of day, the
    fine-grained clock position) and ``is_weekend``. Sin/cos pairs
    embed each period on the unit circle so midnight≈23:59 and
    Dec≈Jan stay adjacent — adjacency a raw ordinal encoding
    destroys.

    Pure JVM column expressions over the existing rows — no shuffle,
    no UDF, survives any scale by construction. The 2π factors use
    the double literal of π so the oracle's ``pi()`` arithmetic is
    identical; outputs go through :func:`~hipipe_spark.functions.
    rounding.round_norm` because ``cos(3π/2)`` ≈ ``-1.8e-16`` rounds
    to ``-0.0`` under libm but ``+0.0`` under BigDecimal HALF_UP.
    """
    import math

    from hipipe_spark.functions.rounding import round_norm
    two_pi = 2.0 * math.pi
    ts = F.col(ts_col)
    hour = F.hour(ts).cast("double")
    dow = (F.dayofweek(ts) - 1).cast("double")       # Sunday = 0
    month = (F.month(ts) - 1).cast("double")         # Jan = 0
    mod = (F.hour(ts) * 60 + F.minute(ts)).cast("double")

    def pair(angle, period, name):
        a = angle / period * two_pi
        return [round_norm(F.sin(a), ndigits).alias(f"{name}_sin"),
                round_norm(F.cos(a), ndigits).alias(f"{name}_cos")]

    return df.select(
        "*",
        *pair(hour, 24.0, "hour"),
        *pair(dow, 7.0, "dow"),
        *pair(month, 12.0, "month"),
        *pair(mod, 1440.0, "mod"),
        ((dow == 0.0) | (dow == 6.0)).alias("is_weekend"))


def partial_corr(df: DataFrame, group: str, x: str, y: str, z: str,
                 ndigits: int = 6) -> DataFrame:
    """Per-``group`` first-order partial correlation of ``x`` and
    ``y`` CONTROLLING for ``z``::

        r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²))

    — the "is this feature pair really related, or do both just
    track the confounder?" screen that raw :func:`feature_corr`
    cannot answer. One row per group: ``n, r_xy, r_xz, r_yz,
    r_xy_z`` (null when any marginal is degenerate or either
    controlling correlation is ±1).

    Plan: rounded-handoff centering then ONE aggregate of the six
    pairwise moments (the ols2 pattern); all arithmetic on the
    group-dimension frame.
    """
    cx = F.col(x).cast("double")
    cy = F.col(y).cast("double")
    cz = F.col(z).cast("double")
    mu = df.groupBy(group).agg(
        F.round(F.avg(cx), 6).alias("__mx"),
        F.round(F.avg(cy), 6).alias("__my"),
        F.round(F.avg(cz), 6).alias("__mz"))
    d = (df.join(F.broadcast(mu), group)
           .select(group,
                   (cx - F.col("__mx")).alias("dx"),
                   (cy - F.col("__my")).alias("dy"),
                   (cz - F.col("__mz")).alias("dz")))
    dx, dy, dz = F.col("dx"), F.col("dy"), F.col("dz")
    agg = d.groupBy(group).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dx).alias("ux"), F.sum(dy).alias("uy"),
        F.sum(dz).alias("uz"),
        F.sum(dx * dx).alias("pxx"), F.sum(dy * dy).alias("pyy"),
        F.sum(dz * dz).alias("pzz"),
        F.sum(dx * dy).alias("pxy"), F.sum(dx * dz).alias("pxz"),
        F.sum(dy * dz).alias("pyz"))
    n = F.col("n")
    sxx = F.col("pxx") - F.col("ux") * F.col("ux") / n
    syy = F.col("pyy") - F.col("uy") * F.col("uy") / n
    szz = F.col("pzz") - F.col("uz") * F.col("uz") / n
    sxy = F.col("pxy") - F.col("ux") * F.col("uy") / n
    sxz = F.col("pxz") - F.col("ux") * F.col("uz") / n
    syz = F.col("pyz") - F.col("uy") * F.col("uz") / n
    ok = (n >= 3) & (sxx > 0) & (syy > 0) & (szz > 0)
    rxy = F.round(F.when(ok, sxy / F.sqrt(sxx * syy)), 9)
    rxz = F.round(F.when(ok, sxz / F.sqrt(sxx * szz)), 9)
    ryz = F.round(F.when(ok, syz / F.sqrt(syy * szz)), 9)
    den = (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    pc = F.when(den > 0, (rxy - rxz * ryz) / F.sqrt(den))
    return agg.select(
        group, n.cast("bigint").alias("n"),
        F.round(rxy, ndigits).alias("r_xy"),
        F.round(rxz, ndigits).alias("r_xz"),
        F.round(ryz, ndigits).alias("r_yz"),
        F.round(pc, ndigits).alias("r_xy_z"))
