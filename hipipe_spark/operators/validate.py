"""Data-quality gates: declarative expectations, referential-integrity
audits, and a single-pass column profiler.

At 100 TB the question "is this table sane?" must itself be a Spark
plan — a driver-side loop of `df.filter(rule).count()` calls would run
one corpus scan PER RULE. Everything here folds into one (or two)
scans regardless of how many rules/columns are checked:

- :func:`check_rules` — N boolean expectations → ONE aggregate pass
  (each rule is a conditional count, partial-aggregated map-side),
  melted to a (rule, n_rows, n_fail, fail_rate) report on the
  driver-sized result row.
- :func:`flag_violations` — the row-level twin: appends a compact
  array of failed rule names per row (narrow map, no shuffle) for
  quarantine-style routing.
- :func:`fk_audit` — orphan rate of a child key against a parent
  table: one distinct on the parent key (dimension-sized → broadcast
  when small) + one left join + one count aggregate.
- :func:`profile_columns` — per-column null rate / distinct / min /
  max / mean in one aggregate pass, long-format output; exact
  count(DISTINCT) costs one expand at small column counts (the oracle
  setting), ``approximate=True`` swaps in the mergeable HLL sketch —
  the 100-TB default.

Reference contrast: hipipe validates shape only (column presence and
batch rectangularity at stream-build time, ``include/hipipe/core/
stream/create.hpp``); value-level expectations are new surface the
north rule's lineage/metrics contract implies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def check_rules(df: DataFrame,
                rules: Sequence[tuple[str, Column]],
                round_to: int = 6) -> DataFrame:
    """Evaluate named boolean expectations (True/null = pass, False =
    fail — a rule on a null value fails only if its predicate says so;
    wrap with ``isNotNull`` checks to assert presence) in ONE aggregate
    scan. Returns one row per rule: ``(rule, n_rows, n_fail,
    fail_rate)``, in the order given."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, cond) in enumerate(rules):
        aggs.append(F.sum(F.when(~cond, 1).otherwise(0))
                    .cast("bigint").alias(f"__f{i}"))
    row = df.agg(*aggs)
    melted = F.array(*[
        F.struct(F.lit(i + 1).alias("rule_no"),
                 F.lit(name).alias("rule"),
                 F.col("__n").cast("bigint").alias("n_rows"),
                 F.col(f"__f{i}").alias("n_fail"),
                 F.when(F.col("__n") > 0,
                        F.round(F.col(f"__f{i}") / F.col("__n"), round_to))
                 .otherwise(F.lit(0.0)).alias("fail_rate"))
        for i, (name, _) in enumerate(rules)
    ])
    return row.select(F.inline(melted))


def flag_violations(df: DataFrame,
                    rules: Sequence[tuple[str, Column]],
                    out: str = "violations") -> DataFrame:
    """Row-level expectations: append ``{out}`` — the array of rule
    names this row fails (empty = clean) and ``{out}_n`` — its size.
    Pure narrow map; route rows with ``F.size(out) > 0`` to a
    quarantine sink without a second evaluation pass."""
    arr = F.array(*[F.when(~cond, F.lit(name)) for name, cond in rules])
    cleaned = F.filter(arr, lambda x: x.isNotNull())
    return (df.withColumn(out, cleaned)
            .withColumn(f"{out}_n", F.size(cleaned)))


def fk_audit(child: DataFrame, parent: DataFrame, child_key: str,
             parent_key: str | None = None,
             round_to: int = 6) -> DataFrame:
    """Referential-integrity audit: how many child rows reference a key
    absent from the parent (orphans), plus null-key rows (counted
    separately — a null FK is a modeling choice, not an orphan).
    Returns one row: ``(n_rows, n_null_key, n_orphan, orphan_rate,
    match_rate)``.

    One distinct-project on the parent key (broadcast when
    dimension-sized — Spark picks it by stats/AQE) + one left join +
    one aggregate. The child never shuffles when the parent side
    broadcasts."""
    pk = parent_key or child_key
    keys = parent.select(F.col(pk).alias("__pk")).distinct()
    j = child.join(keys, child[child_key] == F.col("__pk"), "left")
    ck = j[child_key]
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(ck.isNull(), 1).otherwise(0))
         .cast("bigint").alias("n_null_key"),
        F.sum(F.when(ck.isNotNull() & F.col("__pk").isNull(), 1)
               .otherwise(0)).cast("bigint").alias("n_orphan"),
    ).select(
        "n_rows", "n_null_key", "n_orphan",
        F.when(F.col("n_rows") > 0,
               F.round(F.col("n_orphan") / F.col("n_rows"), round_to))
         .otherwise(F.lit(0.0)).alias("orphan_rate"),
        F.when(F.col("n_rows") > 0,
               F.round((F.col("n_rows") - F.col("n_orphan")
                        - F.col("n_null_key")) / F.col("n_rows"), round_to))
         .otherwise(F.lit(0.0)).alias("match_rate"))


def profile_columns(df: DataFrame, cols: Sequence[str],
                    approximate: bool = False,
                    round_to: int = 6) -> DataFrame:
    """Single-pass column profiler: per column ``(column, n_rows,
    n_null, null_rate, n_distinct, min_s, max_s, mean)`` in long
    format (min/max stringified so mixed types share one schema; mean
    only for numeric-castable columns). ``approximate=True`` replaces
    exact ``count(DISTINCT)`` (an expand — one duplicated stream per
    profiled column) with ``approx_count_distinct``, the
    constant-memory HLL sketch that partial-aggregates map-side — at
    100 TB profile approximately or profile twice."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        x = F.col(c)
        nd = (F.approx_count_distinct(x) if approximate
              else F.countDistinct(x))
        aggs += [
            F.sum(F.when(x.isNull(), 1).otherwise(0))
             .cast("bigint").alias(f"__null{i}"),
            nd.cast("bigint").alias(f"__nd{i}"),
            F.min(x).cast("string").alias(f"__min{i}"),
            F.max(x).cast("string").alias(f"__max{i}"),
            F.avg(x.try_cast("double")).alias(f"__mean{i}"),
        ]
    row = df.agg(*aggs)
    melted = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("__n").cast("bigint").alias("n_rows"),
                 F.col(f"__null{i}").alias("n_null"),
                 F.when(F.col("__n") > 0,
                        F.round(F.col(f"__null{i}") / F.col("__n"),
                                round_to)).otherwise(F.lit(0.0))
                 .alias("null_rate"),
                 F.col(f"__nd{i}").alias("n_distinct"),
                 F.col(f"__min{i}").alias("min_s"),
                 F.col(f"__max{i}").alias("max_s"),
                 F.round(F.col(f"__mean{i}"), round_to).alias("mean"))
        for i, c in enumerate(cols)
    ])
    return row.select(F.inline(melted))


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int = 5,
                sensitive_col: str | None = None) -> DataFrame:
    """Privacy-release audit: k-anonymity (every quasi-identifier
    combination must describe >= k rows) and, with ``sensitive_col``,
    l-diversity (distinct sensitive values per combination). Returns
    one row per violating equivalence class: the quasi columns plus
    ``class_size``, ``distinct_sensitive`` (null when no sensitive
    column) and ``violation`` ('k' / 'l' / 'k+l'); empty result =
    release passes at (k, l=2).

    One map-side-combinable hash aggregate on the quasi key; the
    violation filter returns only the (typically tiny) failing tail —
    nothing downstream grows with corpus size.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col:
        aggs.append(F.countDistinct(sensitive_col)
                    .alias("distinct_sensitive"))
    g = df.groupBy(*quasi_cols).agg(*aggs)
    if not sensitive_col:
        g = g.withColumn("distinct_sensitive",
                         F.lit(None).cast("bigint"))
    k_bad = F.col("class_size") < k
    l_bad = (F.col("distinct_sensitive").isNotNull()
             & (F.col("distinct_sensitive") < 2))
    return (g.withColumn(
                "violation",
                F.when(k_bad & l_bad, "k+l")
                 .when(k_bad, "k")
                 .when(l_bad, "l"))
            .filter(F.col("violation").isNotNull()))


def t_closeness(df: DataFrame, quasi_cols: list[str],
                sensitive_col: str, l: int = 2, t: float = 0.375,
                round_to: int = 6,
                violations_only: bool = True) -> DataFrame:
    """Privacy-release audit beyond :func:`k_anonymity`: entropy
    l-diversity and t-closeness (Li, Li & Venkatasubramanian, ICDE
    2007) per quasi-identifier equivalence class, in ONE corpus scan.

    Per class: ``distinct_sensitive`` (the plain l), ``entropy`` of
    the sensitive distribution in nats (entropy l-diversity:
    exp(entropy) is the effective value count), and ``tvd`` — the
    total-variation distance between the class's sensitive
    distribution and the GLOBAL one (the t-closeness metric for
    categorical attributes). ``violation`` marks classes with
    ``distinct_sensitive < l`` ('l'), ``tvd > t`` ('t'), or both
    ('l+t'); with ``violations_only`` (default) only the failing tail
    is returned — output never grows with corpus size.

    Scale shape: one map-side-combinable aggregate on
    (quasi, sensitive) reduces the corpus; everything else runs on
    the class×value table. TVD needs every GLOBAL value per class,
    but no dense cross join is materialized: for values absent from a
    class |p_class − p_global| = p_global, so
    ``tvd = 0.5 * (Σ_present |p_c − p_g| + (1 − Σ_present p_g))`` —
    computed from present combinations only. The global distribution
    is dimension-sized (distinct sensitive values) → broadcast.
    Entropy folds from Σ n·ln n:
    ``H = ln(class_size) − Σ n ln n / class_size``. NULL sensitive
    values count as a value of their own (grouped, not dropped) —
    the same semantics in the DuckDB oracle.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 1 or not (0.0 <= t <= 1.0):
        raise ValueError("need l >= 1 and 0 <= t <= 1")
    cv = (df.groupBy(*quasi_cols, sensitive_col)
            .agg(F.count(F.lit(1)).alias("n")))
    glob = cv.groupBy(sensitive_col).agg(F.sum("n").alias("n_v"))
    total = glob.agg(F.sum("n_v").alias("n_total"))
    glob = (glob.crossJoin(F.broadcast(total))
                .select(F.col(sensitive_col).alias("_sv"),
                        (F.col("n_v") / F.col("n_total")).alias("p_g")))
    # null-safe join: a NULL sensitive value is a value of its own
    cv = (cv.join(F.broadcast(glob),
                  F.col(sensitive_col).eqNullSafe(F.col("_sv")))
            .drop("_sv"))
    w = Window.partitionBy(*quasi_cols)
    cv = cv.withColumn("cs", F.sum("n").over(w))
    out = (cv.groupBy(*quasi_cols)
             .agg(F.max("cs").alias("class_size"),
                  F.count(F.lit(1)).alias("distinct_sensitive"),
                  F.sum(F.col("n") * F.log(F.col("n"))).alias("_nlnn"),
                  F.sum(F.abs(F.col("n") / F.col("cs") - F.col("p_g")))
                   .alias("_absdiff"),
                  F.sum("p_g").alias("_pg")))
    out = (out.withColumn(
                "entropy",
                F.round(F.log(F.col("class_size"))
                        - F.col("_nlnn") / F.col("class_size"),
                        round_to))
              .withColumn(
                "tvd",
                F.round(0.5 * (F.col("_absdiff")
                               + (F.lit(1.0) - F.col("_pg"))),
                        round_to))
              .drop("_nlnn", "_absdiff", "_pg"))
    l_bad = F.col("distinct_sensitive") < l
    t_bad = F.col("tvd") > t
    out = out.withColumn(
        "violation",
        F.when(l_bad & t_bad, "l+t").when(l_bad, "l").when(t_bad, "t"))
    return out.filter(F.col("violation").isNotNull()) \
        if violations_only else out


def table_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
               compare: Sequence[str] | None = None,
               include_unchanged: bool = False) -> DataFrame:
    """Change data feed between two table versions (snapshot diff):
    one row per key with ``change`` in {'inserted', 'deleted',
    'changed', 'unchanged'} plus both sides' compared columns
    (``{col}_old`` / ``{col}_new``). ``compare`` defaults to every
    shared non-key column; comparison is null-safe.

    The audit behind every incremental refresh (checkpoint.py
    incremental_refresh): what actually changed between snapshot N-1
    and N. One full outer join — each side shuffles once on the key;
    with ``include_unchanged=False`` (default) the unchanged bulk is
    filtered before anything downstream sees it.

    Duplicate keys on either side are an input error at the semantic
    level (a snapshot has one row per key); the join would fan out —
    enforce upstream (latest_per_key) when in doubt.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("keys must be non-empty")
    if compare is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare = [c for c in shared if c not in keys]
    compare = list(compare)

    o = old.select(*keys, F.lit(1).alias("__in_old"),
                   *[F.col(c).alias(f"{c}_old") for c in compare])
    n = new.select(*keys, F.lit(1).alias("__in_new"),
                   *[F.col(c).alias(f"{c}_new") for c in compare])
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    change = (F.when(F.col("__in_old").isNull(), "inserted")
               .when(F.col("__in_new").isNull(), "deleted")
               .when(same, "unchanged")
               .otherwise("changed"))
    out = j.withColumn("change", change).drop("__in_old", "__in_new")
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def dp_counts(df: DataFrame, group_cols: Sequence[str],
              epsilon: float = 1.0, seed: int = 0) -> DataFrame:
    """ε-differentially-private release of a group-count histogram
    with DETERMINISTIC Laplace noise: the draw for each cell is the
    inverse-CDF transform of a det-hash uniform of the cell's own key
    — so the release is reproducible across runs, cluster sizes, and
    the DuckDB oracle, while keeping the Laplace(Δ=1, b=1/ε) shape
    the count query needs.

    ``noise = −b · sign(u − ½) · ln(1 − 2|u − ½|)``, u ∈ (0,1) from
    :func:`~hipipe_spark.functions.hashing.det_hash_str_i64` of the
    concatenated group key. One map-side-combinable aggregate; the
    noise arithmetic runs on the cell-dimension table. (Determinism
    is a *reproducibility* device — a production ε-budgeted release
    would swap in fresh randomness; the plan is identical.)

    Output: group cols, ``true_cnt (bigint)``, ``noise (double)``,
    ``dp_cnt (double)`` = max(0, true + noise) rounded 4 — the
    post-processing clamp costs no privacy.
    """
    from hipipe_spark.functions.hashing import det_hash_i64, _M
    from hipipe_spark.functions.hashing import det_hash_str_i64
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    g = df.groupBy(*group_cols).agg(F.count("*").alias("true_cnt"))
    key = F.concat_ws("\x1f", *[F.col(c).cast("string")
                                for c in group_cols])
    u = (det_hash_str_i64(key, seed=seed).cast("double") + 0.5) \
        / F.lit(float(_M))
    b = 1.0 / float(epsilon)
    half = u - F.lit(0.5)
    mag = F.greatest(1.0 - 2.0 * F.abs(half), F.lit(1e-12))
    noise = F.round(-F.lit(b) * F.signum(half) * F.log(mag), 4)
    return (g.withColumn("noise", noise)
            .select(*group_cols,
                    F.col("true_cnt").cast("bigint").alias("true_cnt"),
                    "noise",
                    F.round(F.greatest(F.col("true_cnt") + F.col("noise"),
                                       F.lit(0.0)), 4).alias("dp_cnt"))
            .orderBy(*group_cols))


# Benford expected first-digit shares log10(1 + 1/d), d = 1..9
BENFORD_P = {d: __import__("math").log10(1.0 + 1.0 / d)
             for d in range(1, 10)}


def benford(df: DataFrame, group: str, value: str) -> DataFrame:
    """Benford's-law conformity audit of a positive metric: per
    (group, first-significant-digit) the observed share vs the
    Benford expectation ``log10(1+1/d)``, plus the group's MAD
    (mean absolute deviation across the 9 digits — Nigrini's
    conformity statistic; < 0.006 ≈ close conformity for counts).

    The first digit comes from the INTEGER-PART STRING (rows with
    ``|value| < 1`` are excluded), never ``log10`` — float log at
    power-of-ten boundaries is engine-dependent; substring of a cast
    integer is exact in both engines. ONE hash aggregate on (group,
    digit); digits a group never produced still appear (share 0) so
    MAD is over all 9 digits.

    Output: ``group, digit (int), n_obs (bigint), share, expected,
    deviation, mad (doubles rounded 6)``, ordered by group, digit.
    """
    v = F.abs(F.col(value).cast("double"))
    digit = F.substring(
        F.floor(v).cast("bigint").cast("string"), 1, 1).cast("int")
    obs = (df.where(v >= 1)
           .groupBy(F.col(group).alias("g"), digit.alias("digit"))
           .agg(F.count("*").alias("n_obs")))
    digits = obs.sparkSession.createDataFrame(
        [(d,) for d in range(1, 10)], "digit: int")
    groups = obs.select("g").distinct()
    full = (groups.crossJoin(F.broadcast(digits))
            .join(obs, ["g", "digit"], "left")
            .select("g", "digit",
                    F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs")))
    w = Window.partitionBy("g")
    share = F.col("n_obs") / F.sum("n_obs").over(w)
    expected = F.lit(None).cast("double")
    for d, pd in BENFORD_P.items():
        expected = F.when(F.col("digit") == d, F.lit(pd)) \
            .otherwise(expected)
    # two projections: mad is a window over a window-derived column
    staged = full.select(
        "g", "digit",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        share.alias("__share"),
        expected.alias("__exp"),
        F.abs(share - expected).alias("__dev"))
    return (staged.select(
        F.col("g").alias(group),
        "digit", "n_obs",
        F.round(F.col("__share"), 6).alias("share"),
        F.round(F.col("__exp"), 6).alias("expected"),
        F.round(F.col("__dev"), 6).alias("deviation"),
        F.round(F.avg("__dev").over(w), 6).alias("mad"))
        .orderBy(group, "digit"))


def leakage_audit(df: DataFrame, ts_col: str,
                  src_ts_cols: Sequence[str],
                  tolerance_s: float = 0.0,
                  round_to: int = 6) -> DataFrame:
    """Zero-temporal-leakage gate: verify that every feature source
    timestamp is at or before the observation timestamp it enriched.

    The north rule's core invariant — "no feature may read ts' > ts" —
    becomes a Spark plan instead of a promise: run every point-in-time
    join with the matched source timestamp carried as a value column
    (rename the right side's ``ts`` before :func:`~hipipe_spark.
    operators.asof.asof_join` so it lands in ``value_cols``), then
    audit all sources in ONE aggregate scan, exactly the
    :func:`check_rules` shape (conditional sums, partial-aggregated
    map-side, melted on the driver-sized result row). A driver loop of
    per-source ``filter(...).count()`` calls would cost one corpus
    scan per feature table at 100 TB.

    Per source column: ``n_rows`` (audited rows), ``n_matched``
    (non-null source ts — as-of misses are null and are NOT leaks),
    ``n_leaks`` (source ts later than observation ts by more than
    ``tolerance_s`` seconds), ``max_lead_s`` (worst lead among leaks,
    null when clean), ``leak_rate`` = n_leaks / n_rows, and ``ok``.
    Forward/label joins audited on purpose show up loudly — that is
    the point: the auditor distinguishes feature inputs (must be
    clean) from label constructions (expected to lead).
    """
    if not src_ts_cols:
        raise ValueError("src_ts_cols must be non-empty")

    def _epoch_us(name: str) -> Column:
        # Integer microseconds, NOT epoch-second doubles: the testdata
        # timestamps carry microsecond components, and a double
        # subtraction of two ~1.7e9-second epochs loses the tail that
        # decides a tolerance_s=0 leak. unix_micros is exact; leads are
        # integer-subtracted BEFORE the divide so both engines share
        # the operation order (oracle twin: epoch_us(a) - epoch_us(b)).
        # NTZ can't feed unix_micros directly; session tz is UTC so
        # NTZ->TS is identity. Numeric epoch-second columns are scaled.
        if dict(df.dtypes)[name].startswith("timestamp"):
            return F.unix_micros(F.col(name).cast("timestamp"))
        return F.round(F.col(name).cast("double") * 1000000.0,
                       0).cast("bigint")

    obs = _epoch_us(ts_col)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(src_ts_cols):
        lead = (_epoch_us(c) - obs) / F.lit(1000000.0)
        is_leak = F.col(c).isNotNull() & (lead > tolerance_s)
        aggs.append(F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0))
                    .cast("bigint").alias(f"__m{i}"))
        aggs.append(F.sum(F.when(is_leak, 1).otherwise(0))
                    .cast("bigint").alias(f"__l{i}"))
        aggs.append(F.max(F.when(is_leak, lead)).alias(f"__x{i}"))
    row = df.agg(*aggs)
    melted = F.array(*[
        F.struct(F.lit(i + 1).alias("src_no"),
                 F.lit(c).alias("source"),
                 F.col("__n").cast("bigint").alias("n_rows"),
                 F.col(f"__m{i}").alias("n_matched"),
                 F.col(f"__l{i}").alias("n_leaks"),
                 F.round(F.col(f"__x{i}"), round_to).alias("max_lead_s"),
                 F.when(F.col("__n") > 0,
                        F.round(F.col(f"__l{i}") / F.col("__n"), round_to))
                 .otherwise(F.lit(0.0)).alias("leak_rate"),
                 (F.col(f"__l{i}") == 0).alias("ok"))
        for i, c in enumerate(src_ts_cols)
    ])
    return row.select(F.inline(melted))
