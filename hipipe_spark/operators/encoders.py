"""Leakage-aware feature encoders: ordered target encoding and
fit/apply standardization.

Both operators exist because the naive versions LEAK: a target encoding
computed over the full table lets every row see its own (and future)
labels, and a z-score fitted on the full corpus lets the training set
see the test distribution. The engine versions bake the temporal /
split discipline in:

- :class:`TargetEncode` — strictly-past, conversation-local encoding
  (the CatBoost "ordered" construction restricted to the conversation,
  which also keeps window partitions bounded: a global time-ordered
  encoding would put each category in ONE window partition — a
  single-task scan at 100 TB).
- :func:`fit_standardizer` / :func:`apply_standardizer` — moments from
  the FIT frame only (pass the train split), broadcast-applied to any
  frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hipipe_spark.plans.pipeline import Stage

DEFAULT_KEY = "conv_id"
DEFAULT_ORDER = ("ts", "turn_idx")


class TargetEncode(Stage):
    """Smoothed ordered target encoding of categorical ``cols`` against
    ``label``, conversation-local and strictly past:

        te = (sum_past(label | same category, same conv) + w * prior)
             / (count_past + w)

    where "past" is earlier (ts, turn_idx) within (conv, category).
    Every feature value is a function of rows the model would have seen
    at inference time — zero target leakage by construction, and the
    window partitions by (conv, category), staying bounded by
    conversation length at any corpus size (a GLOBAL ordered encoding
    partitions by category alone: one task per category — documented
    anti-pattern, use per-conv + a train-split prior instead).

    ``prior`` defaults to the global label mean of ``df`` — pass the
    train-split mean explicitly in fit/apply settings.
    """

    def __init__(self, cols: str | Sequence[str], label: str,
                 prior: float | None = None, prior_weight: float = 10.0,
                 key: str = DEFAULT_KEY, order: Sequence[str] = DEFAULT_ORDER):
        self.cols = [cols] if isinstance(cols, str) else list(cols)
        super().__init__(f"target_encode({','.join(self.cols)})")
        self.label, self.prior, self.w = label, prior, float(prior_weight)
        self.key, self.order = key, order

    def apply(self, df: DataFrame) -> DataFrame:
        prior = self.prior
        if prior is None:
            row = df.agg(F.avg(self.label)).collect()
            prior = float(row[0][0] or 0.0)
        y = F.col(self.label).cast("double")
        for c in self.cols:
            w = (
                Window.partitionBy(self.key, c)
                .orderBy(*[F.col(o) for o in self.order])
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            s = F.coalesce(F.sum(y).over(w), F.lit(0.0))
            n = F.coalesce(F.count(y).over(w), F.lit(0)).cast("double")
            df = df.withColumn(
                f"{c}_te",
                (s + F.lit(self.w) * F.lit(prior)) / (n + F.lit(self.w)),
            )
        return df


def fit_standardizer(fit_df: DataFrame, cols: Sequence[str],
                     by: str | None = None) -> DataFrame:
    """Per-column (optionally per-group) mean and sample stddev from the
    FIT frame — pass the train split so evaluation data never shapes
    the scaling. Returns a dimension-sized stats frame (one row, or one
    per ``by`` group) meant for broadcast in :func:`apply_standardizer`."""
    aggs = []
    for c in cols:
        aggs += [F.avg(F.col(c).cast("double")).alias(f"{c}__mean"),
                 F.stddev_samp(F.col(c).cast("double")).alias(f"{c}__std")]
    return fit_df.groupBy(by).agg(*aggs) if by else fit_df.agg(*aggs)


def fit_buckets(fit_df: DataFrame, cols: Sequence[str], n_buckets: int = 4,
                exact: bool = False, accuracy: int = 10000) -> DataFrame:
    """Quantile cut points (``n_buckets - 1`` internal boundaries per
    column) from the FIT frame — pass the train split so bin edges are
    frozen before evaluation data arrives.

    ``exact=False`` (default) uses ``percentile_approx`` — a mergeable
    sketch aggregate, the only sane path over 100 TB. ``exact=True``
    uses the exact interpolated percentile (linear, the
    ``percentile_cont`` rule) for oracle/test settings where bit-stable
    edges matter; it buffers values per partition, so reserve it for
    dimension-sized fits. Returns a one-row frame with
    ``{col}__bounds`` arrays meant for :func:`apply_buckets`."""
    ps = [i / n_buckets for i in range(1, n_buckets)]
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        if exact:
            agg = F.percentile(x, F.array(*[F.lit(p) for p in ps]))
        else:
            agg = F.percentile_approx(x, ps, accuracy)
        aggs.append(agg.alias(f"{c}__bounds"))
    return fit_df.agg(*aggs)


def apply_buckets(df: DataFrame, bounds: DataFrame, cols: Sequence[str],
                  suffix: str = "_bin") -> DataFrame:
    """Discretize each column to its quantile-bin index: the number of
    fitted boundaries ``<= x`` (0-based; values on a boundary take the
    upper bin, nulls stay null). The bounds frame is broadcast and the
    bin is a scan-local array expression — ``df`` never shuffles."""
    joined = df.crossJoin(F.broadcast(bounds))

    def _le(xcol):  # closure factory: keep the HOF lambda at arity 1
        return lambda b: b <= xcol

    for c in cols:
        x = F.col(c).cast("double")
        joined = joined.withColumn(
            f"{c}{suffix}",
            F.when(x.isNotNull(),
                   F.size(F.filter(F.col(f"{c}__bounds"), _le(x)))),
        )
    return joined.drop(*[f"{c}__bounds" for c in cols])


def fit_clip(fit_df: DataFrame, cols: Sequence[str],
             lo_p: float = 0.01, hi_p: float = 0.99,
             exact: bool = False, accuracy: int = 10000) -> DataFrame:
    """Winsorization bounds — the ``[lo_p, hi_p]`` quantiles of each
    column from the FIT frame. Same exact/approx split as
    :func:`fit_buckets`. Returns one row with ``{c}__lo`` / ``{c}__hi``
    for :func:`apply_clip`."""
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        if exact:
            q = F.percentile(x, F.array(F.lit(lo_p), F.lit(hi_p)))
        else:
            q = F.percentile_approx(x, [lo_p, hi_p], accuracy)
        aggs += [q[0].alias(f"{c}__lo"), q[1].alias(f"{c}__hi")]
    return fit_df.agg(*aggs)


def apply_clip(df: DataFrame, stats: DataFrame, cols: Sequence[str],
               suffix: str = "_clip") -> DataFrame:
    """Winsorize: clamp each column into its fitted quantile bounds —
    the tail-taming step before a mean/std fit is trustworthy. Nulls
    stay null (``greatest`` alone would resurrect them as the lower
    bound). Broadcast stats, scan-local clamp — no shuffle of ``df``."""
    joined = df.crossJoin(F.broadcast(stats))
    for c in cols:
        x = F.col(c).cast("double")
        clamped = F.least(F.greatest(x, F.col(f"{c}__lo")),
                          F.col(f"{c}__hi"))
        joined = joined.withColumn(
            f"{c}{suffix}", F.when(x.isNotNull(), clamped))
    return joined.drop(*[f"{c}__{s}" for c in cols for s in ("lo", "hi")])


def fit_robust_scaler(fit_df: DataFrame, cols: Sequence[str],
                      exact: bool = False,
                      accuracy: int = 10000) -> DataFrame:
    """Median and IQR (p75 − p25) per column from the FIT frame — the
    outlier-resistant sibling of :func:`fit_standardizer` (a single
    10^9-char document moves a mean/std arbitrarily far; it moves the
    median not at all). Same exact/approx split as :func:`fit_buckets`:
    approx sketch by default, exact interpolated percentiles for
    oracle-grade edges. Returns one row with ``{c}__med`` / ``{c}__iqr``."""
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        if exact:
            q = F.percentile(x, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
        else:
            q = F.percentile_approx(x, [0.25, 0.5, 0.75], accuracy)
        aggs += [q[1].alias(f"{c}__med"),
                 (q[2] - q[0]).alias(f"{c}__iqr")]
    return fit_df.agg(*aggs)


def apply_robust_scaler(df: DataFrame, stats: DataFrame, cols: Sequence[str],
                        suffix: str = "_r") -> DataFrame:
    """r = (x − median) / IQR with the broadcast fit stats; null when
    the fit IQR is zero (at least half the fit values identical). A
    narrow map over the scan — no shuffle of ``df`` at any scale."""
    joined = df.crossJoin(F.broadcast(stats))
    for c in cols:
        m, iq = F.col(f"{c}__med"), F.col(f"{c}__iqr")
        joined = joined.withColumn(
            f"{c}{suffix}",
            F.when(iq > 0.0, (F.col(c).cast("double") - m) / iq),
        )
    drop = [f"{c}__{s}" for c in cols for s in ("med", "iqr")]
    return joined.drop(*drop)


def fit_frequency_encoder(fit_df: DataFrame, col: str,
                          min_count: int = 1) -> DataFrame:
    """Category frequencies from the FIT frame — the train split, so
    evaluation data never shapes the encoding. One hash-aggregate
    shuffle on ``col`` (partial/map-side combine makes the shuffle
    O(distinct), not O(rows)); categories below ``min_count`` are
    dropped from the map, so downstream they encode like unseen values.
    Returns a dimension-sized frame ``(col, {col}__cnt, {col}__freq)``
    meant for broadcast in :func:`apply_frequency_encoder` — after a
    sane ``min_count`` cutoff a categorical vocabulary is MB-sized even
    when the corpus is 100 TB; for a pathological high-cardinality
    column skip the broadcast and pass ``broadcast=False`` downstream."""
    total = fit_df.filter(F.col(col).isNotNull()).count()
    return (
        fit_df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(f"{col}__cnt"))
        .filter(F.col(f"{col}__cnt") >= int(min_count))
        .withColumn(f"{col}__freq",
                    F.col(f"{col}__cnt") / F.lit(float(total or 1)))
    )


def apply_frequency_encoder(df: DataFrame, freqs: DataFrame, col: str,
                            suffix: str = "_freq",
                            broadcast: bool = True) -> DataFrame:
    """Replace the category with its fit-frame relative frequency —
    the count-encoding trick that gives tree models and linear heads a
    monotone "how common is this" signal without a width explosion.
    Unseen / below-``min_count`` / null categories encode 0.0 (absent
    from the fit map means "rare" — that IS the information). Broadcast
    left join, scan-local — ``df`` never shuffles."""
    m = freqs.select(col, f"{col}__freq")
    joined = df.join(F.broadcast(m) if broadcast else m, col, "left")
    return (joined
            .withColumn(f"{col}{suffix}",
                        F.coalesce(F.col(f"{col}__freq"), F.lit(0.0)))
            .drop(f"{col}__freq"))


def collapse_rare(df: DataFrame, col: str, min_count: int = 2,
                  other: str = "__other__", fit_df: DataFrame | None = None,
                  suffix: str = "_c", broadcast: bool = True) -> DataFrame:
    """Collapse long-tail categories into one ``other`` bucket: values
    seen fewer than ``min_count`` times in the fit frame (default:
    ``df`` itself) — plus values never seen there at all, and nulls —
    become ``other``. The standard cardinality clamp before one-hot /
    index encoding: at web scale a raw domain or user-agent column has
    10^8 distinct values, almost all singletons that a model can't
    learn from but that triple the dictionary.

    Plan: one count aggregate on the fit frame keeps only the frequent
    vocabulary (dimension-sized by construction), broadcast
    left-semi-style join back; ``df`` itself never shuffles."""
    fit = fit_df if fit_df is not None else df
    vocab = (fit.filter(F.col(col).isNotNull())
             .groupBy(col)
             .agg(F.count(F.lit(1)).alias("__cnt"))
             .filter(F.col("__cnt") >= int(min_count))
             .select(col, F.lit(True).alias("__keep")))
    joined = df.join(F.broadcast(vocab) if broadcast else vocab, col, "left")
    return (joined
            .withColumn(f"{col}{suffix}",
                        F.when(F.col("__keep").isNotNull(), F.col(col))
                        .otherwise(F.lit(other)))
            .drop("__keep"))


def fit_onehot(fit_df: DataFrame, col: str, min_count: int = 1,
               max_categories: int | None = None) -> DataFrame:
    """Fitted one-hot vocabulary: ``(col, {col}__pos)`` with positions
    0..V-1 assigned by (count DESC, value ASC) — deterministic across
    runs and cluster sizes, so feature column ``k`` always means the
    same category. Fit on the TRAIN split; categories below
    ``min_count`` (and beyond ``max_categories``, the width clamp) are
    dropped and later encode as all-zeros / index -1, exactly like
    unseen eval-time values.

    Plan: one map-side-combinable count aggregate, then a rank over the
    surviving vocabulary. The rank window is unpartitioned — fine
    because a one-hot vocabulary is dimension-sized BY CONSTRUCTION
    (nobody one-hots 10^8 categories; that's what
    :func:`fit_frequency_encoder` / :func:`collapse_rare` are for)."""
    counts = (fit_df.filter(F.col(col).isNotNull())
              .groupBy(col)
              .agg(F.count(F.lit(1)).alias("__cnt"))
              .filter(F.col("__cnt") >= int(min_count)))
    w = Window.orderBy(F.desc("__cnt"), F.asc(col))
    vocab = counts.withColumn(
        f"{col}__pos", (F.row_number().over(w) - 1).cast("int"))
    if max_categories is not None:
        vocab = vocab.filter(F.col(f"{col}__pos") < int(max_categories))
    return vocab.select(col, f"{col}__pos")


def apply_onehot(df: DataFrame, vocab: DataFrame, col: str,
                 dense: bool = False, broadcast: bool = True) -> DataFrame:
    """Encode ``col`` against the fitted vocabulary: ``{col}_idx`` (int
    position, -1 for unseen / rare / null) and, with ``dense=True``,
    ``{col}_vec`` — an ``array<int>`` of length V with a single 1 (all
    zeros for unseen). The sparse index is the scale path: a dense
    vector multiplies storage by V, so it's opt-in and meant for
    model-input materialization at the very end of a pipeline.

    Plan: broadcast left join (vocab is dimension-sized), vector built
    as a scan-local array expression — ``df`` never shuffles. The one
    driver-side action is ``vocab.count()`` for V (dense only)."""
    m = vocab.select(col, f"{col}__pos")
    joined = df.join(F.broadcast(m) if broadcast else m, col, "left")
    out = joined.withColumn(
        f"{col}_idx",
        F.coalesce(F.col(f"{col}__pos"), F.lit(-1)).cast("int"))
    if dense:
        dim = vocab.count()
        if dim == 0:  # sequence(0, -1) would count DOWN, not be empty
            vec = F.array().cast("array<int>")
        else:
            vec = F.transform(
                F.sequence(F.lit(0), F.lit(int(dim) - 1)),
                lambda i: (i == F.col(f"{col}_idx")).cast("int"))
        out = out.withColumn(f"{col}_vec", vec)
    return out.drop(f"{col}__pos")


def apply_standardizer(df: DataFrame, stats: DataFrame, cols: Sequence[str],
                       by: str | None = None, suffix: str = "_z") -> DataFrame:
    """z = (x - mean) / std with the broadcast fit stats; null when the
    fit std is zero/null (constant column in the fit frame). A narrow
    map over the scan — no shuffle of ``df`` at any scale."""
    joined = (df.join(F.broadcast(stats), on=by) if by
              else df.crossJoin(F.broadcast(stats)))
    for c in cols:
        m, s = F.col(f"{c}__mean"), F.col(f"{c}__std")
        joined = joined.withColumn(
            f"{c}{suffix}",
            F.when(s > 0.0, (F.col(c).cast("double") - m) / s),
        )
    drop = [f"{c}__{stat}" for c in cols for stat in ("mean", "std")]
    return joined.drop(*drop)


def fit_woe(fit_df: DataFrame, col: str, label: str,
            smoothing: float = 0.5) -> DataFrame:
    """Weight-of-evidence table for a categorical column against a
    binary label, fitted on the FIT frame (train split) only:

        woe_c = ln( ((pos_c + s) / (pos_tot + 2s))
                  / ((neg_c + s) / (neg_tot + 2s)) )

    with additive smoothing ``s`` so pure categories stay finite. Also
    returns each category's information-value contribution ``iv_c`` =
    (p_pos - p_neg) * woe_c; ``SUM(iv_c)`` is the classic IV feature-
    strength score (<0.02 useless, >0.3 strong). Unlike target
    encoding, WoE is symmetric in the class odds, which is why scoring
    models prefer it.

    Plan: one map-side-combinable aggregate to the category frame, then
    window totals over that dimension-sized frame — no driver-side
    collect, no second pass over the data. Apply via
    :func:`apply_woe` (broadcast, scan-local)."""
    s = float(smoothing)
    lbl = F.col(label).cast("double")
    cats = (fit_df.filter(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("__n"),
                 F.sum(lbl).alias("__pos")))
    w = Window.partitionBy()
    pos_t = F.sum("__pos").over(w)
    neg_t = F.sum(F.col("__n") - F.col("__pos")).over(w)
    p_pos = (F.col("__pos") + s) / (pos_t + 2 * s)
    p_neg = (F.col("__n") - F.col("__pos") + s) / (neg_t + 2 * s)
    woe = F.log(p_pos / p_neg)
    return (cats
            .withColumn(f"{col}__woe", F.round(woe, 6))
            .withColumn(f"{col}__iv", F.round((p_pos - p_neg) * woe, 6))
            .select(col, F.col("__n").alias(f"{col}__n"),
                    F.col("__pos").cast("long").alias(f"{col}__pos"),
                    f"{col}__woe", f"{col}__iv"))


def apply_woe(df: DataFrame, woe: DataFrame, col: str,
              suffix: str = "_woe", broadcast: bool = True) -> DataFrame:
    """Attach the fitted WoE value; unseen / rare / null categories get
    0.0 — the "no evidence either way" neutral point, which is exactly
    what WoE's log-odds scale means by zero. Broadcast left join,
    scan-local — ``df`` never shuffles."""
    m = woe.select(col, f"{col}__woe")
    joined = df.join(F.broadcast(m) if broadcast else m, col, "left")
    return (joined
            .withColumn(f"{col}{suffix}",
                        F.coalesce(F.col(f"{col}__woe"), F.lit(0.0)))
            .drop(f"{col}__woe"))


def fit_impute(fit_df: DataFrame, cols: Sequence[str],
               strategy: str = "median", exact: bool = False,
               accuracy: int = 10000) -> DataFrame:
    """Missing-value fill statistics from the FIT frame (train split):
    ``strategy="median"`` (default) or ``"mean"``. Like
    :func:`fit_buckets`, median uses the mergeable
    ``percentile_approx`` sketch by default — the only sane single-pass
    shape at 100 TB — with ``exact=True`` (interpolated
    ``percentile_cont`` rule) reserved for oracle/test settings.
    Returns a one-row frame of ``{col}__fill`` values meant for
    broadcast in :func:`apply_impute`. An all-null fit column yields a
    null fill (apply then leaves the column unfilled and the indicator
    still marks it)."""
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        if strategy == "mean":
            agg = F.avg(x)
        elif strategy == "median":
            agg = (F.percentile(x, F.lit(0.5)) if exact
                   else F.percentile_approx(x, 0.5, accuracy))
        else:
            raise ValueError(f"unknown impute strategy {strategy!r}")
        aggs.append(agg.alias(f"{c}__fill"))
    return fit_df.agg(*aggs)


def apply_impute(df: DataFrame, fills: DataFrame, cols: Sequence[str],
                 suffix: str = "_f", indicator: bool = True) -> DataFrame:
    """Fill nulls with the broadcast fit statistics; with
    ``indicator=True`` (default) also emit ``{col}__was_null`` (0/1) —
    missingness is itself signal (MNAR features), and models should see
    it rather than a silently-invented median. A narrow map over the
    scan — ``df`` never shuffles at any scale."""
    joined = df.crossJoin(F.broadcast(fills))
    for c in cols:
        x = F.col(c).cast("double")
        if indicator:
            joined = joined.withColumn(
                f"{c}__was_null", F.when(x.isNull(), 1).otherwise(0))
        joined = joined.withColumn(
            f"{c}{suffix}", F.coalesce(x, F.col(f"{c}__fill")))
    return joined.drop(*[f"{c}__fill" for c in cols])


def group_znorm(
    df: DataFrame,
    cols: str | Sequence[str],
    by: str = DEFAULT_KEY,
    suffix: str = "_z",
) -> DataFrame:
    """WITHIN-group z-normalization: ``x → (x − mean_g) / std_g`` where
    the moments come from the row's own ``by`` group (sample stddev).
    Groups with zero/undefined variance (constant or single-row) emit
    0.0 — the mean-centered neutral point, mirroring
    :func:`apply_standardizer`'s degenerate-column rule.

    This is the leakage-SAFE normalization for group-local context
    ("how long is this turn relative to ITS conversation") — the
    moments never cross conversations, so there is nothing to leak
    from a train/test split. For corpus-level scaling use
    :func:`fit_standardizer` on the train split +
    :func:`apply_standardizer`.

    Plan: one whole-partition window aggregate per ``by`` group (no
    ORDER BY → no sort-within-frame; Spark computes the unbounded
    frame in one pass). Partition size is bounded by group size — at
    10^12 turns the conversation key keeps every partition small; a
    GLOBAL znorm via this path would be one task and is exactly what
    fit/apply_standardizer exists to avoid.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    w = Window.partitionBy(by)
    for c in cols:
        x = F.col(c).cast("double")
        m = F.avg(x).over(w)
        sd = F.stddev_samp(x).over(w)
        df = df.withColumn(
            f"{c}{suffix}",
            F.when(sd > 0, F.round((x - m) / sd, 6)).otherwise(F.lit(0.0)),
        )
    return df


def fit_target_encode(fit_df: DataFrame, col: str, label: str,
                      smoothing: float = 20.0,
                      round_to: int | None = None) -> DataFrame:
    """Smoothed global target (mean) encoding fitted on the FIT frame
    (train split): per category, ``(sum(label) + m·prior) / (count +
    m)`` with ``prior`` = the fit frame's overall label mean — the
    standard empirical-Bayes shrinkage, so thin categories pull toward
    the prior instead of memorizing noise. Returns ``(value, te,
    prior)`` — ``prior`` rides along (same value every row) so
    :func:`apply_target_encode` can encode UNSEEN categories without a
    second fit scan. For encoding the training split itself use
    :func:`target_encode_oof` (this global fit would let each row see
    its own label).

    One hash aggregate on the category; the prior is a broadcast
    one-row cross. The result is category-dimension-sized — broadcast
    material."""
    y = F.col(label).cast("double")
    cat = fit_df.groupBy(F.col(col).alias("value")).agg(
        F.sum(y).alias("__s"), F.count(y).alias("__n"))
    prior = fit_df.agg(
        (F.sum(y) / F.count(y)).alias("prior"))
    m = F.lit(float(smoothing))
    te = (F.col("__s") + m * F.col("prior")) / (F.col("__n") + m)
    if round_to is not None:
        te = F.round(te, round_to)
    return (cat.crossJoin(F.broadcast(prior))
            .select("value", te.alias("te"), "prior"))


def apply_target_encode(df: DataFrame, enc: DataFrame, col: str,
                        out: str | None = None) -> DataFrame:
    """Broadcast-apply a :func:`fit_target_encode` table; unseen/null
    categories encode to the fit prior (the log-loss-neutral choice —
    0.0 would assert 'never positive'). The encoded frame never
    shuffles."""
    out = out or f"{col}__te"
    pri = enc.agg(F.first("prior").alias("__prior"))
    joined = (df.join(F.broadcast(enc.select(F.col("value").alias(f"__{col}_v"),
                                             F.col("te").alias("__te"))),
                      F.col(col).eqNullSafe(F.col(f"__{col}_v")), "left")
              .crossJoin(F.broadcast(pri)))
    return (joined.withColumn(out, F.coalesce(F.col("__te"),
                                              F.col("__prior")))
            .drop(f"__{col}_v", "__te", "__prior"))


def target_encode_oof(df: DataFrame, col: str, label: str, key: str,
                      n_folds: int = 5, smoothing: float = 20.0,
                      seed: int = 0, out: str | None = None,
                      round_to: int | None = None) -> DataFrame:
    """Out-of-fold target encoding for the TRAINING split itself: rows
    are assigned a deterministic fold from ``key`` (det-hash — identical
    across cluster sizes and reproducible by the SQL oracle), and each
    row's category is encoded using label statistics from the OTHER
    folds only: ``te = (Σ_c − Σ_cf + m·prior_f) / (n_c − n_cf + m)``
    with ``prior_f`` the label mean excluding fold f. The row's own
    label never reaches its own feature — the K-fold analogue of the
    ordered :class:`TargetEncode`, without its per-category window.

    Plan: ONE corpus hash aggregate to the (category × fold) cell frame
    (C·k rows — dimension-sized), all leave-one-fold-out arithmetic on
    that frame (a category window + a fold join + a one-row cross), and
    one broadcast join back on (category, fold). The corpus shuffles
    zero times beyond the cell aggregate's map-side combine; adding
    folds never multiplies the row stream."""
    from hipipe_spark.functions.hashing import det_hash_i64
    out = out or f"{col}__te"
    fold = F.pmod(det_hash_i64(F.col(key), seed), F.lit(n_folds))
    y = F.col(label).cast("double")
    base = df.withColumn("__fold", fold.cast("int"))
    cell = base.groupBy(F.col(col).alias("__v"), "__fold").agg(
        F.sum(y).alias("__s"), F.count(y).alias("__n"))
    wc = Window.partitionBy("__v")
    cell = (cell.withColumn("__cs", F.sum("__s").over(wc))
                .withColumn("__cn", F.sum("__n").over(wc)))
    ftot = cell.groupBy("__fold").agg(
        F.sum("__s").alias("__fs"), F.sum("__n").alias("__fn"))
    tot = cell.agg(F.sum("__s").alias("__ts"), F.sum("__n").alias("__tn"))
    m = F.lit(float(smoothing))
    prior_f = ((F.col("__ts") - F.col("__fs"))
               / (F.col("__tn") - F.col("__fn")))
    te = ((F.col("__cs") - F.col("__s") + m * prior_f)
          / (F.col("__cn") - F.col("__n") + m))
    if round_to is not None:
        te = F.round(te, round_to)
    enc = (cell.join(ftot, "__fold")
           .crossJoin(F.broadcast(tot))
           .select("__v", F.col("__fold").alias("__efold"), te.alias(out)))
    return (base.join(
        F.broadcast(enc),
        F.col(col).eqNullSafe(F.col("__v"))
        & (F.col("__fold") == F.col("__efold")),
        "left")
        .drop("__v", "__efold")
        .withColumnRenamed("__fold", f"{col}__fold"))


def hash_features(df: DataFrame,
                  cols: Sequence[str | tuple[str, ...]],
                  n_buckets: int = 1024, seed: int = 0,
                  out: str = "fh") -> DataFrame:
    """The hashing trick: categorical columns (and column CROSSES,
    passed as tuples) map to a fixed ``n_buckets``-dimensional sparse
    vector with ±1 signs — the unbounded-vocabulary encoder (no fit
    pass, no vocab table, no unseen-category problem; new categories
    at serve time land in a stable bucket). Emits ``{out}_idx``
    (sorted distinct buckets) and ``{out}_val`` (signed sums —
    same-row collisions add, the signature property that keeps the
    estimator unbiased).

    Bucket and sign derive from :func:`det_hash_str_i64` over
    ``"name=value"`` (nulls hash as a distinct token), so the vector is
    identical across cluster sizes and bit-reproducible by the DuckDB
    oracle. Pure narrow map — array expressions over each row, no
    shuffle, no fit scan, no UDF; the per-row work is O(f²) in the
    handful of hashed features, not in ``n_buckets``."""
    from hipipe_spark.functions.hashing import det_hash_str_i64
    entries = []
    for c in cols:
        if isinstance(c, tuple):
            name = "x".join(c)
            val = F.concat_ws(
                "\x1f", *[F.coalesce(F.col(x).cast("string"),
                                     F.lit("<NULL>")) for x in c])
        else:
            name = c
            val = F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
        h = det_hash_str_i64(F.concat(F.lit(name + "="), val), seed)
        b = F.pmod(h, F.lit(n_buckets)).cast("int")
        s = (F.lit(1.0) - 2.0 * F.pmod(F.floor(h / n_buckets), F.lit(2))
             .cast("double"))
        entries.append(F.struct(b.alias("b"), s.alias("s")))
    earr = F.array(*entries)
    idx = F.array_sort(F.array_distinct(
        F.transform(earr, lambda e: e["b"])))
    val = F.transform(
        idx,
        lambda b: F.aggregate(
            earr, F.lit(0.0),
            lambda acc, e: acc + F.when(e["b"] == b, e["s"])
                                  .otherwise(F.lit(0.0))))
    return df.withColumn(f"{out}_idx", idx).withColumn(f"{out}_val", val)


def quantile_normalize(df: DataFrame, group: str, value: str,
                       order_col: str,
                       out: str = "qn_value") -> DataFrame:
    """Classic quantile normalization (Bolstad et al. 2003 — the
    microarray/batch-effect workhorse): force every group's
    distribution onto the shared reference formed by averaging the
    groups' order statistics — after it, every group has IDENTICAL
    marginal distribution while each row keeps its within-group rank.

    Requires equal group sizes (the classical contract; raises
    otherwise). ``order_col`` breaks value ties deterministically so
    ranks — and the driver hash — are stable at any parallelism.

    Plan: one rank window per group, one rank-dimension aggregate
    (n_rows/n_groups rows), one broadcast join back. Output: input
    columns + ``out`` (double, rounded 6).
    """
    sizes = [r["n"] for r in
             df.groupBy(group).agg(F.count("*").alias("n"))
             .select("n").distinct().collect()]
    if len(sizes) > 1:
        raise ValueError(
            f"quantile_normalize requires equal group sizes, got "
            f"{sorted(sizes)}")
    v = F.col(value).cast("double")
    w = Window.partitionBy(group).orderBy(v.asc(), F.col(order_col))
    ranked = df.withColumn("__r", F.row_number().over(w))
    ref = (ranked.groupBy("__r")
           .agg(F.avg(v).alias("__ref")))
    return (ranked.join(F.broadcast(ref), "__r")
            .withColumn(out, F.round(F.col("__ref"), 6))
            .drop("__r", "__ref"))
