"""Training-data evaluation primitives: exact AUC, inter-rater
agreement, and RLHF preference-pair construction.

A feature pipeline that cannot score its own outputs is flying blind:
before any feature ships, the questions are "does this score separate
the label?" (AUC), "do my two labeling heuristics / annotators agree
beyond chance?" (Cohen's kappa), and — for preference tuning — "which
(chosen, rejected) pairs does this corpus yield?". hipipe leaves all of
this to downstream Python (reference `stream/transform.hpp` stages emit
columns and stop there); at 100 TB the evaluation itself must be a
distributed plan.

Scale notes:

- :func:`auc_roc` never sorts rows. It aggregates per DISTINCT score
  (one shuffle, map-side combinable), runs one ordered window over the
  distinct-score table (orders of magnitude smaller than the data; for
  a continuous score consider rounding/binning first), and folds to a
  single row. The Mann-Whitney tie correction (ties count 1/2) is exact.
- :func:`cohens_kappa` is two hash aggregations (cells, then marginals)
  joined on nothing larger than the category cross — no window at all.
- :func:`preference_pairs` is one window sort per group plus an
  equi-join on (group, pair_rank): each group emits at most
  ``per_group`` pairs, so output is bounded regardless of group size —
  no quadratic all-pairs blowup on a hot prompt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_roc(df: DataFrame, score: str, label: str,
            ndigits: int = 6) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney, tie-corrected) of ``score`` vs a
    binary 0/1 ``label``. Returns ONE row: ``n, npos, nneg, auc, gini``.

    AUC = P(score_pos > score_neg) + 0.5 * P(score_pos = score_neg),
    computed from per-distinct-score counts: for each score group g
    (ascending), its positives beat every negative below it and tie
    half the negatives inside it:

        auc = sum_g pos_g * (cum_neg_before_g + neg_g / 2) / (npos*nneg)

    Degenerate labels (npos or nneg = 0) yield ``auc = NULL`` rather
    than a division error (Spark 4 runs ANSI mode).
    """
    per_score = (
        df.select(F.col(score).alias("__s"),
                  F.col(label).cast("double").alias("__y"))
          .groupBy("__s")
          .agg(F.sum("__y").alias("__pos"),
               (F.count(F.lit(1)) - F.sum("__y")).alias("__neg"))
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    contrib = per_score.select(
        "__pos", "__neg",
        F.coalesce(F.sum("__neg").over(w), F.lit(0.0)).alias("__neg_below"),
    )
    agg = contrib.agg(
        (F.sum("__pos") + F.sum("__neg")).cast("bigint").alias("n"),
        F.sum("__pos").cast("bigint").alias("npos"),
        F.sum("__neg").cast("bigint").alias("nneg"),
        F.sum(F.col("__pos") * (F.col("__neg_below") + F.col("__neg") / 2))
         .alias("__u"),
    )
    denom = F.col("npos") * F.col("nneg")
    auc = F.when(denom > 0, F.round(F.col("__u") / denom, ndigits))
    return agg.select(
        "n", "npos", "nneg", auc.alias("auc"),
        F.when(denom > 0,
               F.round(2 * F.col("__u") / denom - 1, ndigits)).alias("gini"),
    )


def cohens_kappa(df: DataFrame, rater_a: str, rater_b: str,
                 ndigits: int = 6) -> DataFrame:
    """Cohen's kappa between two categorical rating columns.

    Returns ONE row: ``n, po, pe, kappa`` where ``po`` is observed
    agreement, ``pe`` chance agreement from the two raters' marginal
    distributions, and ``kappa = (po - pe) / (1 - pe)`` (NULL when
    ``pe = 1`` — a constant pair of raters has no chance-corrected
    signal, and ANSI mode would otherwise throw on the 0 denominator).

    Plan: one count aggregation keyed by the (a, b) cell, then the
    marginals fold driver-free via two more tiny aggregations over the
    cell table — everything map-side combinable, no window, no join
    wider than the category cross.
    """
    cells = (
        df.select(F.col(rater_a).alias("__a"), F.col(rater_b).alias("__b"))
          .groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__c"))
    )
    agg = cells.agg(
        F.sum("__c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))
               .otherwise(F.lit(0))).alias("__agree"),
    )
    # pe needs sum_k ca_k * cb_k over every category either rater used
    # (a category the raters never agree on still contributes), so the
    # marginals come from explicit per-rater tables — tiny (one row per
    # category) and broadcast into the single-row aggregate.
    ma = cells.groupBy(F.col("__a").alias("__k")).agg(
        F.sum("__c").alias("__ca"))
    mb = cells.groupBy(F.col("__b").alias("__k")).agg(
        F.sum("__c").alias("__cb"))
    pe_tab = ma.join(mb, "__k").agg(
        F.sum(F.col("__ca").cast("double") * F.col("__cb")).alias("__pe_num"))
    out = agg.crossJoin(F.broadcast(pe_tab))
    po = F.col("__agree") / F.col("n")
    pe = F.coalesce(F.col("__pe_num"), F.lit(0.0)) / (
        F.col("n").cast("double") * F.col("n"))
    return out.select(
        "n",
        F.round(po, ndigits).alias("po"),
        F.round(pe, ndigits).alias("pe"),
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), ndigits))
         .alias("kappa"),
    )


def fleiss_kappa(df: DataFrame, item_col: str, rating_col: str,
                 ndigits: int = 6) -> DataFrame:
    """Fleiss' kappa: chance-corrected agreement among ANY number of
    raters per item (each input row = one rating of one item) — the
    multi-annotator generalization of :func:`cohens_kappa`, the
    RLHF-labeling QA gate. Uses the standard variable-rater
    generalization: items with fewer than 2 ratings carry no
    agreement signal and are excluded everywhere (including the
    category marginals).

    Returns ONE row: ``n_items, n_ratings, p_bar, p_e, kappa`` with
    ``P_i = (Σ_j n_ij² − n_i) / (n_i (n_i − 1))``, ``p_bar = mean_i
    P_i``, ``p_e = Σ_j (Σ_i n_ij / N)²``, ``kappa = (p_bar − p_e) /
    (1 − p_e)`` (NULL when ``p_e = 1``).

    Plan: ONE shuffle of the rating log to (item, category) cells;
    everything after is cell-table-sized (per-item fold, category
    marginals, two 1-row aggregates crossJoined via broadcast). The
    cell table is persisted so the two folds share one computation —
    caller releases via ``release_cached`` on the result.
    """
    from hipipe_spark.operators.core import register_cached
    cells = (df.select(F.col(item_col).alias("__i"),
                       F.col(rating_col).alias("__r"))
             .groupBy("__i", "__r").agg(F.count(F.lit(1)).alias("__c"))
             .persist())
    per_item = (cells.groupBy("__i")
                .agg(F.sum("__c").alias("__ni"),
                     F.sum(F.col("__c") * F.col("__c")).alias("__si"))
                .filter(F.col("__ni") >= 2))
    pbar = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("__ni").cast("bigint").alias("n_ratings"),
        F.avg((F.col("__si") - F.col("__ni")).cast("double")
              / (F.col("__ni") * (F.col("__ni") - 1))).alias("__pbar"))
    marg = (cells.join(per_item.select("__i"), "__i")
            .groupBy("__r").agg(F.sum("__c").alias("__cj")))
    pe_tab = marg.agg(
        F.sum(F.col("__cj").cast("double") * F.col("__cj")).alias("__pe_num"))
    out = pbar.crossJoin(F.broadcast(pe_tab))
    pe = F.coalesce(
        F.col("__pe_num")
        / (F.col("n_ratings").cast("double") * F.col("n_ratings")),
        F.lit(0.0))
    return register_cached(
        out.select(
            "n_items", "n_ratings",
            F.round("__pbar", ndigits).alias("p_bar"),
            F.round(pe, ndigits).alias("p_e"),
            F.when(pe < 1.0,
                   F.round((F.col("__pbar") - pe) / (1.0 - pe), ndigits))
             .alias("kappa")),
        cells)


def krippendorff_alpha(df: DataFrame, item_col: str, rating_col: str,
                       ndigits: int = 6) -> DataFrame:
    """Krippendorff's alpha (nominal metric) — the agreement
    coefficient that stays well-defined under missing ratings and
    per-item rater counts, where :func:`fleiss_kappa`'s chance model
    is only approximate. Each input row = one rating of one item;
    items with fewer than 2 ratings carry no pairable information and
    are excluded (Krippendorff's own rule).

    ``alpha = 1 − D_o / D_e`` with
    ``D_o = (1/n) Σ_u Σ_c n_uc (n_u − n_uc) / (n_u − 1)`` and
    ``D_e = (1/(n(n−1))) Σ_c n_c (n − n_c)`` over the n pairable
    ratings. Returns ONE row: ``n_items, n_ratings, d_o, d_e, alpha``
    (alpha NULL when ``D_e = 0`` — a single observed category has no
    disagreement to correct for).

    Plan: identical shape to :func:`fleiss_kappa` — ONE shuffle of the
    rating log to (item, category) cells, then cell-sized folds; the
    persisted cell table is released by the caller via
    ``release_cached``.
    """
    from hipipe_spark.operators.core import register_cached
    cells = (df.select(F.col(item_col).alias("__i"),
                       F.col(rating_col).alias("__r"))
             .groupBy("__i", "__r").agg(F.count(F.lit(1)).alias("__c"))
             .persist())
    per_item = (cells.groupBy("__i")
                .agg(F.sum("__c").alias("__ni"))
                .filter(F.col("__ni") >= 2))
    paired = cells.join(per_item, "__i")
    do_tab = paired.agg(
        F.countDistinct("__i").cast("bigint").alias("n_items"),
        F.sum(F.col("__c").cast("double")
              * (F.col("__ni") - F.col("__c"))
              / (F.col("__ni") - 1)).alias("__do_num"))
    marg = paired.groupBy("__r").agg(F.sum("__c").alias("__nc"))
    n_tab = marg.agg(
        F.sum("__nc").cast("bigint").alias("n_ratings"),
        F.sum(F.col("__nc").cast("double") * F.col("__nc"))
         .alias("__sq"))
    out = do_tab.crossJoin(F.broadcast(n_tab))
    n = F.col("n_ratings").cast("double")
    d_o = F.col("__do_num") / n
    d_e = (n * n - F.col("__sq")) / (n * (n - 1))
    return register_cached(
        out.select(
            "n_items", "n_ratings",
            F.round(d_o, ndigits).alias("d_o"),
            F.round(d_e, ndigits).alias("d_e"),
            F.when(d_e > 0, F.round(1.0 - d_o / d_e, ndigits))
             .alias("alpha")),
        cells)


def preference_pairs(df: DataFrame, group: str, cand_id: str, score: str,
                     per_group: int = 1, min_margin: float = 0.0,
                     ndigits: int = 6) -> DataFrame:
    """Build (chosen, rejected) preference pairs per ``group``.

    For each group, rank candidates by (``score`` desc, ``cand_id``
    asc — the deterministic tie-break). Pair the i-th best with the
    i-th worst for i = 1..``per_group``, skipping pairs that cross the
    middle (2i > group size), self-pairs, and pairs whose score margin
    is below ``min_margin``. Output columns::

        group, pair_rank, chosen_id, rejected_id,
        chosen_score, rejected_score, margin

    This is the standard best-vs-worst construction for preference
    tuning (DPO/RLHF reward data): bounded output (≤ ``per_group``
    rows per group), one window sort per group — both rankings share
    the same partition+order so Catalyst plans a single exchange+sort
    — and an equi-join on (group, pair_rank) that never fans out.
    """
    base = df.select(
        F.col(group).alias("grp"),
        F.col(cand_id).alias("cid"),
        F.col(score).cast("double").alias("sc"),
    )
    w_best = Window.partitionBy("grp").orderBy(
        F.col("sc").desc(), F.col("cid").asc())
    w_worst = Window.partitionBy("grp").orderBy(
        F.col("sc").asc(), F.col("cid").desc())
    ranked = base.select(
        "grp", "cid", "sc",
        F.row_number().over(w_best).alias("rb"),
        F.row_number().over(w_worst).alias("rw"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("gn"),
    )
    chosen = (ranked.filter(F.col("rb") <= per_group)
                    .select(F.col("grp"), F.col("rb").alias("pair_rank"),
                            F.col("cid").alias("chosen_id"),
                            F.col("sc").alias("chosen_score"),
                            F.col("gn")))
    rejected = (ranked.filter(F.col("rw") <= per_group)
                      .select(F.col("grp"), F.col("rw").alias("pair_rank"),
                              F.col("cid").alias("rejected_id"),
                              F.col("sc").alias("rejected_score")))
    out = (
        chosen.join(rejected, ["grp", "pair_rank"])
              .filter(2 * F.col("pair_rank") <= F.col("gn"))
              .filter(F.col("chosen_id") != F.col("rejected_id"))
              .filter(F.col("chosen_score") - F.col("rejected_score")
                      >= F.lit(float(min_margin)))
    )
    return out.select(
        F.col("grp").alias(group), "pair_rank", "chosen_id", "rejected_id",
        F.round("chosen_score", ndigits).alias("chosen_score"),
        F.round("rejected_score", ndigits).alias("rejected_score"),
        F.round(F.col("chosen_score") - F.col("rejected_score"),
                ndigits).alias("margin"),
    )


def ranking_metrics(df: DataFrame, group: str, score: str, rel: str,
                    tiebreak: str, k: int = 10) -> DataFrame:
    """Per-query ranking quality: nDCG@k, MRR, precision@k, recall@k.

    Input: one row per (query ``group``, candidate) with the ranker's
    ``score`` and a graded ``rel``evance (0 = irrelevant). ``tiebreak``
    (e.g. the candidate id) makes equal-score orderings deterministic —
    required, because nDCG under ties is otherwise engine-dependent.

    Definitions: system order = score desc; gain = 2^rel - 1;
    DCG@k = sum gain_i / log2(i+1); ideal order = rel desc (same
    tiebreak); nDCG = DCG/IDCG (0 when the query has no relevant
    candidate); MRR uses the first rank with rel > 0 (0 if none);
    recall@k counts relevant in top-k over all relevant.

    Plan: ONE exchange on ``group``, two in-partition window sorts
    (system + ideal order), one aggregate. Output is one row per
    query — feed to ``.agg(avg(...))`` for the headline mean.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sys_w = Window.partitionBy(group).orderBy(
        F.col(score).desc(), F.col(tiebreak).asc())
    ideal_w = Window.partitionBy(group).orderBy(
        F.col(rel).desc(), F.col(tiebreak).asc())
    gain = F.pow(F.lit(2.0), F.col(rel).cast("double")) - 1
    ranked = df.select(
        F.col(group).alias("group"),
        F.col(rel).cast("double").alias("rel"),
        F.row_number().over(sys_w).alias("sys_rank"),
        F.row_number().over(ideal_w).alias("ideal_rank"),
        gain.alias("gain"),
    )
    in_k = F.col("sys_rank") <= k
    dcg = F.sum(F.when(in_k, F.col("gain")
                       / F.log2(F.col("sys_rank") + 1)).otherwise(0.0))
    idcg = F.sum(F.when(F.col("ideal_rank") <= k,
                        F.col("gain")
                        / F.log2(F.col("ideal_rank") + 1)).otherwise(0.0))
    first_rel = F.min(F.when(F.col("rel") > 0, F.col("sys_rank")))
    n_rel = F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
    n_rel_k = F.sum(F.when(in_k & (F.col("rel") > 0), 1).otherwise(0))
    return (ranked.groupBy("group")
            .agg(dcg.alias("dcg"), idcg.alias("idcg"),
                 first_rel.alias("first_rel"),
                 n_rel.alias("n_rel"), n_rel_k.alias("n_rel_k"))
            .select(
                "group",
                F.round(F.when(F.col("idcg") > 0,
                               F.col("dcg") / F.col("idcg"))
                        .otherwise(0.0), 6).alias(f"ndcg_at_{k}"),
                F.round(F.when(F.col("first_rel").isNotNull(),
                               1.0 / F.col("first_rel"))
                        .otherwise(0.0), 6).alias("mrr"),
                F.round(F.col("n_rel_k") / F.lit(float(k)), 6)
                 .alias(f"precision_at_{k}"),
                F.round(F.when(F.col("n_rel") > 0,
                               F.col("n_rel_k") / F.col("n_rel"))
                        .otherwise(0.0), 6).alias(f"recall_at_{k}")))


def calibration_report(df: DataFrame, prob: str, label: str,
                       n_bins: int = 10) -> DataFrame:
    """Probability-calibration diagnostics: per-bin reliability table
    plus the two headline scalars — ECE (expected calibration error,
    the confidence-vs-accuracy gap weighted by bin mass) and the Brier
    score (mean squared error of the probability), repeated on every
    row like psi_table's total so table + scalars ship in one result.

    Bins are uniform on [0, 1]; ``prob`` exactly 1.0 lands in the top
    bin. Empty bins are emitted with zero counts and null rates (they
    contribute nothing to ECE).

    Plan: one map-side-combinable aggregate to <= n_bins rows, window
    sums over that tiny table for the scalars — the only full-data
    work is the single scan (Brier's sum of squares rides the same
    aggregate).
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    p = F.col(prob).cast("double")
    y = F.col(label).cast("double")
    binc = F.least(F.lit(n_bins - 1),
                   F.floor(p * n_bins).cast("int")).alias("bin")
    agg = (df.select(binc, p.alias("p"), y.alias("y"),
                     ((p - y) * (p - y)).alias("sq"))
             .groupBy("bin")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.avg("p").alias("avg_prob"),
                  F.avg("y").alias("frac_pos"),
                  F.sum("sq").alias("sq_sum")))
    spark = df.sparkSession
    grid = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    full = (grid.join(F.broadcast(agg), "bin", "left")
            .select("bin",
                    F.coalesce("n", F.lit(0)).alias("n"),
                    "avg_prob", "frac_pos",
                    F.coalesce("sq_sum", F.lit(0.0)).alias("sq_sum")))
    w = Window.partitionBy()
    total_n = F.sum("n").over(w)
    gap = F.abs(F.col("avg_prob") - F.col("frac_pos"))
    ece = F.sum(F.when(F.col("n") > 0, gap * F.col("n")).otherwise(0.0)).over(w) / total_n
    brier = F.sum("sq_sum").over(w) / total_n
    return full.select(
        "bin", "n",
        F.round("avg_prob", 6).alias("avg_prob"),
        F.round("frac_pos", 6).alias("frac_pos"),
        F.round(ece, 6).alias("ece"),
        F.round(brier, 6).alias("brier"))


def isotonic_calibrate(df: DataFrame, prob: str, label: str,
                       n_bins: int = 20, ndigits: int = 6) -> DataFrame:
    """Isotonic (PAV) probability calibration on the binned
    reliability table — the monotone recalibration map that
    :func:`calibration_report` diagnoses the need for. Scores bin
    uniformly on [0, 1] (same rule as calibration_report; 1.0 lands in
    the top bin); the non-empty bin table collects driver-side
    (dimension-sized, ≤ n_bins rows) and pool-adjacent-violators runs
    there with EXACT integer pool comparisons (cross-multiplied
    Σlabel·Σn, no float drift in the pooling decisions, assuming 0/1
    labels). Returns one row per non-empty bin: ``bin, n, avg_prob,
    frac_pos, calibrated`` — ``calibrated`` is the monotone fit, i.e.
    the minimax ``max_{i≤b} min_{j≥b} (Σ_{i..j} labels / Σ_{i..j} n)``.

    Plan: ONE map-side-combinable aggregate over the corpus to
    ≤ n_bins rows; PAV is driver-side on that. Apply the map with a
    broadcast join on ``bin``.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    p = F.col(prob).cast("double")
    y = F.col(label).cast("double")
    binc = F.least(F.lit(n_bins - 1),
                   F.floor(p * n_bins).cast("int")).alias("bin")
    rows = (df.select(binc, p.alias("p"), y.alias("y"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("p").alias("avg_prob"),
                 F.sum("y").alias("sy"))
            .orderBy("bin").collect())
    # PAV over (W=Σn, S=Σy) pools; violation test S1*W2 > S2*W1 is
    # integer-exact for 0/1 labels
    pools: list[list] = []  # [W, S, n_bins_in_pool]
    for r in rows:
        pools.append([int(r["n"]), float(r["sy"]), 1])
        while (len(pools) > 1
               and pools[-2][1] * pools[-1][0]
               > pools[-1][1] * pools[-2][0]):
            w2, s2, c2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
            pools[-1][2] += c2
    cal: list[float] = []
    for pw, ps, pc in pools:
        cal.extend([ps / pw] * pc)
    out = [(int(r["bin"]), int(r["n"]),
            round(float(r["avg_prob"]), ndigits),
            round(float(r["sy"]) / int(r["n"]), ndigits),
            round(c, ndigits))
           for r, c in zip(rows, cal)]
    return df.sparkSession.createDataFrame(
        out, "bin int, n bigint, avg_prob double, "
             "frac_pos double, calibrated double")


def bradley_terry(
    pairs: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    n_iter: int = 20,
    round_to: int | None = None,
) -> DataFrame:
    """Bradley-Terry strength ratings from pairwise preference
    outcomes — the arena-leaderboard / RLHF-annotator-calibration
    aggregate: given (winner, loser) comparison rows, estimate p_i
    with P(i beats j) = p_i / (p_i + p_j), via the classic MM update
    (Zermelo 1929 / Hunter 2004):

        p_i' = W_i / Σ_{j≠i} n_ij / (p_i + p_j)

    normalized each round to mean 1 (the MM iteration is scale-free).
    Deterministic; items that never win (or never lose) drift toward
    0 (or +inf) as in the MLE — regularize upstream by adding pseudo
    comparisons if the graph is not strongly connected.

    Scale shape: the raw comparison log (the big side — billions of
    judgments) collapses in ONE distributed shuffle to the canonical
    (i<j) pair-count aggregate plus per-item win counts, both
    item²-bounded. The MM iteration then runs driver-side in numpy on
    that aggregate — ratings are dimension-sized state (same policy
    as IVF centroids / index_mapper offsets), and 20 numpy rounds on
    ≤10⁶ pair rows beat 20 distributed 3-stage rounds by orders of
    magnitude. No per-row Python touches the log.

    Returns ``(item, rating, n_wins, n_comparisons)``.
    """
    import numpy as np

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    spark = pairs.sparkSession
    raw = pairs.select(F.col(winner_col).alias("i"),
                       F.col(loser_col).alias("j"))
    # the only log-sized shuffles: canonical pair counts + win counts
    nij_pd = (raw.select(F.least("i", "j").alias("a"),
                         F.greatest("i", "j").alias("b"))
              .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
              .toPandas())
    wins_pd = (raw.groupBy("i").agg(F.count(F.lit(1)).alias("w"))
               .toPandas())

    item_type = pairs.schema[winner_col].dataType.simpleString()
    out_schema = (f"item {item_type}, rating double, "
                  "n_wins bigint, n_comparisons bigint")
    if len(nij_pd) == 0:
        return spark.createDataFrame([], out_schema)

    items = sorted(set(nij_pd["a"]) | set(nij_pd["b"]))
    idx = {it: k for k, it in enumerate(items)}
    a = nij_pd["a"].map(idx).to_numpy()
    b = nij_pd["b"].map(idx).to_numpy()
    n = nij_pd["n"].to_numpy(dtype=np.float64)
    w = np.zeros(len(items))
    w[wins_pd["i"].map(idx).to_numpy()] = wins_pd["w"].to_numpy(
        dtype=np.float64)
    tot = np.zeros(len(items))
    np.add.at(tot, a, n)
    np.add.at(tot, b, n)

    p = np.ones(len(items))
    for _ in range(n_iter):
        t = n / (p[a] + p[b])
        d = np.zeros(len(items))
        np.add.at(d, a, t)
        np.add.at(d, b, t)
        newp = np.where(d > 0, w / np.where(d > 0, d, 1.0), 1.0)
        p = newp / newp.mean()
    if round_to is not None:
        p = np.round(p, round_to)

    rows = [(it, float(p[k]), int(w[k]), int(tot[k]))
            for k, it in enumerate(items)]
    return spark.createDataFrame(rows, out_schema)


def bradley_terry_oracle_sql(
    pairs_sql: str,
    n_iter: int = 20,
    round_to: int = 6,
) -> str:
    """DuckDB replica of :func:`bradley_terry` — MM rounds unrolled
    into MATERIALIZED CTEs. ``pairs_sql`` must yield (i, j) =
    (winner, loser)."""
    pre = f"""
      WITH raw AS ({pairs_sql}),
      nij AS MATERIALIZED (
        SELECT least(i, j) AS a, greatest(i, j) AS b,
               CAST(count(*) AS DOUBLE) AS n
        FROM raw GROUP BY 1, 2),
      wins AS MATERIALIZED (
        SELECT i AS item, CAST(count(*) AS DOUBLE) AS w
        FROM raw GROUP BY i),
      items AS MATERIALIZED (
        SELECT i AS item FROM raw UNION SELECT j FROM raw),
      totals AS (
        SELECT item, CAST(sum(n) AS BIGINT) AS n_comparisons FROM (
          SELECT a AS item, n FROM nij
          UNION ALL SELECT b AS item, n FROM nij) GROUP BY item),
      p0 AS MATERIALIZED (SELECT item, 1.0 AS p FROM items)"""
    steps = []
    for t in range(1, n_iter + 1):
        prev = f"p{t-1}"
        steps.append(f"""
      , dt{t} AS (
          SELECT nij.a, nij.b,
                 nij.n / (pa.p + pb.p) AS t
          FROM nij JOIN {prev} pa ON pa.item = nij.a
                   JOIN {prev} pb ON pb.item = nij.b)
      , dn{t} AS (
          SELECT item, sum(t) AS d FROM (
            SELECT a AS item, t FROM dt{t}
            UNION ALL SELECT b AS item, t FROM dt{t}) GROUP BY item)
      , np{t} AS MATERIALIZED (
          SELECT i.item,
                 CASE WHEN COALESCE(d.d, 0) > 0
                      THEN COALESCE(w.w, 0) / d.d ELSE 1.0 END AS p
          FROM items i
          LEFT JOIN wins w ON w.item = i.item
          LEFT JOIN dn{t} d ON d.item = i.item)
      , p{t} AS MATERIALIZED (
          SELECT item, p / (SELECT avg(p) FROM np{t}) AS p FROM np{t})""")
    return (pre + "".join(steps) + f"""
      SELECT p.item, round(p.p, {round_to}) AS rating,
             CAST(COALESCE(w.w, 0) AS BIGINT) AS n_wins,
             COALESCE(t.n_comparisons, 0) AS n_comparisons
      FROM p{n_iter} p
      LEFT JOIN wins w ON w.item = p.item
      LEFT JOIN totals t ON t.item = p.item""")


def classification_report(df: DataFrame, label: str,
                          pred: str) -> DataFrame:
    """Per-class precision/recall/F1 over a multiclass prediction
    table: ONE hash aggregate to the (label, pred) confusion cells —
    a class²-sized table, never the raw rows — then cell arithmetic.
    Classes present in either column are reported (absent counts are
    0; undefined ratios are null, the sklearn zero-division=nan
    convention).

    Output: ``class, tp, fp, fn, support (bigints), precision,
    recall, f1 (doubles, rounded 6)``, ordered by class.
    """
    cells = (df.groupBy(F.col(label).cast("string").alias("lab"),
                        F.col(pred).cast("string").alias("prd"))
             .agg(F.count("*").alias("n")))
    classes = (cells.select(F.col("lab").alias("cls"))
               .union(cells.select("prd")).distinct())
    tp = F.sum(F.when(F.col("lab") == F.col("prd"), F.col("n"))
               .otherwise(0))
    by_lab = cells.groupBy(F.col("lab").alias("cls")).agg(
        tp.alias("tp_l"), F.sum("n").alias("support"))
    by_prd = cells.groupBy(F.col("prd").alias("cls")).agg(
        tp.alias("tp_p"), F.sum("n").alias("n_pred"))
    j = (classes.join(by_lab, "cls", "left")
         .join(by_prd, "cls", "left")
         .select("cls",
                 F.coalesce(F.col("tp_l"), F.lit(0)).alias("tp"),
                 F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
                 F.coalesce(F.col("support"), F.lit(0))
                  .alias("support")))
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    rec = F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
    f1 = F.when((F.col("n_pred") > 0) & (F.col("support") > 0),
                2 * F.col("tp")
                / (F.col("n_pred") + F.col("support")))
    return (j.select(
        F.col("cls").alias("class"),
        F.col("tp").cast("bigint"),
        (F.col("n_pred") - F.col("tp")).cast("bigint").alias("fp"),
        (F.col("support") - F.col("tp")).cast("bigint").alias("fn"),
        F.col("support").cast("bigint"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"))
        .orderBy("class"))


def classifier_summary(df: DataFrame, label: str,
                       pred: str) -> DataFrame:
    """One-row multiclass summary: accuracy, macro-F1 (unweighted
    class mean, absent-class F1 counted as 0 per sklearn), weighted
    F1 (support-weighted), and the Gorodkin (2004) multiclass
    Matthews correlation
    ``(c·s − Σ pₖtₖ) / sqrt((s² − Σpₖ²)(s² − Σtₖ²))``
    — all from the same class²-sized confusion-cell aggregate.
    Doubles rounded 6; MCC null when a marginal is degenerate.
    """
    rep = classification_report(df, label, pred)
    per = rep.select(
        "support", "tp",
        (F.col("tp") + F.col("fp")).alias("n_pred"),
        F.coalesce(F.col("f1"), F.lit(0.0)).alias("f1z"))
    agg = per.agg(
        F.sum("support").alias("s"),
        F.sum("tp").alias("c"),
        F.avg("f1z").alias("macro_f1_raw"),
        (F.sum(F.col("f1z") * F.col("support"))
         / F.sum("support")).alias("weighted_f1_raw"),
        F.sum(F.col("n_pred") * F.col("support")).alias("sum_pt"),
        F.sum(F.col("n_pred") * F.col("n_pred")).alias("sum_p2"),
        F.sum(F.col("support") * F.col("support")).alias("sum_t2"))
    s = F.col("s").cast("double")
    den = (s * s - F.col("sum_p2")) * (s * s - F.col("sum_t2"))
    mcc = F.when(den > 0,
                 (F.col("c") * s - F.col("sum_pt")) / F.sqrt(den))
    return agg.select(
        F.col("s").cast("bigint").alias("n"),
        F.round(F.col("c") / s, 6).alias("accuracy"),
        F.round(F.col("macro_f1_raw"), 6).alias("macro_f1"),
        F.round(F.col("weighted_f1_raw"), 6).alias("weighted_f1"),
        F.round(mcc, 6).alias("mcc"))


def conformal_intervals(df: DataFrame, group: str, value: str,
                        key: str, alpha: float = 0.1,
                        seed: int = 0) -> DataFrame:
    """Mondrian split-conformal prediction intervals per group (Vovk
    et al. 2005; Lei et al. 2018): the distribution-free way to turn
    ANY point predictor into calibrated intervals. The data is split
    deterministically by key hash into train (fit the predictor —
    here the per-group mean), calibration (collect absolute
    residuals), and test; the half-width is the finite-sample
    quantile::

        q = the ⌈(n_cal + 1)(1 − α)⌉-th smallest calibration residual

    which guarantees ≥ 1−α marginal coverage on exchangeable data.
    Per group ("Mondrian" conditioning) so heteroscedastic groups get
    their own widths. Output per group: ``(group, n_train, n_cal,
    n_test, yhat, q_conf, coverage)`` where ``coverage`` is the
    realized fraction of test rows inside ``yhat ± q_conf`` —
    on exchangeable data it concentrates near 1−α. Groups whose
    calibration set is too small for the rank (⌈(n+1)(1−α)⌉ > n) emit
    null ``q_conf``/``coverage`` (the honest "interval is the whole
    line" case).

    Scale shape: the split is a pure hash expression on the scan; the
    predictor and the calibration quantile are ONE groupBy + one
    per-group ordered window over the calibration slice only; the
    coverage check is a broadcast join of the group-dimension
    (yhat, q) table against the test slice. Residual ties make the
    rank-selected q value unique, so the result is engine-exact
    without any float-order sensitivity beyond the rounded-handoff
    yhat (module design rules in operators/stats.py).
    """
    from hipipe_spark.functions.hashing import det_hash01

    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    u = det_hash01(F.col(key), seed)
    base = df.select(
        F.col(group), F.col(value).cast("double").alias("__y"),
        F.when(u < 0.5, F.lit("train"))
         .when(u < 0.75, F.lit("cal"))
         .otherwise(F.lit("test")).alias("__split"))
    fit = (base.where(F.col("__split") == "train")
           .groupBy(group)
           .agg(F.count(F.lit(1)).alias("n_train"),
                F.round(F.avg("__y"), 6).alias("yhat")))
    cal = (base.where(F.col("__split") == "cal")
           .join(F.broadcast(fit), group)
           .withColumn("__r", F.round(F.abs(F.col("__y")
                                            - F.col("yhat")), 9)))
    wq = Window.partitionBy(group).orderBy(F.col("__r").asc())
    wn = Window.partitionBy(group)
    rank_needed = F.ceil((F.col("__ncal") + 1) * F.lit(1.0 - alpha))
    qtab = (cal.withColumn("__ncal", F.count(F.lit(1)).over(wn))
            .withColumn("__rn", F.row_number().over(wq))
            .where(F.col("__rn") == rank_needed)
            .select(F.col(group), F.col("__ncal").alias("n_cal"),
                    F.col("__r").alias("q_conf")))
    # groups where the rank exceeds n_cal (tiny calibration sets) keep
    # a row with null q via left join below
    ncal_all = (cal.groupBy(group)
                .agg(F.count(F.lit(1)).alias("n_cal")))
    test = (base.where(F.col("__split") == "test")
            .join(F.broadcast(fit.select(group, "yhat")), group))
    cov = (test.join(F.broadcast(qtab.select(group, "q_conf")),
                     group, "left")
           .groupBy(group)
           .agg(F.count(F.lit(1)).alias("n_test"),
                F.round(F.avg(
                    F.when(F.col("q_conf").isNotNull(),
                           (F.round(F.abs(F.col("__y") - F.col("yhat")), 9)
                            <= F.col("q_conf")).cast("double"))), 6)
                 .alias("coverage")))
    return (fit
            .join(ncal_all, group, "left")
            .join(qtab.select(group, "q_conf"), group, "left")
            .join(cov, group, "left")
            .select(group, "n_train",
                    F.coalesce("n_cal", F.lit(0)).alias("n_cal"),
                    F.coalesce("n_test", F.lit(0)).alias("n_test"),
                    "yhat", "q_conf", "coverage"))


def cronbach_alpha(df: DataFrame, subject: str, item: str, value: str,
                   ndigits: int = 6) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient over a
    (subject × item) score grid — the reliability gate for any
    multi-item measurement (rubric dimensions, eval sub-scores,
    quality sub-signals): ONE row ``(k, n_subjects, sum_item_var,
    total_var, alpha)`` with::

        α = k/(k−1) · (1 − Σ_i Var(item_i) / Var(subject totals))

    Only COMPLETE subjects (all ``k`` items present) enter — alpha
    over ragged grids silently mixes missingness into the variance,
    so incompleteness is excluded rather than imputed. Sample
    (n−1) variances on both axes.

    Plan: one aggregate to the (subject, item) grid, a complete-case
    filter off a subject-dimension count, then two parallel
    dimension-sized aggregates (per-item variance over subjects,
    per-subject totals) — the grid is the only fact-scale exchange.
    Joins the fleiss/krippendorff/kappa rater-QA family.
    """
    from .core import register_cached

    x = F.col(value).cast("double")
    # the (subject x item) grid feeds four downstream aggregates; persist
    # it ONCE so the raw fact table is scanned exactly once (caller frees
    # via release_cached)
    base = df.groupBy(subject, item).agg(F.sum(x).alias("score")).persist()
    k_items = base.select(item).distinct().count()
    counts = base.groupBy(subject).agg(F.count(F.lit(1)).alias("__k"))
    complete = counts.where(F.col("__k") == k_items).select(subject)
    grid = base.join(F.broadcast(complete), subject)
    # per-item variance across complete subjects (centered handoff)
    imu = grid.groupBy(item).agg(F.round(F.avg("score"), 6).alias("__im"))
    ic = grid.join(F.broadcast(imu), item) \
             .select(item, (F.col("score") - F.col("__im")).alias("d"))
    ivar = (ic.groupBy(item)
              .agg(F.count(F.lit(1)).cast("double").alias("ni"),
                   F.sum("d").alias("u"), F.sum(F.col("d") * F.col("d"))
                    .alias("q"))
              .select(((F.col("q") - F.col("u") * F.col("u")
                        / F.col("ni")) / (F.col("ni") - 1)).alias("v")))
    item_var = ivar.agg(F.sum("v").alias("sum_item_var"))
    totals = grid.groupBy(subject).agg(F.sum("score").alias("tot"))
    tmu = totals.agg(F.round(F.avg("tot"), 6).alias("__tm"))
    tc = totals.crossJoin(F.broadcast(tmu)) \
               .select((F.col("tot") - F.col("__tm")).alias("d"))
    tot_var = tc.agg(
        F.count(F.lit(1)).cast("double").alias("ns"),
        F.sum("d").alias("u"),
        F.sum(F.col("d") * F.col("d")).alias("q")).select(
        F.col("ns"),
        ((F.col("q") - F.col("u") * F.col("u") / F.col("ns"))
         / (F.col("ns") - 1)).alias("tv"))
    out = item_var.crossJoin(tot_var)
    alpha = F.when(
        (F.lit(k_items) > 1) & (F.col("ns") > 1) & (F.col("tv") > 0),
        k_items / (k_items - 1.0)
        * (1.0 - F.col("sum_item_var") / F.col("tv")))
    return register_cached(out.select(
        F.lit(k_items).cast("bigint").alias("k"),
        F.col("ns").cast("bigint").alias("n_subjects"),
        F.round("sum_item_var", ndigits).alias("sum_item_var"),
        F.round("tv", ndigits).alias("total_var"),
        F.round(alpha, ndigits).alias("alpha")), base)
