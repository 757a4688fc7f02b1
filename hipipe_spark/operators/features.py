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
