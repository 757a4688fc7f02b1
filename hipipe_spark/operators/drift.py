"""Distribution-drift metrics between two corpus slices.

A 100-TB training-data pipeline re-ingests continuously; the first
question after every refresh is "did the feature distributions move?".
The standard answer is the Population Stability Index over fixed
buckets: PSI = sum_b (p_a(b) - p_b(b)) * ln(p_a(b) / p_b(b)).

Everything here is exact, deterministic JVM arithmetic: bucket by
uniform width (identical formula on any SQL engine — no reliance on
engine-specific width_bucket), count per (bucket, side) in ONE shuffle
on a dimension-sized key, smooth proportions with a fixed additive
constant (no div-by-zero, no data-dependent epsilon), and fold the
bucket terms. hipipe has no drift tooling (its users eyeball
``for_each`` printouts — reference ``test/core/stream/for_each.cpp``
idiom); at corpus scale this must be a first-class aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def uniform_bucket(col: Column, lo: float, hi: float, n_buckets: int) -> Column:
    """Bucket index in [0, n_buckets-1]: uniform width over [lo, hi),
    with underflow clamped to 0 and overflow to n_buckets-1. Pure
    arithmetic — byte-identical on Spark and DuckDB."""
    w = (hi - lo) / n_buckets
    raw = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(w))
    return F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), raw)).cast("int")


def psi_table(df_a: DataFrame, df_b: DataFrame, col: Column | str,
              lo: float, hi: float, n_buckets: int = 10,
              smooth: float = 0.5) -> DataFrame:
    """Per-bucket PSI decomposition between slice ``a`` (expected /
    reference) and slice ``b`` (actual / fresh).

    Returns one row per bucket (missing buckets included with zero
    counts): ``bucket, n_a, n_b, psi_term`` plus the repeated total
    ``psi`` — so both the bucket-level diagnosis and the headline
    number ship in one result.

    Proportions are Laplace-smoothed: p = (n + smooth) / (N + smooth *
    n_buckets), keeping every term finite and the whole computation a
    deterministic rational-plus-ln expression.

    Plan shape: each side aggregates map-side to ≤ n_buckets rows
    (partial_count), ONE exchange on the bucket key, then a broadcast
    of the two scalar totals. Nothing here grows with input rows — at
    100 TB the only full-data work is the two scans.
    """
    c = F.col(col) if isinstance(col, str) else col
    tagged = (
        df_a.select(uniform_bucket(c, lo, hi, n_buckets).alias("bucket"),
                    F.lit(1).alias("is_a"), F.lit(0).alias("is_b"))
        .unionByName(
            df_b.select(uniform_bucket(c, lo, hi, n_buckets).alias("bucket"),
                        F.lit(0).alias("is_a"), F.lit(1).alias("is_b")))
    )
    counts = tagged.groupBy("bucket").agg(
        F.sum("is_a").alias("n_a"), F.sum("is_b").alias("n_b"))
    spark = df_a.sparkSession
    all_buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    counts = (
        all_buckets.join(F.broadcast(counts), "bucket", "left")
        .select("bucket",
                F.coalesce("n_a", F.lit(0)).alias("n_a"),
                F.coalesce("n_b", F.lit(0)).alias("n_b"))
    )
    totals = counts.agg(F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b"))
    s = float(smooth)
    withp = counts.join(F.broadcast(totals)).select(
        "bucket", "n_a", "n_b",
        ((F.col("n_a") + s) / (F.col("tot_a") + s * n_buckets)).alias("p_a"),
        ((F.col("n_b") + s) / (F.col("tot_b") + s * n_buckets)).alias("p_b"),
    )
    term = (F.col("p_a") - F.col("p_b")) * F.log(F.col("p_a") / F.col("p_b"))
    withterm = withp.withColumn("psi_term", term)
    total = F.sum("psi_term").over(Window.partitionBy())
    return withterm.select(
        "bucket", "n_a", "n_b", "psi_term",
        total.alias("psi"),
    )


def psi(df_a: DataFrame, df_b: DataFrame, col: Column | str,
        lo: float, hi: float, n_buckets: int = 10,
        smooth: float = 0.5) -> float:
    """Headline PSI scalar (driver-side; the table is dimension-sized).
    Rule of thumb: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 act."""
    row = (psi_table(df_a, df_b, col, lo, hi, n_buckets, smooth)
           .select("psi").limit(1).collect())
    return float(row[0]["psi"]) if row else 0.0
