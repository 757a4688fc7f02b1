"""Extreme-skew A/B evidence: one monster conversation holding half of
all rows (the skew AQE cannot fix: Window.partitionBy pins a key to one
task). Times the naive conv-partitioned rolling window vs
BucketedRollingAgg (turn-index buckets), and the union vs bucketed
as-of strategies, on the identical input. Appends to BENCH/SKEW.md."""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hipipe_spark.operators.asof import asof_join  # noqa: E402
from hipipe_spark.operators.temporal import (  # noqa: E402
    BucketedRollingAgg, RollingAgg,
)
from hipipe_spark.session import get_spark  # noqa: E402

N = int(os.environ.get("SKEW_N", "4000000"))


def build(spark):
    """Half the rows in ONE conversation, the rest spread over 10k."""
    hot = spark.range(N // 2).select(
        F.lit("conv_monster").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        (F.lit(1_700_000_000) + F.col("id") * 7).cast("timestamp").alias("ts"),
        F.when(F.col("id") % 3 == 0, "assistant").otherwise("user").alias("role"),
        (F.col("id") % 997).cast("int").alias("text_len"),
    )
    cold = spark.range(N // 2).select(
        F.concat(F.lit("conv_"), (F.col("id") % 10000).cast("string")).alias("conv_id"),
        (F.col("id") / 10000).cast("int").alias("turn_idx"),
        (F.lit(1_700_000_000) + (F.col("id") / 10000) * 13).cast("timestamp").alias("ts"),
        F.when(F.col("id") % 2 == 0, "assistant").otherwise("user").alias("role"),
        (F.col("id") % 991).cast("int").alias("text_len"),
    )
    return hot.unionByName(cold).persist()


def force(df):
    h = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(1_000_000_007))
    return df.select(F.count(F.lit(1)), F.sum(h)).collect()[0][0]


def timed(fn, reps=3):
    fn()  # warm
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    spark = get_spark(app_name="skew_bench")
    turns = build(spark)
    n = turns.count()
    aggs = {"assistant_turns_100": (
        F.sum, F.when(F.col("role") == "assistant", 1).otherwise(0)),
        "mean_len_100": (F.avg, F.col("text_len"))}
    naive = RollingAgg(aggs, lookback=100)
    bucketed = BucketedRollingAgg(aggs, lookback=100, bucket_size=65536)
    t_naive = timed(lambda: force(naive(turns)))
    t_bucket = timed(lambda: force(bucketed(turns)))

    profiles = spark.range(20000).select(
        F.when(F.col("id") % 2 == 0, "conv_monster")
         .otherwise(F.concat(F.lit("conv_"), (F.col("id") % 10000).cast("string")))
         .alias("conv_id"),
        (F.lit(1_700_000_000) + F.col("id") * 1700).cast("timestamp").alias("ts"),
        (F.col("id") % 17).cast("double").alias("temperature"),
    )
    t_union = timed(lambda: force(
        asof_join(turns, profiles, strategy="union")))
    t_buck_asof = timed(lambda: force(
        asof_join(turns, profiles, strategy="bucketed", bucket_width_sec=100000)))

    date = datetime.now(timezone.utc).isoformat(timespec="seconds")
    line = (f"| {date} | {n} | {t_naive:.2f}s | {t_bucket:.2f}s | "
            f"{t_naive / t_bucket:.2f}x | {t_union:.2f}s | {t_buck_asof:.2f}s | "
            f"{t_union / t_buck_asof:.2f}x |")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "SKEW.md")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(
                "# Extreme-skew A/B (one conversation = half of all rows)\n\n"
                "Naive = `Window.partitionBy(conv_id)` (monster conv lands in "
                "one task); bucketed = turn-index/time-slice decomposition. "
                "Best-of-3, fresh warm-up, same persisted input, local[32].\n\n"
                "| date | rows | rolling naive | rolling bucketed | speedup | "
                "asof union | asof bucketed | speedup |\n|---|---|---|---|---|---|---|---|\n")
    with open(path, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
