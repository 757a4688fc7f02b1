"""Train/valid/test splits and dictionary encoding.

- :func:`generate_groups` — reference ``include/hipipe/core/groups.hpp:
  55-84``: random group labels with *exact* ratio counts, remainder to
  the last nonzero group (``groups.hpp:75-79``). Distributed version:
  ``row_number() over (order by det_hash)`` + count thresholds — exact
  counts at any parallelism, deterministic (the reference shuffles with
  an mt19937; we shuffle with the key-derived hash order).
- :func:`fixed_groups` — the reference's fixed/volatile overload
  (``groups.hpp:86-140``): groups that stay stable across clusterings →
  stable hash-bucketing ``pmod(xxhash64(key), K)``.
- :func:`build_index_mapper` / :func:`encode` — reference
  ``include/hipipe/core/index_mapper.hpp:28-162``: bidirectional
  value↔dense-index dictionary as a DataFrame + broadcast join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hipipe_spark.functions.hashing import det_hash_i64


def generate_groups(df: DataFrame, key: str, ratio: Sequence[float],
                    seed: int = 0, out: str = "group",
                    n_partitions: int | None = None) -> DataFrame:
    """Assign group labels 0..len(ratio)-1 with exact proportional counts.

    Two-phase range-partitioned rank — no single-task global sort (the
    :func:`build_index_mapper` recipe): rows are range-partitioned by
    (det_hash, key); phase 1 collects the per-partition counts (a
    driver-sized vector — one int per partition) and turns them into
    offsets; phase 2 computes rank = offset + partition-local
    ``row_number``. Because range boundaries respect (hash, key) order,
    the rank equals ``row_number() over (order by hash, key)`` at any
    parallelism — exact counts, deterministic labels, and the sort runs
    parallel across partitions instead of funneling 100 TB through one
    task. :func:`fixed_groups` (hash buckets, approximate counts)
    remains the zero-extra-pass alternative — the same trade the
    reference exposes with its two overloads (``groups.hpp:86-104``).

    Cache lifetime: the range-partitioned frame is persisted so phase 1
    and phase 2 see the same physical layout; the caller owns it — call
    :func:`hipipe_spark.operators.core.release_cached` on the result
    after materializing.
    """
    total = sum(ratio)
    n_parts = int(n_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    hashed = df.withColumn("__h", det_hash_i64(F.col(key), seed))
    ranged = hashed.repartitionByRange(n_parts, "__h", key)
    # persist so the partition ids seen by the count job and the final
    # job are the same physical layout (not a re-sampled re-shuffle)
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).persist()
    # phase 1: per-partition counts — also yields n without a second scan
    pcounts = {r["__pid"]: r["n"] for r in
               with_pid.groupBy("__pid").agg(F.count("*").alias("n")).collect()}
    n = sum(pcounts.values())
    offsets, acc = {}, 0
    for pid in sorted(pcounts):
        offsets[pid] = acc
        acc += pcounts[pid]
    # exact cut points; remainder to the last nonzero group (groups.hpp:75-79)
    counts = [int(n * r / total) for r in ratio]
    rem = n - sum(counts)
    for i in range(len(counts) - 1, -1, -1):
        if ratio[i] > 0:
            counts[i] += rem
            break
    cuts, acc2 = [], 0
    for c in counts:
        acc2 += c
        cuts.append(acc2)
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long")
    # phase 2: partition-local rank + broadcast offset = global rank
    w = Window.partitionBy("__pid").orderBy("__h", key)
    rn = F.col("__off") + F.row_number().over(w)
    expr = F.lit(len(ratio) - 1)
    for i in range(len(ratio) - 1, -1, -1):
        expr = F.when(rn <= cuts[i], F.lit(i)).otherwise(expr)
    from hipipe_spark.operators.core import register_cached
    return register_cached(
        with_pid.join(F.broadcast(off_df), "__pid")
        .withColumn(out, expr.cast("int"))
        .drop("__h", "__pid", "__off"),
        with_pid,
    )


def fixed_groups(df: DataFrame, key: str, n_groups: int,
                 seed: int = 0, out: str = "group") -> DataFrame:
    """Stable hash-bucket groups (cluster-size-invariant; approximate
    proportions). The reference's 'fixed groups shared across
    clusterings' overload (``groups.hpp:97-104``)."""
    return df.withColumn(
        out, F.pmod(det_hash_i64(F.col(key), seed), F.lit(n_groups)).cast("int")
    )


def generate_groups_multi(df: DataFrame, key: str, n: int,
                          volatile_ratio: Sequence[float],
                          fixed_ratio: Sequence[float],
                          seed: int = 0,
                          out_prefix: str = "group_") -> DataFrame:
    """The reference's n-clusterings overload (``groups.hpp:111-140``):
    one initial exact-count split over volatile_ratio ++ fixed_ratio;
    rows landing in a FIXED group (label >= len(volatile_ratio)) keep
    that label in every clustering; volatile rows are re-split among the
    volatile groups — exact counts — independently per clustering with
    a derived seed. The CV/ensemble split with a shared test set.

    Adds columns ``{out_prefix}0..{out_prefix}{n-1}``. Deterministic at
    any parallelism (LCG hash order). Runs n+1 exact-count two-phase
    splits (each parallel across range partitions — see
    :func:`generate_groups`; use :func:`fixed_groups` at extreme scale
    to skip the n+1 count passes entirely).

    Cache lifetime: persists the volatile key set plus each split's
    range-partitioned frame; caller releases via
    :func:`hipipe_spark.operators.core.release_cached` on the result.
    """
    from hipipe_spark.operators.core import register_cached
    vsize = len(volatile_ratio)
    full = list(volatile_ratio) + list(fixed_ratio)
    base = generate_groups(df, key, full, seed=seed, out="__init")
    cached = list(getattr(base, "_hipipe_cached", ()))
    vol = base.filter(F.col("__init") < vsize).select(key).persist()
    cached.append(vol)
    out = base
    for i in range(n):
        gi = generate_groups(vol, key, list(volatile_ratio),
                             seed=seed + 7919 * (i + 1), out=f"{out_prefix}{i}")
        cached.extend(getattr(gi, "_hipipe_cached", ()))
        out = out.join(gi, on=key, how="left").withColumn(
            f"{out_prefix}{i}",
            F.coalesce(F.col(f"{out_prefix}{i}"), F.col("__init")))
    return register_cached(out.drop("__init"), *cached)


def build_index_mapper(df: DataFrame, col: str,
                       n_partitions: int | None = None) -> DataFrame:
    """Distinct values → dense 0-based contiguous indices, ordered by
    value for determinism. Output: (value, index).

    Two-phase assignment (no global single-task sort): the distinct set
    is range-partitioned by value, each partition counts its rows, the
    tiny per-partition count vector is turned into offsets on the
    driver, and the final index is offset + partition-local rank. The
    index is the global value-order rank regardless of where the range
    boundaries fall, so the result is deterministic at any parallelism —
    and a 100-TB dictionary never funnels through one task.
    """
    distinct = df.select(F.col(col).alias("value")).distinct()
    n_parts = n_partitions or distinct.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")
    ranged = distinct.repartitionByRange(int(n_parts), "value")
    # persist so the partition ids seen by the count job and the final
    # job are the same physical layout (not a re-sampled re-shuffle)
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).persist()
    # phase 1: per-partition counts (rows = n_parts — driver-size data)
    counts = {r["__pid"]: r["n"] for r in
              with_pid.groupBy("__pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long")
    # phase 2: partition-local rank (window partitioned by physical
    # partition id — parallel across partitions) + broadcast offset
    from hipipe_spark.operators.core import register_cached
    w = Window.partitionBy("__pid").orderBy("value")
    return register_cached(
        with_pid.join(F.broadcast(off_df), "__pid")
        .withColumn("index",
                    (F.col("__off") + F.row_number().over(w) - 1).cast("long"))
        .select("value", "index"),
        with_pid,
    )


def encode(df: DataFrame, col: str, mapper: DataFrame, out: str | None = None) -> DataFrame:
    """value → index via broadcast join (`index_mapper::at`)."""
    out = out or f"{col}_idx"
    m = mapper.select(F.col("value").alias(col), F.col("index").alias(out))
    return df.join(F.broadcast(m), on=col, how="left")


def decode(df: DataFrame, idx_col: str, mapper: DataFrame, out: str) -> DataFrame:
    """index → value via broadcast join (`index_mapper::operator[]`)."""
    m = mapper.select(F.col("index").alias(idx_col), F.col("value").alias(out))
    return df.join(F.broadcast(m), on=idx_col, how="left")
