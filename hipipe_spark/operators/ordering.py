"""Deterministic global corpus shuffle (training-order assignment).

Pretraining wants documents in a reproducible pseudo-random order —
the same permutation on every run, at any parallelism, resumable
mid-epoch. The classic single-node answer (``ORDER BY random()``) is
neither reproducible nor distributed; a naive
``row_number() OVER (ORDER BY hash)`` funnels the whole corpus through
one task.

:func:`deterministic_shuffle` assigns each row its global rank in
``(det_hash(key, seed), key)`` order with the two-phase recipe from
``groups.build_index_mapper`` (`groups.py:145`): range-partition on the
hash, count per partition (driver sees only the partition-count
vector), convert to offsets, add the partition-local rank. No stage
ever sees more than one partition's rows; the rank is the true global
rank wherever the range boundaries fall, so the permutation is
bit-stable across cluster sizes — the property the north-rule's
two-cluster-size criterion demands of every operator.

Epoch reshuffles are just a different ``seed``. The hash is the
engine's LCG (``functions/hashing.py``), reproducible in ANSI SQL for
the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hipipe_spark.functions.hashing import det_hash_i64


def deterministic_shuffle(df: DataFrame, key: str, seed: int = 0,
                          n_partitions: int | None = None,
                          rank_col: str = "shuffle_rank") -> DataFrame:
    """Add ``rank_col`` = the row's global rank under the seeded hash
    permutation of ``key`` (0-based, dense, deterministic). The result
    is range-partitioned by the hash, so a subsequent
    ``sortWithinPartitions(rank_col).write`` emits training order
    without another exchange.

    ``key`` must be an integer column (the LCG hash domain); hash ties
    are broken by the key itself, so equal keys get interchangeable —
    and duplicate-free keys get unique — ranks.
    """
    from hipipe_spark.operators.core import register_cached

    spark = df.sparkSession
    n_parts = int(n_partitions or spark.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    base = df.withColumn("__shk", det_hash_i64(F.col(key), seed))
    ranged = base.repartitionByRange(n_parts, "__shk", key)
    # persist so the count job and the rank job see the same physical
    # partitioning (a re-shuffle could re-sample range boundaries)
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).persist()
    counts = {r["__pid"]: r["n"] for r in
              with_pid.groupBy("__pid").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy("__shk", key)
    return register_cached(
        with_pid.join(F.broadcast(off_df), "__pid")
        .withColumn(rank_col,
                    (F.col("__off") + F.row_number().over(w) - 1)
                    .cast("long"))
        .drop("__shk", "__pid", "__off"),
        with_pid,
    )
