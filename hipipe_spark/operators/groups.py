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
                    seed: int = 0, out: str = "group") -> DataFrame:
    """Assign group labels 0..len(ratio)-1 with exact proportional counts.

    NOTE the global ``row_number`` over the full table is a single-sort
    bottleneck at extreme scale; for 100 TB use :func:`fixed_groups`
    (hash buckets, approximate counts) — the same trade the reference
    exposes with its two overloads.
    """
    total = sum(ratio)
    w = Window.orderBy(det_hash_i64(F.col(key), seed), F.col(key))
    n = df.count()
    # exact cut points; remainder to the last nonzero group (groups.hpp:75-79)
    counts = [int(n * r / total) for r in ratio]
    rem = n - sum(counts)
    for i in range(len(counts) - 1, -1, -1):
        if ratio[i] > 0:
            counts[i] += rem
            break
    cuts, acc = [], 0
    for c in counts:
        acc += c
        cuts.append(acc)
    rn = F.row_number().over(w)
    expr = F.lit(len(ratio) - 1)
    for i in range(len(ratio) - 1, -1, -1):
        expr = F.when(rn <= cuts[i], F.lit(i)).otherwise(expr)
    return df.withColumn(out, expr.cast("int"))


def fixed_groups(df: DataFrame, key: str, n_groups: int,
                 seed: int = 0, out: str = "group") -> DataFrame:
    """Stable hash-bucket groups (cluster-size-invariant; approximate
    proportions). The reference's 'fixed groups shared across
    clusterings' overload (``groups.hpp:97-104``)."""
    return df.withColumn(
        out, F.pmod(det_hash_i64(F.col(key), seed), F.lit(n_groups)).cast("int")
    )


def build_index_mapper(df: DataFrame, col: str) -> DataFrame:
    """Distinct values → dense 0-based contiguous indices, ordered by
    value for determinism. Output: (value, index)."""
    w = Window.orderBy("value")
    return (
        df.select(F.col(col).alias("value")).distinct()
        .withColumn("index", (F.row_number().over(w) - 1).cast("long"))
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
