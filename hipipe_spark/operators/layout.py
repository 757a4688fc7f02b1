"""Data-layout operators: multi-dimensional locality sort keys.

At 100 TB the dominant cost of most queries is the SCAN, and the
dominant scan optimization is file skipping: parquet/Iceberg keep
per-file min/max statistics per column, and a predicate prunes every
file whose range misses. Sorting by one column gives perfect skipping
on that column and none on the others; interleaving the bits of
several columns (Morton / Z-order — the layout Delta Lake's OPTIMIZE
ZORDER and Iceberg's sort orders use) gives each column a share of
the locality, so point/range predicates on ANY keyed column prune the
large majority of files.

The reference (iterait/hipipe) has no storage layer — this is
north-rule extension surface (the rule's 10^12-turn corpus is an
Iceberg table; writing it z-ordered on (conv_id, ts) is how the as-of
scan side stays prunable on both keys).

Scale shape: ranking each key column is ONE range-partitioned
`percent_rank` per column — no driver collect, no global single task
(percent_rank over a full sort is range-partitioned by Spark, not
single-partition); the interleave itself is pure JVM bit arithmetic
(shiftleft / bitwise OR over a fixed ``bits``-sized expression tree,
whole-stage-codegen friendly). Writing is the caller's
`repartitionByRange(z) .sortWithinPartitions(z) .write` — the key
composes with any sink.

Two normalizations:

- ``method="minmax"``: value → floor((v - min) / (max - min + eps) ·
  2^bits). One tiny agg job for the bounds. Skew-sensitive (a heavy
  hitter collapses many rows into one cell) but cheap, deterministic,
  and exactly replicable in ANSI SQL — the oracle mode.
- ``method="rank"``: percent_rank — skew-proof (equal mass per cell),
  one extra shuffle per column. The production default for long-tail
  keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _interleave(cells: list, bits: int):
    """Interleave ``bits`` bits of each cell column, column-major
    (bit b of column c lands at position b * n_cols + c)."""
    n = len(cells)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for c, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cell, b).bitwiseAND(F.lit(1)),
                            b * n + c))
    return z


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    method: str = "minmax",
    out_col: str = "z",
) -> DataFrame:
    """Append a Morton (Z-order) sort key interleaving ``bits`` bits of
    each column in ``cols`` (2-4 columns is the useful range; beyond
    that each column's share of the prefix is too thin to prune on).

    ``bits * len(cols)`` must be <= 63 (the key is a signed long).
    Null key values sort first (cell 0).
    """
    if not 1 <= len(cols) <= 6:
        raise ValueError("zorder_key needs 1-6 columns")
    if bits * len(cols) > 63:
        raise ValueError(f"bits * n_cols = {bits * len(cols)} > 63")
    if method not in ("minmax", "rank"):
        raise ValueError(f"unknown method {method!r}")
    hi = (1 << bits) - 1

    if method == "minmax":
        bounds = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"lo_{i}")
              for i, c in enumerate(cols)],
            *[F.max(F.col(c).cast("double")).alias(f"hi_{i}")
              for i, c in enumerate(cols)],
        ).collect()[0]  # one dimension-sized job: 2*n_cols doubles
        cells = []
        for i, c in enumerate(cols):
            lo, top = bounds[f"lo_{i}"], bounds[f"hi_{i}"]
            if lo is None or top is None or top <= lo:
                cells.append(F.lit(0).cast("long"))
                continue
            span = float(top) - float(lo)
            cells.append(
                F.least(
                    F.lit(hi).cast("long"),
                    F.floor((F.coalesce(F.col(c).cast("double"), F.lit(lo))
                             - F.lit(float(lo)))
                            * F.lit(float(hi + 1)) / F.lit(span + 1e-12))
                    .cast("long"),
                ))
        return df.withColumn(out_col, _interleave(cells, bits))

    # rank: skew-proof equal-mass cells; one range-partitioned sort per
    # column (percent_rank's global ordering is range-partitioned by
    # Spark — parallel, not single-task — but it IS n_cols extra
    # shuffles; use for long-tail production keys)
    out = df
    tmp = []
    for i, c in enumerate(cols):
        t = f"__zr_{i}"
        tmp.append(t)
        out = out.withColumn(
            t,
            F.least(F.lit(hi).cast("long"),
                    F.floor(F.percent_rank().over(
                        Window.orderBy(F.col(c).asc_nulls_first()))
                        * F.lit(float(hi + 1))).cast("long")))
    cells = [F.col(t) for t in tmp]
    return out.withColumn(out_col, _interleave(cells, bits)).drop(*tmp)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    method: str = "rank",
    n_files: int | None = None,
) -> DataFrame:
    """The full write-side layout: z-key, range-repartition on it (so
    each output file owns one contiguous z-range → tight per-file
    min/max on EVERY keyed column), sort within partitions. Feed the
    result straight to ``.write`` / Iceberg `add_files`."""
    z = zorder_key(df, cols, bits=bits, method=method)
    parts = n_files if n_files else df.sparkSession.sparkContext.defaultParallelism
    return z.repartitionByRange(parts, "z").sortWithinPartitions("z")


def zorder_oracle_sql(table_sql: str, cols: list[str], bits: int = 16,
                      extra_cols: str = "") -> str:
    """DuckDB replica of ``zorder_key(method='minmax')`` — identical
    bound arithmetic and bit interleave, for the correctness gate."""
    hi = (1 << bits) - 1
    n = len(cols)
    lo_sel = ", ".join(
        f"min(CAST({c} AS DOUBLE)) AS lo_{i}, "
        f"max(CAST({c} AS DOUBLE)) AS hi_{i}"
        for i, c in enumerate(cols))
    cells = []
    for i, c in enumerate(cols):
        cells.append(
            f"CASE WHEN m.hi_{i} IS NULL OR m.lo_{i} IS NULL "
            f"OR m.hi_{i} <= m.lo_{i} THEN 0 "
            f"ELSE least({hi}, CAST(floor((COALESCE(CAST({c} AS DOUBLE), m.lo_{i}) - m.lo_{i})"
            f" * {float(hi + 1)} / (m.hi_{i} - m.lo_{i} + 1e-12)) AS BIGINT)) END")
    terms = []
    for b in range(bits):
        for ci in range(n):
            terms.append(f"(((c{ci} >> {b}) & 1) << {b * n + ci})")
    z = " | ".join(terms)
    cell_sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(cells))
    return f"""
      WITH t AS ({table_sql}),
      m AS (SELECT {lo_sel} FROM t),
      cells AS (SELECT t.*, {cell_sel} FROM t, m)
      SELECT {extra_cols}{", " if extra_cols else ""}CAST({z} AS BIGINT) AS z
      FROM cells
    """
