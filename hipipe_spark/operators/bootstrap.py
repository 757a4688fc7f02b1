"""Distributed bootstrap confidence intervals (Poisson bootstrap).

The classical bootstrap resamples n rows WITH replacement B times —
impossible to do literally on a distributed corpus (global sampling
with replacement needs coordinated indexes). The Poisson bootstrap
(Hanley & MacGibbon 2006; the production standard at web scale) gives
each row an independent Poisson(1) weight per replicate: for large n
the replicate weight vector is indistinguishable from multinomial
resampling, and every weight is a pure per-row computation.

Here the Poisson draws are KEY-DERIVED (functions/hashing.py det
family): replicate r's weight for a row is PoissonInv(h(key, r)) —
deterministic across reruns, cluster sizes, and input order, and
reproducible in a SQL oracle.

Scale shape: ONE aggregate pass. Each row evaluates its n_reps
weights as a JVM array expression; the per-replicate (sum w·x, sum w)
pairs are 2·n_reps map-side-combinable aggregate columns — no row
explosion, no shuffle beyond the group-by. The replicate means and
the percentile CI are computed on the one-row-per-group result.

Exactness: with integer-valued ``value_col`` every replicate sum is
exactly representable (ints < 2^53 in doubles), so replicate means
and CI bounds are bit-identical across engines and accumulation
orders. Floating values are deterministic per engine but may differ
across engines in the last ulp.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hipipe_spark.functions.hashing import det_hash01, det_hash01_sql

# Poisson(1) inverse-CDF breakpoints: weight k iff u < cum[k] (first
# match), capped at MAX_W. repr() literals are shared with the SQL
# generator so both engines parse the identical double.
MAX_W = 9
_CUM = []
acc = 0.0
for k in range(MAX_W):
    acc += math.exp(-1.0) / math.factorial(k)
    _CUM.append(acc)


def _poisson_w(u):
    """Column: PoissonInv(u) via the shared breakpoints."""
    expr = F.lit(MAX_W)
    for k in reversed(range(MAX_W)):
        expr = F.when(u < F.lit(_CUM[k]), F.lit(k)).otherwise(expr)
    return expr


def poisson_w_sql(u_expr: str) -> str:
    """SQL text of :func:`_poisson_w` (same literals, same order)."""
    cases = " ".join(
        f"WHEN {u_expr} < {_CUM[k]!r} THEN {k}" for k in range(MAX_W))
    return f"(CASE {cases} ELSE {MAX_W} END)"


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group: str | None = None,
    n_reps: int = 100,
    seed: int = 0,
    alpha: float = 0.05,
) -> DataFrame:
    """Percentile-bootstrap CI for the mean of ``value_col``, per
    ``group`` (or one global row with ``group=None``).

    Returns ``(group?, n, mean, ci_lo, ci_hi, n_reps_used)`` —
    ``n_reps_used`` counts replicates with nonzero total weight (empty
    replicates are excluded from the percentile, relevant only for
    tiny groups). CI convention: nearest-rank on the sorted replicate
    means, lo = s[ceil(alpha/2·R)], hi = s[ceil((1−alpha/2)·R)]
    (1-indexed, clamped to [1, R]).
    """
    if n_reps < 2:
        raise ValueError("n_reps must be >= 2")
    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1)")
    v = F.col(value_col).cast("double")
    key = F.col(key_col)
    gcols = [group] if group else []

    aggs = [F.count(F.lit(1)).alias("n"), F.avg(v).alias("mean")]
    for r in range(n_reps):
        w = _poisson_w(det_hash01(key * F.lit(n_reps) + F.lit(r), seed))
        aggs.append(F.sum(w * v).alias(f"__s{r}"))
        aggs.append(F.sum(w).alias(f"__w{r}"))
    base = df.groupBy(*gcols).agg(*aggs) if gcols else df.agg(*aggs)

    means = F.array_compact(F.array(*[
        F.when(F.col(f"__w{r}") > 0, F.col(f"__s{r}") / F.col(f"__w{r}"))
        for r in range(n_reps)]))
    sorted_means = F.sort_array(means)
    used = F.size(sorted_means)
    lo_i = F.greatest(F.lit(1), F.ceil(F.lit(alpha / 2) * used).cast("int"))
    hi_i = F.least(used, F.ceil(F.lit(1 - alpha / 2) * used).cast("int"))
    return base.select(
        *gcols, "n",
        F.round("mean", 6).alias("mean"),
        F.round(F.element_at(sorted_means, lo_i), 6).alias("ci_lo"),
        F.round(F.element_at(sorted_means, hi_i), 6).alias("ci_hi"),
        used.alias("n_reps_used"))


def bootstrap_mean_ci_oracle_sql(
    value_expr: str,
    key_expr: str,
    table_sql: str,
    group: str | None = None,
    n_reps: int = 100,
    seed: int = 0,
    alpha: float = 0.05,
) -> str:
    """DuckDB replica of :func:`bootstrap_mean_ci` — identical hash,
    breakpoints, rank convention. Uses an unnest over replicate ids
    (row x n_reps fan-out is fine at oracle scale)."""
    u = det_hash01_sql(f"({key_expr}) * {n_reps} + r.rep", seed)
    w = poisson_w_sql(u)
    gsel = f"{group}, " if group else ""
    gby = f"GROUP BY {group}" if group else ""
    gby_rep = f"GROUP BY {gsel}rep" if group else "GROUP BY rep"
    join_on = f"ON m.{group} = b.{group}" if group else "ON TRUE"
    return f"""
      WITH t AS ({table_sql}),
      reps AS (SELECT CAST(range AS INTEGER) AS rep FROM range({n_reps})),
      wtd AS (
        SELECT {gsel}r.rep,
               sum({w} * CAST({value_expr} AS DOUBLE)) AS s,
               sum({w}) AS sw
        FROM t, reps r {gby_rep}),
      rvalid AS (SELECT * FROM wtd WHERE sw > 0),
      rmeans AS (
        SELECT {gsel}list_sort(list(s / sw)) AS ms
        FROM rvalid {gby}),
      basis AS (
        SELECT {gsel}count(*) AS n, avg(CAST({value_expr} AS DOUBLE)) AS mean
        FROM t {gby})
      SELECT {f'm.{group}, ' if group else ''}m.n,
             round(m.mean, 6) AS mean,
             round(b.ms[greatest(1, CAST(ceil({alpha / 2!r} * len(b.ms)) AS INTEGER))], 6) AS ci_lo,
             round(b.ms[least(len(b.ms), CAST(ceil({1 - alpha / 2!r} * len(b.ms)) AS INTEGER))], 6) AS ci_hi,
             len(b.ms) AS n_reps_used
      FROM basis m JOIN rmeans b {join_on}
    """
