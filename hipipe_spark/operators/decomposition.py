"""Distributed PCA over an embedding column.

Part of the LLM-data-pipeline extension set (embedding whitening,
dimensionality reduction before ANN indexing, drift visualization) —
no hipipe counterpart; the natural Spark shape is:

1. **Moment accumulation** (the only corpus-scale pass): each Arrow
   batch contributes ``(n, Σx, XᵀX)`` — one short row per batch, d and
   d² floats. Reduced driver-side (d=64 → 4 KB per batch; dimension-
   sized, like the IVF centroid collect).
2. **Eigendecomposition** on the d×d covariance — microseconds on the
   driver via ``numpy.linalg.eigh``; distributing it would be theater.
3. **Projection** — pure JVM column arithmetic: each output component
   is ``aggregate(zip_with(x, v_k, *), sum) - μ·v_k`` with the
   component vector folded in as a literal. No Python in the per-row
   path; the corpus is touched exactly twice (fit, transform), never
   shuffled.

Sign convention: each component is flipped so its largest-|loading|
coordinate is positive (numpy's eigenvector sign is arbitrary) —
deterministic across runs and partitionings.

:func:`covariance_matrix` exposes step 1's statistics as a DataFrame
of (i, j, cov) entries — exact, SQL-expressible, and the driver-oracle
anchor for the non-SQL eigh step.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def covariance_matrix(
    df: DataFrame, vec_col: str, dims: int, round_to: int = 6
) -> DataFrame:
    """Upper-triangle sample covariance entries ``(i, j, cov)`` of the
    first ``dims`` coordinates of ``df[vec_col]`` — one aggregation
    pass (``dims + dims·(dims+1)/2 + 1`` map-side-combinable sums),
    then the covariance arithmetic on the single result row. Keep
    ``dims`` modest (≤ ~32 → 529 agg columns); full-width covariance
    at d=64+ should use :func:`fit_pca`'s batched Gram accumulation
    instead of one giant Catalyst aggregate."""
    def x(i: int) -> Column:
        # widen BEFORE multiplying: float32 products then double sums
        # would quietly halve the precision of every cross moment
        return F.col(vec_col)[i].cast("double")

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i in range(dims):
        aggs.append(F.sum(x(i)).alias(f"s{i}"))
    pairs = [(i, j) for i in range(dims) for j in range(i, dims)]
    for i, j in pairs:
        aggs.append(F.sum(x(i) * x(j)).alias(f"p{i}_{j}"))
    row = df.agg(*aggs)
    n = F.col("n")
    entries = F.array(*[
        F.struct(
            F.lit(i).alias("i"),
            F.lit(j).alias("j"),
            F.round(
                (F.col(f"p{i}_{j}") - F.col(f"s{i}") * F.col(f"s{j}") / n)
                / (n - 1),
                round_to,
            ).alias("cov"),
        )
        for i, j in pairs
    ])
    return row.select(F.explode(entries).alias("e")).select(
        "e.i", "e.j", "e.cov"
    )


def fit_pca(df: DataFrame, vec_col: str, k: int) -> dict:
    """Fit a k-component PCA; returns a plain-python model dict
    (``mean``, ``components`` k×d row-major, ``explained_var``,
    ``explained_var_ratio``) suitable for broadcasting / JSON.

    One corpus pass: per-Arrow-batch partial moments (short rows),
    driver-side reduce + eigh. Matches ``numpy``/sklearn PCA up to the
    documented sign convention (pytest-pinned with allclose).
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def _moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            yield pd.DataFrame({
                "n": [float(len(X))],
                "s": [X.sum(axis=0).tolist()],
                "g": [(X.T @ X).ravel().tolist()],
            })

    parts = df.select(vec_col).mapInPandas(
        _moments, "n double, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in parts)
    d = len(parts[0]["s"])
    if k > d:
        raise ValueError(f"k={k} exceeds dimensionality d={d}")
    if n < 2:
        raise ValueError("fit_pca needs at least 2 rows")
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = (g - np.outer(s, s) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k×d
    # deterministic sign: largest-|loading| coordinate positive
    for r in range(k):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    ev = evals[order]
    total = float(evals.sum())
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_var": ev.tolist(),
        "explained_var_ratio": (ev / total).tolist() if total > 0 else
        [0.0] * k,
    }


def apply_pca(
    df: DataFrame,
    vec_col: str,
    model: dict,
    out_prefix: str = "pc",
    round_to: int | None = None,
    whiten: bool = False,
) -> DataFrame:
    """Project ``df[vec_col]`` onto the fitted components: adds columns
    ``{out_prefix}0..{k-1}`` = (x − μ)·vₖ. Pure JVM fold per component
    (the component vector and the scalar μ·vₖ are literals) — no
    Python, no shuffle, whole-stage-codegen friendly.

    ``whiten=True`` scales each projection by 1/√explained_var so the
    output components have unit variance (the standard pre-ANN /
    pre-clustering normalization; folded into the component literals,
    zero extra runtime cost; components with ~0 variance are left
    unscaled rather than dividing by ~0)."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    out = df
    for r, comp in enumerate(model["components"]):
        v = np.asarray(comp, dtype=np.float64)
        if whiten:
            ev = float(model["explained_var"][r])
            if ev > 1e-12:
                v = v / np.sqrt(ev)
        c = float(mean @ v)
        lit_v = F.array(*[F.lit(float(x)) for x in v])
        proj: Column = F.aggregate(
            F.zip_with(F.col(vec_col), lit_v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        ) - F.lit(c)
        if round_to is not None:
            proj = F.round(proj, round_to)
        out = out.withColumn(f"{out_prefix}{r}", proj)
    return out


def jl_signs(dims: int, k: int, seed: int = 0) -> list[list[int]]:
    """The deterministic ±1 Rademacher matrix for
    :func:`random_projection`: ``signs[r][j] = +1`` iff
    ``det_hash_mix_i64_py(r*1000003 + j*7919, seed) < 2^30``. Two
    design notes from measurement (k=16, d=64): the LCG family's top
    bit ALTERNATES on consecutive keys (affine bijection) — identical
    sign rows; and even the avalanche mix keeps lattice structure on
    plain ``r*dims + j`` keys (max row correlation 0.625 ≈ 5σ). The
    prime-strided keys land max |row corr| at 0.31, inside the
    random-matrix envelope. Exposed so the DuckDB oracle and any
    replica can bake the IDENTICAL literals from the same source."""
    from ..functions.hashing import _M, det_hash_mix_i64_py

    return [[1 if det_hash_mix_i64_py(r * 1000003 + j * 7919,
                                      seed) < _M // 2
             else -1
             for j in range(dims)] for r in range(k)]


def random_projection(
    df: DataFrame,
    vec_col: str,
    dims: int,
    k: int,
    seed: int = 0,
    out_prefix: str = "rp",
    round_to: int | None = None,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``k`` dimensions
    with a deterministic ±1 Rademacher matrix (Achlioptas, JCSS 2003:
    sign entries preserve pairwise distances like Gaussians do).
    Output columns ``{out_prefix}0..{k-1}`` =
    ``(1/√k) · Σ_j sign(r,j) · x_j``.

    The data-INDEPENDENT companion to :func:`fit_pca`/PQ: no fit pass
    at all — at 100 TB the corpus is touched exactly once, a narrow
    JVM fold per row (the :func:`apply_pca` projection shape with the
    component literals replaced by hash-derived signs), no shuffle,
    no Python, no driver state beyond the seed. The trade: JL
    preserves geometry w.h.p. but ignores data structure — use PCA/PQ
    when a fit pass is affordable, JL when the first scan must
    already be the only scan (one-shot compression before LSH/ANN
    bucketing, sketching embeddings in a streaming ingest).

    Signs come from :func:`jl_signs` (the det-LCG family) so an
    oracle can reproduce every output bit-for-bit.
    """
    if k < 1 or dims < 1:
        raise ValueError("need k >= 1 and dims >= 1")
    inv_sqrt_k = 1.0 / float(np.sqrt(k))
    out = df
    for r, row in enumerate(jl_signs(dims, k, seed)):
        lit_v = F.array(*[F.lit(float(s)) for s in row])
        proj: Column = F.aggregate(
            F.zip_with(F.col(vec_col), lit_v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        ) * F.lit(inv_sqrt_k)
        if round_to is not None:
            proj = F.round(proj, round_to)
        out = out.withColumn(f"{out_prefix}{r}", proj)
    return out


def random_projection_oracle_sql(
    table: str,
    id_cols: list[str],
    vec_expr: str,
    dims: int,
    k: int,
    seed: int = 0,
    out_prefix: str = "rp",
    round_to: int = 6,
) -> str:
    """DuckDB SQL twin of :func:`random_projection` — the SAME
    :func:`jl_signs` literals, the SAME left-to-right fold order
    (Spark's aggregate and an explicit left-associative sum widen the
    float elements to double identically), so outputs match
    bit-for-bit before rounding."""
    import numpy as np

    inv_sqrt_k = repr(1.0 / float(np.sqrt(k)))
    cols = []
    for r, row in enumerate(jl_signs(dims, k, seed)):
        terms = " + ".join(
            f"({float(s)}) * CAST({vec_expr}[{j + 1}] AS DOUBLE)"
            for j, s in enumerate(row))
        cols.append(f"round((0.0 + {terms}) * {inv_sqrt_k}, {round_to})"
                    f" AS {out_prefix}{r}")
    select = ", ".join(list(id_cols) + cols)
    return f"SELECT {select} FROM {table}"
