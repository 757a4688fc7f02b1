"""Ragged-array (ndim) utilities over ArrayType columns.

Reference ``include/hipipe/core/utility/ndim.hpp`` — per-dimension
sizes, flatten, reshape, pad (pad lives in ``operators.core.Pad``).
Spark arrays replace nested std::vector; everything is a JVM-side
Column expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ndim_size(col: Column, dim: int = 1) -> Column:
    """Sizes at a dimension (reference ``ndim.hpp:173-199``): dim 1 →
    outer length; dim 2 → array of inner lengths."""
    if dim == 1:
        return F.size(col)
    if dim == 2:
        return F.transform(col, lambda x: F.size(x))
    raise ValueError("dims 1-2 supported")


def flat_view(col: Column) -> Column:
    """Flatten one nesting level (reference ``flat_view``,
    ``ndim.hpp:435-456``)."""
    return F.flatten(col)


def reshaped_view(col: Column, row_len: int) -> Column:
    """Reshape a flat array into rows of ``row_len`` (reference
    ``reshaped_view``, ``ndim.hpp:525-545``; the -1 wildcard maps to
    deriving the row count from the array size). Trailing partial row
    is kept short, mirroring the reference's last-chunk behavior."""
    n_rows = F.ceil(F.size(col) / F.lit(row_len)).cast("int")
    # guard: sequence(0, -1) would count DOWN; empty input → empty index
    idx = F.when(n_rows > 0, F.sequence(F.lit(0), n_rows - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.slice(col, i * row_len + 1, row_len))


def same_size(a: Column, b: Column) -> Column:
    """True when two arrays have equal outer size (``ndim.hpp:736-740``)."""
    return F.size(a) == F.size(b)
