"""Ragged-array (ndim) utilities over ArrayType columns.

Reference ``include/hipipe/core/utility/ndim.hpp`` — per-dimension
sizes (``ndim.hpp:173-209``), resize (``ndim.hpp:263-288``), shape
(``ndim.hpp:388-407``), recursive flatten (``ndim.hpp:435-471``),
reshape (``ndim.hpp:525-552``), shape-following generate fill
(``ndim.hpp:586-646``). Spark arrays replace nested std::vector;
everything is a JVM-side Column expression (whole-stage codegen — the
engine's analog of the reference's compile-time fused loops). Pad
lives in ``operators.core.Pad`` (multi-dim via ``depth``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _nested(col: Column, fn, depth: int) -> Column:
    """Apply ``fn`` to nodes ``depth`` array levels below ``col``."""
    if depth <= 0:
        return fn(col)
    return F.transform(col, lambda x: _nested(x, fn, depth - 1))


def ndim_size(col: Column, dim: int = 1) -> Column:
    """Sizes of the ranges at a dimension (reference ``ndim_size``,
    ``ndim.hpp:192-209``): the i-th dimension's sizes as ONE flat array
    per row, matching the reference's per-dimension flat vectors
    (``{{4}, {3, 1, 2, 1}}`` example). dim 1 → scalar outer length;
    dim k → flat array of the depth-k nodes' sizes in depth-first
    order."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if dim == 1:
        return F.size(col)
    sizes = _nested(col, F.size, dim - 1)  # nested (dim-1)-deep array of ints
    for _ in range(dim - 2):
        sizes = F.flatten(sizes)
    return sizes


def ndim_resize(col: Column, n, value, truncate: bool = True) -> Column:
    """Resize the OUTER dimension of an array to ``n`` elements, padding
    with ``value`` (reference ``ndim_resize`` dim-terminal case,
    ``ndim.hpp:263-288`` — vec.resize(n, val)). ``n`` may be an int or
    Column. ``truncate=False`` grows only (the ndim_pad use)."""
    n = F.lit(n) if isinstance(n, int) else n
    n = n.cast("int")
    fill = value if isinstance(value, Column) else F.lit(value)
    grown = F.concat(col, F.array_repeat(fill, F.greatest(n - F.size(col), F.lit(0))))
    return F.slice(grown, 1, n) if truncate else grown


def ndim_resize2(col: Column, n_outer, inner_sizes: Column, value) -> Column:
    """Two-dimensional resize (reference ``ndim_resize`` with a 2-level
    size spec, ``ndim.hpp:263-288``): outer resized to ``n_outer``; the
    i-th inner array resized to ``inner_sizes[i]`` (the reference's flat
    per-dimension size vector), padded with ``value``. New outer slots
    start as empty arrays and fill to their target size. Deeper dims
    compose by calling this inside ``F.transform``."""
    inner_t = "array<boolean>"  # placeholder; real type derived below
    # grow the outer with EMPTY inner arrays typed like the existing ones
    empty_inner = F.slice(col, 1, 0)  # [] with col's element type... per-row
    n_outer_c = F.lit(n_outer) if isinstance(n_outer, int) else n_outer
    grown = F.concat(
        col,
        F.array_repeat(F.flatten(F.slice(col, 1, 0)),  # typed empty array
                       F.greatest(n_outer_c.cast("int") - F.size(col), F.lit(0))),
    )
    outer = F.slice(grown, 1, n_outer_c.cast("int"))
    del inner_t, empty_inner
    return F.zip_with(
        outer,
        F.slice(inner_sizes, 1, n_outer_c.cast("int")),
        lambda arr, n: ndim_resize(arr, n, value),
    )


def shape(col: Column, ndims: int) -> Column:
    """Shape of a rectangular nested array (reference ``shape``,
    ``ndim.hpp:388-407``): [outer size, first element's size, ...].
    Like the reference (which inspects only the 0-th element per level),
    ragged inputs yield the first element's sizes; an empty level yields
    0 for the remaining dims."""
    dims = []
    cur = col
    for _ in range(ndims):
        dims.append(F.coalesce(F.size(cur), F.lit(0)))
        cur = F.try_element_at(cur, F.lit(1))  # null past an empty level
    return F.array(*[d.cast("long") for d in dims])


def flat_view(col: Column, ndims: int = 2) -> Column:
    """Flatten ``ndims`` dimensions into one (reference ``flat_view``,
    ``ndim.hpp:451-471``): ndims=2 joins two levels (one F.flatten);
    ndims=k applies k-1 flattens."""
    out = col
    for _ in range(max(ndims - 1, 0)):
        out = F.flatten(out)
    return out


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


def _prefix_offsets(sizes: Column) -> Column:
    """Exclusive prefix sums of an int array: [2,0,3] → [0,2,2]."""
    acc0 = F.struct(F.lit(0).cast("int").alias("s"),
                    F.array().cast("array<int>").alias("a"))
    return F.aggregate(
        sizes, acc0,
        lambda acc, x: F.struct(
            (acc["s"] + x).cast("int").alias("s"),
            F.concat(acc["a"], F.array(acc["s"])).alias("a")),
        lambda acc: acc["a"])


def gen_fill(col: Column, gendims: int, ndims: int, start: int = 0) -> Column:
    """Shape-following counter fill (reference ``generate``,
    ``ndim.hpp:586-646`` / ``stream/generate.hpp:25-47``): produce a
    nested array with the SHAPE of ``col`` where every node at depth
    ``gendims`` gets the next counter value in depth-first order and all
    deeper dimensions broadcast that value. gendims=0 fills everything
    with ``start``. Matches the reference's documented fixture,
    including "the generator is called for every node in the filled
    dimension even when its subtree is empty".

    Deterministic and cluster-size-invariant: the counter restarts at
    ``start`` per row (the reference's per-structure generator state has
    no distributed analog; a per-row structure IS the unit here).
    Supports ndims ≤ 3 (hipipe's practical ceiling in tests)."""
    if not 0 <= gendims <= ndims:
        raise ValueError("need 0 <= gendims <= ndims")
    if ndims > 3:
        raise ValueError("ndims <= 3 supported")

    def bcast(node: Column, val: Column, depth_left: int) -> Column:
        # fill node's structure (depth_left levels of arrays) with val
        if depth_left == 0:
            return val
        return F.transform(node, lambda x: bcast(x, val, depth_left - 1))

    s = F.lit(start).cast("long")
    if gendims == 0:
        return bcast(col, s, ndims)
    if gendims == 1:
        # node index at depth 1 = position i
        idx = F.when(F.size(col) > 0,
                     F.sequence(F.lit(0), F.size(col) - 1)
                     ).otherwise(F.array().cast("array<int>"))
        return F.zip_with(col, idx,
                          lambda node, i: bcast(node, s + i.cast("long"), ndims - 1))
    if gendims == 2:
        offs = _prefix_offsets(F.transform(col, F.size))
        return F.zip_with(
            col, offs,
            lambda node, off: F.zip_with(
                node,
                F.when(F.size(node) > 0,
                       F.sequence(F.lit(0), F.size(node) - 1)
                       ).otherwise(F.array().cast("array<int>")),
                lambda inner, j: bcast(inner, s + (off + j).cast("long"),
                                       ndims - 2)))
    # gendims == 3 (ndims == 3): leaf counter in depth-first order
    outer_offs = _prefix_offsets(
        F.transform(col, lambda x: F.aggregate(
            F.transform(x, F.size), F.lit(0).cast("int"), lambda a, b: a + b)))
    return F.zip_with(
        col, outer_offs,
        lambda node, off: F.zip_with(
            node, _prefix_offsets(F.transform(node, F.size)),
            lambda inner, ioff: F.zip_with(
                inner,
                F.when(F.size(inner) > 0,
                       F.sequence(F.lit(0), F.size(inner) - 1)
                       ).otherwise(F.array().cast("array<int>")),
                lambda _leaf, k: s + (off + ioff + k).cast("long"))))


def same_size(a: Column, b: Column) -> Column:
    """True when two arrays have equal outer size (``ndim.hpp:736-740``)."""
    return F.size(a) == F.size(b)
