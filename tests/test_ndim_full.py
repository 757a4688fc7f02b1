"""ndim completeness (VERDICT r1 next-round #5): fixtures mirror the
reference's documented examples and tests —
/root/reference/include/hipipe/core/utility/ndim.hpp:178-186 (ndim_size),
:246-256 (ndim_resize), :308-318 (ndim_pad), :373-381 (shape),
:436-444 (flat_view), :597-618 (generate/gendims), and
/root/reference/test/core/utility/ndim.cpp.
"""

from pyspark.sql import functions as F

from hipipe_spark.functions.ndim import (
    flat_view, gen_fill, ndim_resize, ndim_resize2, ndim_size, shape)
from hipipe_spark.operators.core import Pad, create

# the reference's generate() doc fixture (ndim.hpp:597-601)
GEN_DATA = [[[-1, -1, -1], [-1]], [[-1], [-1, -1]]]
# ... and its empty-subtree variant (ndim.hpp:608-611)
GEN_EMPTY = [[[-1, -1, -1], [-1]], [[], []], [[-1], [-1, -1]]]


def _one(df, expr):
    return df.select(expr.alias("x")).collect()[0].x


def test_ndim_size_deep(spark):
    # ndim.hpp:178-186: {{1,2,3},{1},{5,6},{7}} → {{4},{3,1,2,1}}
    df = create(spark, [([[1, 2, 3], [1], [5, 6], [7]],)],
                schema="v array<array<int>>")
    assert _one(df, ndim_size(F.col("v"), 1)) == 4
    assert _one(df, ndim_size(F.col("v"), 2)) == [3, 1, 2, 1]
    d3 = create(spark, [(GEN_DATA,)], schema="v array<array<array<int>>>")
    assert _one(d3, ndim_size(F.col("v"), 1)) == 2
    assert _one(d3, ndim_size(F.col("v"), 2)) == [2, 2]
    assert _one(d3, ndim_size(F.col("v"), 3)) == [3, 1, 1, 2]


def test_ndim_resize(spark):
    # outer-dim resize: truncate and pad
    df = create(spark, [([1, 2, 3],)], schema="v array<int>")
    assert _one(df, ndim_resize(F.col("v"), 2, 0)) == [1, 2]
    assert _one(df, ndim_resize(F.col("v"), 5, 9)) == [1, 2, 3, 9, 9]
    # ndim.hpp:246-250: empty vec resized to {{2},{3,1}} with val 2
    e = create(spark, [([],)], schema="v array<array<int>>")
    got = _one(e, ndim_resize2(F.col("v"), 2, F.array(F.lit(3), F.lit(1)), 2))
    assert got == [[2, 2, 2], [2]]
    # shrink + grow mixed, existing content preserved
    df2 = create(spark, [([[1, 2], [3, 4, 5]],)], schema="v array<array<int>>")
    got2 = _one(df2, ndim_resize2(F.col("v"), 3,
                                  F.array(F.lit(1), F.lit(4), F.lit(2)), 0))
    assert got2 == [[1], [3, 4, 5, 0], [0, 0]]


def test_ndim_pad_depth1_fixture(spark):
    # ndim.hpp:308-311: {{1,2},{3,4,5},{}} pad -1 → rectangular
    df = create(spark, [(0, [1, 2]), (1, [3, 4, 5]), (2, [])],
                schema="id int, v array<int>")
    rows = Pad("v", value=-1)(df).orderBy("id").collect()
    assert [r.v for r in rows] == [[1, 2, -1], [3, 4, 5], [-1, -1, -1]]


def test_pad_depth2_mask(spark):
    """Multi-dim pad: outer AND inner dims padded to the per-dimension
    group max; leaf mask true only on original elements (the reference's
    resize(true) → pad → resize(false) recipe, pad.hpp:35-44)."""
    df = create(
        spark,
        [(0, [[1], [2, 3]]), (1, [[4, 5, 6]]), (2, [])],
        schema="id int, v array<array<int>>",
    )
    rows = Pad("v", value=-1, depth=2)(df).orderBy("id").collect()
    assert [r.v for r in rows] == [
        [[1, -1, -1], [2, 3, -1]],
        [[4, 5, 6], [-1, -1, -1]],
        [[-1, -1, -1], [-1, -1, -1]],
    ]
    assert [r.v_mask for r in rows] == [
        [[True, False, False], [True, True, False]],
        [[True, True, True], [False, False, False]],
        [[False, False, False], [False, False, False]],
    ]


def test_pad_depth2_grouped(spark):
    df = create(
        spark,
        [("g1", [[1, 2]]), ("g1", [[3], [4]]), ("g2", [[7, 8, 9]])],
        schema="g string, v array<array<int>>",
    )
    rows = Pad("v", value=0, depth=2, group_by="g")(df) \
        .orderBy("g", F.col("v")[0][0]).collect()
    # g1: outer max 2, inner max 2; g2 untouched (its own maxes)
    assert rows[0].v == [[1, 2], [0, 0]]
    assert rows[1].v == [[3, 0], [4, 0]]
    assert rows[2].v == [[7, 8, 9]]


def test_shape(spark):
    # ndim.hpp:373-381: {{1,2},{3,4},{5,6},{5,6}} → shape {4,2}
    df = create(spark, [([[1, 2], [3, 4], [5, 6], [5, 6]],)],
                schema="v array<array<int>>")
    assert _one(df, shape(F.col("v"), 2)) == [4, 2]
    assert _one(df, shape(F.col("v"), 1)) == [4]
    e = create(spark, [([],)], schema="v array<array<int>>")
    assert _one(e, shape(F.col("v"), 2)) == [0, 0]


def test_flat_view_deep(spark):
    # ndim.hpp:436-444 + 3-deep
    df = create(spark, [([[1, 2], [3], [], [4, 5, 6]],)],
                schema="v array<array<int>>")
    assert _one(df, flat_view(F.col("v"), 2)) == [1, 2, 3, 4, 5, 6]
    d3 = create(spark, [(GEN_DATA,)], schema="v array<array<array<int>>>")
    assert _one(d3, flat_view(F.col("v"), 3)) == [-1] * 7


def test_gen_fill_reference_fixture(spark):
    """The generate() doc table (ndim.hpp:597-601), counter per row."""
    df = create(spark, [(GEN_DATA,)], schema="v array<array<array<int>>>")
    cases = {
        0: [[[0, 0, 0], [0]], [[0], [0, 0]]],
        1: [[[0, 0, 0], [0]], [[1], [1, 1]]],
        2: [[[0, 0, 0], [1]], [[2], [3, 3]]],
        3: [[[0, 1, 2], [3]], [[4], [5, 6]]],
    }
    for gd, want in cases.items():
        assert _one(df, gen_fill(F.col("v"), gd, ndims=3)) == want, gd


def test_gen_fill_empty_subtrees_consume_counter(spark):
    """ndim.hpp:606-611: empty subtrees still consume counter values at
    the generated dimension."""
    df = create(spark, [(GEN_EMPTY,)], schema="v array<array<array<int>>>")
    assert _one(df, gen_fill(F.col("v"), 1, ndims=3)) == \
        [[[0, 0, 0], [0]], [[], []], [[2], [2, 2]]]
    assert _one(df, gen_fill(F.col("v"), 2, ndims=3)) == \
        [[[0, 0, 0], [1]], [[], []], [[4], [5, 5]]]
    assert _one(df, gen_fill(F.col("v"), 3, ndims=3)) == \
        [[[0, 1, 2], [3]], [[], []], [[4], [5, 6]]]


def test_gen_fill_dim2(spark):
    df = create(spark, [([[9, 9], [], [9]],)], schema="v array<array<int>>")
    assert _one(df, gen_fill(F.col("v"), 1, ndims=2)) == [[0, 0], [], [2]]
    assert _one(df, gen_fill(F.col("v"), 2, ndims=2)) == [[0, 1], [], [2]]
    assert _one(df, gen_fill(F.col("v"), 0, ndims=2, start=7)) == [[7, 7], [], [7]]
