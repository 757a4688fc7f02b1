"""Per-operator unit tests with inline golden values — the reference's
test discipline (SURVEY.md §5.1), Spark-shaped."""

import pandas as pd
from pyspark.sql import functions as F

from hipipe_spark.functions.casts import string_to_bool
from hipipe_spark.operators.core import (
    BatchTransform, Copy, Drop, Filter, ForEach, Generate, Keep, Pad,
    RandomFill, Rebatch, Transform, VecTransform, create, unpack,
)


def test_keep_drop_copy(spark):
    df = create(spark, [(1, "a", 2.0)], schema="x int, y string, z double")
    assert Keep("x", "y")(df).columns == ["x", "y"]
    assert Drop("y")(df).columns == ["x", "z"]
    out = Copy("x", "x2")(df)
    assert unpack(out, "x2") == [1]


def test_transform_cond(spark):
    # reference transform.hpp:332-376 — apply only where cond col true
    df = create(spark, [(1, True, 0), (2, False, 0)], schema="v int, c boolean, o int")
    out = Transform("v", "o", lambda v: v * 100, cond="c")(df)
    rows = {r.v: r.o for r in out.collect()}
    assert rows == {1: 100, 2: 0}


def test_transform_prob_extremes(spark):
    # transform.hpp:433-437 — prob 0 => identity, 1 => always
    df = create(spark, [(1, 0), (2, 0)], schema="v int, o int")
    always = Transform("v", "o", lambda v: v + 7, prob=1.0, key="v")(df)
    assert sorted(unpack(always, "o")) == [8, 9]
    never = Transform("v", "o", lambda v: v + 7, prob=0.0, key="v")(df)
    assert sorted(unpack(never, "o")) == [0, 0]


def test_transform_prob_deterministic(spark):
    df = spark.range(1000).withColumnRenamed("id", "v").withColumn("o", F.col("v"))
    t = Transform("v", "o", lambda v: -v, prob=0.3, key="v", seed=5)
    a = sorted(unpack(t(df), "o"))
    b = sorted(unpack(t(df.repartition(7)), "o"))
    assert a == b  # same rolls at any partitioning
    frac = sum(1 for x in a if x < 0) / len(a)
    assert 0.25 < frac < 0.35


def test_transform_dim2(spark):
    df = create(spark, [([1, 2, 3],)], schema="arr array<int>")
    out = Transform("arr", "arr", lambda x: x * 2, dim=2)(df)
    assert unpack(out, "arr") == [[2, 4, 6]]


def test_filter_dims(spark):
    df = create(spark, [(1, [1, -2, 3]), (-5, [4])], schema="v int, arr array<int>")
    assert unpack(Filter(["v"], lambda v: v > 0)(df), "v") == [1]
    out = Filter("arr", lambda x: x > 0, dim=2)(df)
    assert sorted(unpack(out, "arr", dim=2)) == [1, 3, 4]
    # dim 0: drop whole batches by a batch-level predicate
    # (reference filter.hpp:115-125); one batch per partition here
    df2 = df.repartition(2, "v")
    kept = Filter([], lambda pdf: pdf["v"].max() > 0, dim=0)(df2)
    assert 1 <= kept.count() <= 2  # batches containing v=1 survive
    none = Filter([], lambda pdf: False, dim=0)(df2)
    assert none.count() == 0


def test_batch_transform_dim0(spark):
    # partial_transform analog: whole-batch pandas function
    df = create(spark, [(1,), (2,), (3,)], schema="v int")
    out = BatchTransform(
        lambda pdf: pdf.assign(s=pdf.v.cumsum()), "v int, s int"
    )(df.coalesce(1))
    assert sorted(unpack(out, "s")) == [1, 3, 6]


def test_vec_transform(spark):
    df = create(spark, [(1.0,), (4.0,)], schema="v double")
    out = VecTransform("v", "r", lambda s: s * 0.5, "double")(df)
    assert sorted(unpack(out, "r")) == [0.5, 2.0]


def test_generate_and_random_fill(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    out = Generate("c", F.lit(9))(df)
    assert unpack(out, "c") == [9] * 5
    r1 = RandomFill("u", key="k", seed=3)(df)
    r2 = RandomFill("u", key="k", seed=3)(df.repartition(3))
    assert sorted(unpack(r1, "u")) == sorted(unpack(r2, "u"))
    vals = unpack(r1, "u")
    assert all(0 <= v < 1 for v in vals)
    norm = RandomFill("z", key="k", seed=3, dist="normal")(df)
    assert len(unpack(norm, "z")) == 5


def test_pad_mask(spark):
    # reference pad.hpp:66-75 fixture: {{1,2},{3,4,5},{},{6,7}}
    # padded per logical group (whole table): max len 3
    df = create(
        spark,
        [(0, [1, 2]), (1, [3, 4, 5]), (2, []), (3, [6, 7])],
        schema="id int, seq array<int>",
    )
    out = Pad("seq", value=-1)(df).orderBy("id")
    rows = out.collect()
    assert [r.seq for r in rows] == [[1, 2, -1], [3, 4, 5], [-1, -1, -1], [6, 7, -1]]
    assert [r.seq_mask for r in rows] == [
        [True, True, False], [True, True, True],
        [False, False, False], [True, True, False],
    ]


def test_rebatch_preserves_rows(spark):
    df = spark.range(100)
    out = Rebatch(3, shuffle=True)(df)
    assert out.rdd.getNumPartitions() == 3
    assert out.count() == 100


def test_unpack_dims(spark):
    # reference test/core/stream/unpack.cpp:28-45 fixture
    df = create(
        spark,
        [(3, [1, 4]), (1, [8, 2]), (7, [2, 5])],
        schema="i int, v array<int>",
    )
    assert sorted(unpack(df, "i")) == [1, 3, 7]
    flat = unpack(df, "v", dim=2)
    assert sorted(flat) == [1, 2, 2, 4, 5, 8]
    i, v = unpack(df, ["i", "v"])
    assert len(i) == 3 and len(v) == 3


def test_for_each_passthrough(spark):
    df = create(spark, [(1,), (2,)], schema="v int")
    out = ForEach(lambda pdf: None)(df)
    assert sorted(unpack(out, "v")) == [1, 2]


def test_string_to_bool(spark):
    df = create(
        spark,
        [("true",), ("Yes",), ("ON",), ("0",), ("off",), ("maybe",), (" y ",)],
        schema="s string",
    )
    out = df.select(string_to_bool(F.col("s")).alias("b")).collect()
    assert [r.b for r in out] == [True, True, True, False, False, None, True]


def test_transform_filter_dim3(spark):
    from hipipe_spark.operators.core import Filter, Transform

    df = spark.createDataFrame(
        [(1, [[1, 2], [3]]), (2, [[4], [5, 6]])],
        "id int, a array<array<int>>")
    out = Transform("a", "a", lambda x: x * 10, dim=3)(df)
    got = {r["id"]: r["a"] for r in out.collect()}
    assert got == {1: [[10, 20], [30]], 2: [[40], [50, 60]]}

    out2 = Filter("a", lambda x: x % 2 == 0, dim=3)(df)
    got2 = {r["id"]: r["a"] for r in out2.collect()}
    assert got2 == {1: [[2], []], 2: [[4], [6]]}
