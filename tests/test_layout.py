"""Z-order locality key (operators/layout.py)."""

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.layout import zorder_key, zorder_layout


def _zcol(df):
    return [r["z"] for r in df.orderBy("id").collect()]


def test_zorder_minmax_interleave_exact(spark):
    # 2 cols, 2 bits: cells are floor((v-lo)*4/(span+eps)) capped at 3.
    # x,y in {0..3} with lo=0 hi=3 -> cell == value (span+eps trick:
    # (v*4)/(3+1e-12) floors to v for v<=3).
    rows = [(i, x, y) for i, (x, y) in enumerate(
        [(0, 0), (1, 0), (0, 1), (3, 3), (2, 1), (1, 2)])]
    df = spark.createDataFrame(rows, "id int, x int, y int")
    out = zorder_key(df, ["x", "y"], bits=2)
    got = {(r["x"], r["y"]): r["z"] for r in out.collect()}

    def morton2(x, y):
        z = 0
        for b in range(2):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton2(x, y), (x, y, z)


def test_zorder_locality_beats_single_column_sort(spark):
    # the point of the key: range-partition by z gives BOTH columns
    # bounded per-chunk ranges; sorting by x alone leaves y unbounded.
    import itertools
    rows = [(i, x, y) for i, (x, y) in enumerate(
        itertools.product(range(32), range(32)))]
    df = spark.createDataFrame(rows, "id int, x int, y int")
    pdf = (zorder_key(df, ["x", "y"], bits=5)
           .orderBy("z").toPandas())
    n_chunks = 16
    sz = len(pdf) // n_chunks
    # max per-chunk span of y under z-order vs under x-sort
    zspan = max(pdf.y.iloc[i * sz:(i + 1) * sz].max()
                - pdf.y.iloc[i * sz:(i + 1) * sz].min()
                for i in range(n_chunks))
    xs = pdf.sort_values(["x", "y"]).reset_index()
    xspan = max(xs.y.iloc[i * sz:(i + 1) * sz].max()
                - xs.y.iloc[i * sz:(i + 1) * sz].min()
                for i in range(n_chunks))
    assert zspan < xspan  # 31 for x-sort; ~7-15 for z-order
    assert zspan <= 15


def test_zorder_rank_skew_proof(spark):
    # outlier at x=1000 while the tail lives in 0..9 (y held constant so
    # z encodes x alone): minmax squeezes the whole tail into cell 0 (one
    # z value); rank gives the tail equal-mass cells.
    rows = ([(i, 1000, 0) for i in range(90)]
            + [(90 + i, i, 0) for i in range(10)])
    df = spark.createDataFrame(rows, "id int, x int, y int")
    mm = (zorder_key(df, ["x", "y"], bits=4, method="minmax")
          .filter(F.col("x") < 1000).select("z").distinct().count())
    rk = (zorder_key(df, ["x", "y"], bits=4, method="rank")
          .filter(F.col("x") < 1000).select("z").distinct().count())
    assert mm == 1
    assert rk >= 2  # tail ranks land in the low cells, not one cell


def test_zorder_nulls_and_constant_column(spark):
    df = spark.createDataFrame(
        [(0, None, 5), (1, 2, 5), (2, 3, 5)], "id int, x int, y int")
    out = zorder_key(df, ["x", "y"], bits=3)
    got = _zcol(out)
    assert len(got) == 3
    # constant y column -> cell 0 for all; null x coalesces to lo -> cell 0
    assert got[0] == 0


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)  # 64 > 63
    with pytest.raises(ValueError):
        zorder_key(df, [], bits=4)
    with pytest.raises(ValueError):
        zorder_key(df, ["x"], bits=4, method="hilbert")


def test_zorder_layout_partitions_are_z_ranges(spark):
    rows = [(i, i % 57, (i * 7) % 41) for i in range(2000)]
    df = spark.createDataFrame(rows, "id int, x int, y int")
    out = zorder_layout(df, ["x", "y"], bits=8, method="minmax", n_files=8)
    parts = (out.withColumn("p", F.spark_partition_id())
                .groupBy("p").agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
                .orderBy("lo").collect())
    # contiguous, non-overlapping z-ranges per output file
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] <= b["lo"]
