"""functions/rounding.py: the cross-engine exact-parity helpers.

Each helper is verified against the DuckDB twin it promises to match —
the same signed-zero / float-JSON traps that produced the round-4
driver reds (bigram_pmi, calendar, cuped, embedding_pool...) are the
test fixtures here, so a regression in either helper reproduces the
original defect class and fails bitwise."""

import math
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from hipipe_spark.functions.rounding import (
    json_units, json_units_sql, round_norm, round_norm_sql)


def _bits(x: float) -> str:
    return struct.pack(">d", x).hex()


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_round_norm_kills_signed_zero(spark, con):
    # cos(3*pi/2) ~ -1.8e-16: DuckDB round() keeps the sign (-0.0),
    # Spark's BigDecimal HALF_UP does not (+0.0) — the r4 calendar
    # defect. After normalization both engines emit +0.0 bitwise.
    vals = [math.cos(3 * math.pi / 2), -1e-9, 0.0, -0.25, 0.75, 2.5e-7]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in
           sdf.select(round_norm(F.col("x"), 6).alias("y")).collect()]
    ora = [con.execute(
        f"SELECT {round_norm_sql('CAST(? AS DOUBLE)', 6)}", [v]
    ).fetchone()[0] for v in vals]
    assert [_bits(a) for a in got] == [_bits(b) for b in ora]
    # and the signed zero is actually gone, not just matched
    assert _bits(got[0]) == _bits(0.0)
    assert _bits(got[1]) == _bits(0.0)


def test_round_norm_identity_away_from_zero(spark):
    sdf = spark.createDataFrame([(1.2345654,), (-9.87,)], "x double")
    got = [r.y for r in
           sdf.select(round_norm("x", 3).alias("y")).collect()]
    assert got == [1.235, -9.87]


def test_json_units_matches_duckdb_bitwise(spark, con):
    # floats whose raw JSON rendering DIVERGES between engines
    # (1e-6 -> "1.0E-6" vs "0.000001"; -0.0 sign dropped by DuckDB)
    # must serialize identically via integer micro-units
    arr = [1e-6, -1e-9, 0.5, -0.25, 123456.789012, 0.0]
    sdf = spark.createDataFrame([(arr,)], "v array<double>")
    got = sdf.select(json_units("v", 6).alias("j")).collect()[0].j
    ora = con.execute(
        f"SELECT {json_units_sql('?::DOUBLE[]', 6)}", [arr]).fetchone()[0]
    assert got == ora
    assert got == "[1,0,500000,-250000,123456789012,0]"


def test_json_units_empty_and_null(spark, con):
    sdf = spark.createDataFrame([([],), (None,)], "v array<double>")
    got = [r.j for r in sdf.select(json_units("v", 6).alias("j"))
           .collect()]
    assert got[0] == "[]"
    assert got[1] is None
    assert con.execute(
        f"SELECT {json_units_sql('[]::DOUBLE[]', 6)}").fetchone()[0] == "[]"
