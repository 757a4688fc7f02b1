"""CSV source/sink matching the reference dialect.

Reference (``include/hipipe/core/csv.hpp:30-38``, impl
``src/core/csv.cpp:74-192``): backslash-escaped quotes (NOT doubled),
quoting honored only when the field starts with a quote, unquoted fields
whitespace-trimmed, optional leading lines dropped, rectangularity
enforced. The reference parses into an all-string ``dataframe``
(cast-on-read, ``dataframe.hpp:40-52``); we mirror that with
``inferSchema=False`` → all-string DataFrame + :func:`typed` casts.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hipipe_spark.functions.casts import string_to


def read_csv(
    spark: SparkSession,
    path: str,
    has_header: bool = True,
    sep: str = ",",
    quote: str = '"',
    drop: int = 0,
) -> DataFrame:
    """Read the reference CSV dialect into an all-string DataFrame.

    ``drop`` leading lines are skipped (reference ``csv.hpp:121`` —
    implemented via an initial filter on a line index when > 0;
    Spark's reader has no skip-N option, so we read raw lines first).
    """
    if drop > 0:
        lines = spark.read.text(path)
        lines = (
            lines.rdd.zipWithIndex()
            .filter(lambda r: r[1] >= drop)
            .map(lambda r: r[0].value)
        )
        reader = spark.read
        df = reader.csv(
            lines, header=has_header, sep=sep, quote=quote, escape="\\",
            ignoreLeadingWhiteSpace=True, ignoreTrailingWhiteSpace=True,
            inferSchema=False,
        )
        return df
    return spark.read.csv(
        path, header=has_header, sep=sep, quote=quote, escape="\\",
        ignoreLeadingWhiteSpace=True, ignoreTrailingWhiteSpace=True,
        inferSchema=False,
    )


def typed(df: DataFrame, types: Mapping[str, str]) -> DataFrame:
    """Cast-on-read (reference ``dataframe::cols<T...>``,
    ``dataframe.hpp:428-457``): project listed columns to types, with the
    tolerant bool ladder for booleans."""
    return df.select(
        *[string_to(F.col(c), t).alias(c) for c, t in types.items()]
    )


def write_csv(df: DataFrame, path: str, sep: str = ",", quote: str = '"',
              header: bool = True, mode: str = "overwrite") -> None:
    """Write CSV with the reference's quoting behavior (auto-quote fields
    containing sep/quote/newline — Spark's writer does this; backslash
    escape to match the read dialect, ``src/core/csv.cpp:213-227``)."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("sep", sep)
        .option("quote", quote)
        .option("escape", "\\")
        .csv(path)
    )
