"""CSV source/sink matching the reference dialect.

Reference (``include/hipipe/core/csv.hpp:30-38``, impl
``src/core/csv.cpp:44-98,117-192``): fields are parsed from a character
stream — blanks skipped before each field; a field STARTING with the
quote char is read as a quoted literal (escape char escapes both quote
and escape; quoted fields may contain separators AND newlines) with any
unquoted trailing junk before the next separator discarded; any other
field is read up to the separator/newline and whitespace-trimmed;
doubled quotes are NOT an escape (two literal chars); rectangularity is
enforced. The writer (``csv.cpp:200-229``) quotes a field iff it
contains separator/quote/newline or starts/ends with whitespace.

Two dialects:

- ``dialect="hipipe"`` (default): exact reference semantics. Because a
  quoted field can span lines, parsing is a per-file character state
  machine (``wholetext`` read + ``mapInPandas``) — parallel ACROSS
  files, sequential within one (the same trade Spark's own
  ``multiLine=true`` CSV mode makes). The state machine is a fresh
  re-implementation of the semantics above, not a translation.
- ``dialect="spark"``: Spark's native reader/writer (splittable files,
  full scan parallelism) with the closest option set — the 100-TB path
  when exact mid-field-quote behavior is not required.

The reference parses into an all-string ``dataframe`` (cast-on-read,
``dataframe.hpp:40-52``); both dialects mirror that with all-string
columns + :func:`typed` casts.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hipipe_spark.functions.casts import string_to


def parse_hipipe_csv(text: str, sep: str = ",", quote: str = '"',
                     escape: str = "\\") -> list[list[str]]:
    """Parse a CSV character stream with the reference's field rules
    (``src/core/csv.cpp:44-98``). Returns rows of string fields.
    Raises ValueError on an unterminated quoted field (the reference
    throws ios_base::failure, e.g. its invalid_csvs[1] fixture)."""
    rows: list[list[str]] = []
    i, n = 0, len(text)
    while True:
        # skip whitespace between rows (reference: `*in_ >> std::ws` at
        # row end + `>> blanks` before fields); EOF → done
        while i < n and text[i] in " \t\r\n":
            i += 1
        if i >= n:
            break
        row: list[str] = []
        has_next = True
        while has_next:
            # skip blanks (spaces/tabs) before the field
            while i < n and text[i] in " \t":
                i += 1
            if i < n and text[i] == quote:
                # quoted field: escape escapes quote and escape chars
                i += 1
                buf = []
                closed = False
                while i < n:
                    c = text[i]
                    if c == escape and i + 1 < n and text[i + 1] in (quote, escape):
                        buf.append(text[i + 1])
                        i += 2
                    elif c == quote:
                        i += 1
                        closed = True
                        break
                    else:
                        buf.append(c)
                        i += 1
                if not closed:
                    raise ValueError("unterminated quoted CSV field")
                # discard anything up to separator/newline
                # (reference: parse_field() result ignored, csv.cpp:79)
                while i < n and text[i] not in (sep, "\n"):
                    i += 1
                if i < n and text[i] == sep:
                    has_next = True
                    i += 1
                else:
                    has_next = False
                    if i < n:
                        i += 1  # consume newline
                row.append("".join(buf))
            else:
                # unquoted field: up to separator/newline, trimmed
                j = i
                while j < n and text[j] not in (sep, "\n"):
                    j += 1
                row.append(text[i:j].strip())
                has_next = j < n and text[j] == sep
                i = j + 1 if j < n else j
        rows.append(row)
        if i >= n:
            break
    return rows


def read_csv(
    spark: SparkSession,
    path: str,
    has_header: bool = True,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    drop: int = 0,
    dialect: str = "hipipe",
) -> DataFrame:
    """Read CSV into an all-string DataFrame. ``drop`` leading rows are
    skipped (reference ``csv.hpp:121``). See module docstring for the
    dialect semantics/trade-off."""
    if dialect == "hipipe":
        # wholetext: quoted fields may span lines, so each FILE is one
        # parse unit — parallel across files, sequential within one (the
        # trade Spark's own multiLine=true makes). Only the first file
        # touches the driver (schema discovery); parsing runs in
        # executors via mapInPandas.
        files_df = spark.read.text(path, wholetext=True)
        first = files_df.limit(1).collect()
        if not first:
            raise ValueError("There has to be at least the header row.")
        first_rows = parse_hipipe_csv(first[0].value, sep, quote, escape)[drop:]
        if not first_rows:
            raise ValueError("There has to be at least the header row.")
        if has_header:
            header = first_rows[0]
        else:
            header = [f"_c{i}" for i in range(len(first_rows[0]))]
        n_cols = len(header)

        def parse(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                for t in pdf["value"]:
                    rows = parse_hipipe_csv(t, sep, quote, escape)[drop:]
                    if has_header and rows:
                        rows = rows[1:]  # per-file header, as Spark does
                    for r, row in enumerate(rows):
                        if len(row) != n_cols:
                            # rectangularity, reference csv.cpp:148-169
                            raise ValueError(
                                f"Row {r} has a different length (has: "
                                f"{len(row)}, expected: {n_cols}).")
                    if rows:
                        yield pd.DataFrame(
                            {h: [row[j] for row in rows]
                             for j, h in enumerate(header)})

        schema = ", ".join(f"`{h}` string" for h in header)
        return files_df.mapInPandas(parse, schema=schema)
    if dialect != "spark":
        raise ValueError(dialect)
    if drop > 0:
        lines = spark.read.text(path)
        lines = (
            lines.rdd.zipWithIndex()
            .filter(lambda r: r[1] >= drop)
            .map(lambda r: r[0].value)
        )
        return spark.read.csv(
            lines, header=has_header, sep=sep, quote=quote, escape=escape,
            ignoreLeadingWhiteSpace=True, ignoreTrailingWhiteSpace=True,
            inferSchema=False,
        )
    return spark.read.csv(
        path, header=has_header, sep=sep, quote=quote, escape=escape,
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


def _quote_field_expr(col, sep: str, quote: str, escape: str):
    """Reference writer quoting (``src/core/csv.cpp:200-229``): quote iff
    the field contains sep/quote/newline or starts/ends with whitespace;
    inside quotes, escape-prefix quote and escape chars. Pure JVM
    expressions — the writer stays distributed."""
    import re
    cls = "[" + re.escape(quote + escape) + "]"
    escaped = F.regexp_replace(col, cls, re.escape(escape) + "$0")
    must = (
        col.contains(sep) | col.contains(quote) | col.contains("\n")
        | col.rlike(r"^\s") | col.rlike(r"\s$")
    )
    return F.when(must, F.concat(F.lit(quote), escaped, F.lit(quote))) \
            .otherwise(col)


def write_csv(df: DataFrame, path: str, sep: str = ",", quote: str = '"',
              escape: str = "\\", header: bool = True,
              mode: str = "overwrite", dialect: str = "hipipe") -> None:
    """Write CSV. ``dialect="hipipe"``: the reference's exact quoting
    rules (incl. quoting fields with leading/trailing whitespace, which
    Spark's writer would instead drop or leave bare), rendered as one
    text line per row via JVM expressions. ``dialect="spark"``: Spark's
    native distributed CSV writer."""
    if dialect == "spark":
        (df.write.mode(mode).option("header", header).option("sep", sep)
         .option("quote", quote).option("escape", escape).csv(path))
        return
    if dialect != "hipipe":
        raise ValueError(dialect)
    # NULL fields serialize as EMPTY fields (like Spark's native writer
    # and the all-string reference dataframe). Without the coalesce,
    # concat_ws silently skips nulls — fewer separators, every later
    # column shifts left, and the reader rejects the ragged row.
    line = F.concat_ws(
        sep, *[_quote_field_expr(
                   F.coalesce(F.col(c).cast("string"), F.lit("")),
                   sep, quote, escape)
               for c in df.columns])
    body = df.select(line.alias("value"))
    if header:
        hdr_line = sep.join(
            _py_quote_field(c, sep, quote, escape) for c in df.columns)
        spark = df.sparkSession
        hdr = spark.createDataFrame([(0, hdr_line)], "ord int, value string")
        body = hdr.select("value").unionByName(body)
        # header must be the FIRST line: emit a single file. The hipipe
        # dialect is a single-stream format (reference writes one
        # ostream); use dialect="spark" for sharded 100-TB output.
        body = body.coalesce(1)
    body.write.mode(mode).text(path)


def _py_quote_field(field: str, sep: str, quote: str, escape: str) -> str:
    if (sep in field or quote in field or "\n" in field
            or (field and (field[0].isspace() or field[-1].isspace()))):
        out = []
        for ch in field:
            if ch in (quote, escape):
                out.append(escape)
            out.append(ch)
        return quote + "".join(out) + quote
    return field
