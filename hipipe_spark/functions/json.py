"""Semi-structured (JSON string) column operators.

Event streams and transcript tool-call payloads carry JSON strings
(the ``events.props`` column here; tool arguments in agent traces).
At 100 TB the rules are: parse each row ONCE (``from_json`` with an
explicit schema — one Jackson pass per row), never per-field
(``get_json_object`` re-parses the document for every call), and keep
extraction scan-local so Catalyst can prune/pushdown around it.

No UDFs anywhere; everything is JVM expressions inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_features(
    df: DataFrame,
    col: str,
    fields: dict[str, str],
    prefix: str = "",
) -> DataFrame:
    """Extract typed top-level fields from a JSON string column in ONE
    parse per row: ``fields`` maps field name -> Spark type string
    (e.g. ``{"k": "int", "tag": "string"}``). Adds one column per
    field named ``{prefix}{field}``; malformed JSON / missing fields
    yield null (PERMISSIVE mode — the only sane default on web data).
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    schema = ", ".join(f"`{k}` {t}" for k, t in fields.items())
    parsed = F.from_json(F.col(col), schema)
    out = df.withColumn("__j", parsed)
    for k in fields:
        out = out.withColumn(f"{prefix}{k}", F.col(f"__j.{k}"))
    return out.drop("__j")


def json_key_profile(df: DataFrame, col: str) -> DataFrame:
    """Schema discovery over a JSON string column: per top-level key,
    how many documents carry it (``n_docs``) and its share of ALL
    input rows (``doc_share``) — the first query anyone runs against
    an unknown event payload. Malformed-JSON rows contribute no keys
    (they depress every share, which is the honest reading).

    One explode + one hash aggregate on the key (map-side combined),
    plus one count job for the denominator.
    """
    keys = (df.select(
                F.explode_outer(F.json_object_keys(F.col(col)))
                 .alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_docs")))
    parseable = keys.filter(F.col("key").isNotNull())
    total = df.count()  # one scalar job; documented driver-side count
    return (parseable
            .select("key", "n_docs",
                    F.round(F.col("n_docs") / F.lit(float(total)), 6)
                     .alias("doc_share")))
