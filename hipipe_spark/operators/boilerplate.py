"""Line-level boilerplate removal (CCNet / RefinedWeb-style).

Web corpora repeat navigation menus, cookie banners, and footers across
thousands of pages; document-level dedup never sees them because the
surrounding text differs. The standard fix (CCNet §4.1, RefinedWeb
§3.1.3) removes individual LINES that occur in at least ``min_docs``
distinct documents, then stitches the survivors back in order.

Scale shape (the whole point at 100 TB):

1. ``posexplode_outer`` lines (narrow, ~rows×lines — no shuffle);
2. line document-frequency on ``md5(line)`` — the shuffle key is a
   fixed 32-char digest, not the line text, so the DF aggregate moves
   O(lines × 16B) instead of O(corpus bytes); one distinct + one
   count shuffle;
3. mark: left join exploded lines against the frequent-hash set —
   boilerplate sets are tiny relative to the corpus (bounded above by
   total_lines / min_docs), so AQE turns this into a broadcast join at
   runtime; no collect, no driver bottleneck if it is not;
4. regroup: ONE groupBy(id) with ``sort_array(collect_list(struct))``
   rebuilds each document's line order — per-document data, never a
   global sort.

Documents whose every line is boilerplate survive with an empty
``clean_lines`` (posexplode_outer keeps them); callers drop or keep.

Relation to the reference: hipipe has no corpus operators; this is the
training-data extension surface (SURVEY.md §2.3). The ``filter`` at
line granularity mirrors hipipe's dim-2 filter semantics
(`include/hipipe/core/stream/filter.hpp:105-133` — filter elements
inside a nested column while preserving the outer row) applied to a
corpus-wide predicate instead of a per-element one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lines_from_text(col: Column | str, delim: str = "\n") -> Column:
    """Split a text column into its lines array (empty text → [])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == ""), F.array().cast("array<string>")
                  ).otherwise(F.split(c, delim))


def line_doc_freq(docs: DataFrame, id_col: str = "doc_id",
                  lines_col: str = "lines") -> DataFrame:
    """(line, df) — number of DISTINCT documents each line occurs in.

    Within-document repeats count once (CCNet counts pages, not
    occurrences). Standalone diagnostic; :func:`remove_frequent_lines`
    inlines the same aggregate on the md5 digest instead of the text.
    """
    ex = docs.select(F.col(id_col).alias("__id"),
                     F.explode(lines_col).alias("line"))
    return (ex.distinct()
            .groupBy("line").agg(F.count(F.lit(1)).alias("df")))


def remove_frequent_lines(docs: DataFrame, id_col: str = "doc_id",
                          lines_col: str = "lines", min_docs: int = 2,
                          out_col: str = "clean_lines") -> DataFrame:
    """Remove every line occurring in ≥ ``min_docs`` distinct documents.

    Returns (id, ``out_col`` array in original order, n_lines,
    n_removed) — one row per input document, including documents left
    empty. See the module docstring for the plan shape.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would drop every line)")
    ex = docs.select(
        F.col(id_col),
        F.posexplode_outer(F.col(lines_col)).alias("__pos", "__line"),
    ).withColumn("__h", F.md5(F.col("__line")))
    freq = (ex.filter(F.col("__h").isNotNull())
            .select("__h", id_col).distinct()
            .groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") >= int(min_docs))
            .select(F.col("__h").alias("__fh")))
    marked = ex.join(freq, ex["__h"] == freq["__fh"], "left")
    rows = marked.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("__pos").alias("p"),
            F.col("__line").alias("l"),
            F.col("__fh").isNotNull().alias("f"),
        ))).alias("__a"))
    entries = F.filter(F.col("__a"), lambda s: s["l"].isNotNull())
    kept = F.filter(entries, lambda s: ~s["f"])
    return rows.select(
        F.col(id_col),
        F.transform(kept, lambda s: s["l"]).alias(out_col),
        F.size(entries).alias("n_lines"),
        (F.size(entries) - F.size(kept)).alias("n_removed"),
    )
