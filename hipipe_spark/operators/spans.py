"""Exact substring (token-window) deduplication.

MinHash/SimHash (dedup.py) find near-duplicate DOCUMENTS; web corpora
additionally carry verbatim repeated SPANS inside otherwise-distinct
documents (boilerplate, license headers, quoted chains). The standard
treatment (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better") removes every repeated substring above a
length threshold; their suffix-array construction is single-node. The
distributed equivalent used here: hash every ``window``-token sliding
window, call a window duplicated when the same hash occurs at more
than one (doc, pos), keep the first occurrence (min (doc_id, pos))
as canonical, and merge each document's other occurrences into maximal
duplicated spans.

Scale shape:

1. window explode is O(total tokens) rows of (hash, doc_id, pos) —
   8-byte hash + two ids, NOT text (the published algorithm's working
   set is the same order: a suffix array is O(tokens) too). ``stride``
   > 1 trades recall for an s-fold row cut when the corpus is too hot;
   stride=1 is exact.
2. ONE shuffle on the window hash computes each hash's occurrence
   count + canonical occurrence (window aggregates, partial-agg
   combined); only duplicated occurrences survive the filter — the
   non-dup bulk (the vast majority at web scale) never reaches
   stage 3.
3. ONE shuffle on doc_id computes the merged-union span length inside
   a single window (each row contributes the part of its window past
   the running max of previous ends — no span regroup, no UDF); the
   per-doc aggregate reuses the window's partitioning. State per doc
   is its duplicated positions only.

Token-joined window strings are hashed with xxhash64 (JVM-side); with
``hash="exact"`` the join key is the joined string itself — zero
collision risk and DuckDB-replicable, for the correctness gate.
Whitespace tokens contain no spaces, so the space-join is injective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hipipe_spark.functions.text import tokens


def substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    stride: int = 1,
    hash: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-span report.

    Returns one row per input document: ``(doc_id, total_tokens,
    n_dup_windows, dup_tokens, dup_frac)`` where ``dup_tokens`` is the
    total length of merged duplicated spans (a position inside two
    overlapping duplicated windows is counted once) and canonical
    (first) occurrences are NOT counted as duplicated — a span must
    appear elsewhere earlier to be flagged.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if hash not in ("xxhash64", "exact"):
        raise ValueError(f"unknown hash {hash!r}")

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    totals = base.select("doc_id", F.size("toks").alias("total_tokens"))

    win_txt = F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos") + 1, window))
    key = F.xxhash64(win_txt) if hash == "xxhash64" else win_txt
    occ = (base
           .filter(F.size("toks") >= window)
           .select("doc_id",
                   F.explode(
                       F.sequence(F.lit(0),
                                  F.size("toks") - window,
                                  F.lit(stride))).alias("pos"),
                   "toks")
           .select("doc_id", "pos", key.alias("wkey")))

    wk = Window.partitionBy("wkey")
    dup_occ = (occ
               .withColumn("n_occ", F.count(F.lit(1)).over(wk))
               .withColumn("first_occ",
                           F.min(F.struct("doc_id", "pos")).over(wk))
               .filter((F.col("n_occ") >= 2)
                       & ((F.col("doc_id") != F.col("first_occ.doc_id"))
                          | (F.col("pos") != F.col("first_occ.pos"))))
               # (doc_id, pos) is unique by construction — occ emits
               # each window position once, so no dedup shuffle needed
               .select("doc_id", "pos"))

    # merged-union length WITHOUT a span regroup: rows sorted by pos,
    # each contributes the part of [pos, pos+window) past the running
    # max of previous ends — Σ max(0, pos+w − max(prev_end, pos)) IS
    # the merged interval length, computed inside the one doc window;
    # the per-doc aggregate then reuses the window's hash partitioning
    # (no extra exchange vs the groupBy(doc, island) formulation)
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + window).over(
        wd.rowsBetween(Window.unboundedPreceding, -1))
    contrib = F.greatest(
        F.lit(0),
        F.col("pos") + window
        - F.greatest(F.coalesce(prev_end, F.lit(-1)), F.col("pos")))
    per_doc = (dup_occ
               .withColumn("__c", contrib)
               .groupBy("doc_id")
               .agg(F.sum("__c").alias("dup_tokens"),
                    F.count(F.lit(1)).alias("n_dup_windows")))

    return (totals.join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                "total_tokens",
                F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
                F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
                F.round(
                    F.when(F.col("total_tokens") > 0,
                           F.coalesce("dup_tokens", F.lit(0))
                           / F.col("total_tokens")).otherwise(F.lit(0.0)),
                    6).alias("dup_frac")))


def substring_dedup_oracle_sql(window: int = 8, stride: int = 1,
                               docs_sql: str =
                               "SELECT doc_id, text FROM documents") -> str:
    """DuckDB replica of :func:`substring_dedup(hash="exact")` — same
    tokenization, same window join key (the joined string), same
    gaps-and-islands merge."""
    w = window
    return f"""
      WITH d0 AS ({docs_sql}),
      d AS (SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(trim(lower(text)), '\\s+')
                   END AS toks
            FROM d0),
      totals AS (SELECT doc_id, len(toks) AS total_tokens FROM d),
      occ AS (
        SELECT doc_id, CAST(pos AS INT) AS pos,
               array_to_string(toks[pos + 1 : pos + {w}], ' ') AS wkey
        FROM (SELECT doc_id, toks,
                     unnest(range(0, len(toks) - {w} + 1, {stride})) AS pos
              FROM d WHERE len(toks) >= {w})),
      marked AS (
        SELECT doc_id, pos,
               count(*) OVER (PARTITION BY wkey) AS n_occ,
               min(struct_pack(d := doc_id, p := pos))
                 OVER (PARTITION BY wkey) AS fo
        FROM occ),
      dup_occ AS (
        SELECT DISTINCT doc_id, pos FROM marked
        WHERE n_occ >= 2 AND (doc_id <> fo.d OR pos <> fo.p)),
      isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(max(pos + {w}) OVER (
                      PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS new_grp
        FROM dup_occ),
      grps AS (
        SELECT doc_id, pos,
               sum(new_grp) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS grp
        FROM isl),
      spans AS (
        SELECT doc_id, grp, min(pos) AS s, max(pos) + {w} AS e,
               count(*) AS n_win
        FROM grps GROUP BY doc_id, grp),
      per_doc AS (
        SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS dup_tokens,
               CAST(sum(n_win) AS BIGINT) AS n_dup_windows
        FROM spans GROUP BY doc_id)
      SELECT t.doc_id,
             CAST(t.total_tokens AS INT) AS total_tokens,
             COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
             COALESCE(p.dup_tokens, 0) AS dup_tokens,
             round(CASE WHEN t.total_tokens > 0
                   THEN COALESCE(p.dup_tokens, 0)
                        / CAST(t.total_tokens AS DOUBLE)
                   ELSE 0.0 END, 6) AS dup_frac
      FROM totals t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
    """
