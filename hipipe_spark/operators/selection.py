"""Importance-based training-data selection (DSIR).

Implements the hashed n-gram importance-resampling recipe of Xie et
al. 2023 ("Data Selection for Language Models via Importance
Resampling"): fit bag-of-hashed-ngram multinomials on a TARGET corpus
(the distribution you want more of) and on the RAW pool, score every
raw document with its log importance ratio sum_f [ln p_target(f) -
ln p_raw(f)], then resample via deterministic Gumbel top-k. The
selection signal that took Pile-of-Law/RedPajama-style corpora from
"quality classifier" to "distribution matching".

Scale shape:

1. featurization is a pure JVM expression (tokens + zip_with bigrams
   + hash-mod-buckets) — no UDF;
2. BOTH multinomials are n_buckets-row tables (one hash aggregate per
   corpus, map-side combined — the target corpus is typically tiny,
   the raw aggregate is one shuffle of 8-byte keys);
3. the per-document score joins exploded features to the BROADCAST
   n_buckets-row logratio table, then one doc-key aggregate. Nothing
   quadratic, nothing driver-side (the logratio table never leaves
   the executors).

Hash families: ``xxhash64`` (prod default, JVM-native) or ``det``
(the cross-engine LCG fold from functions/hashing.py) so a DuckDB
oracle can replicate every bucket id bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hipipe_spark.functions.hashing import det_hash01, det_hash_str_i64
from hipipe_spark.functions.text import tokens


def _features(text: Column, ngmax: int) -> Column:
    """Word unigram (+ bigram) feature strings."""
    toks = tokens(F.lower(text))
    if ngmax == 1:
        return toks
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bi)


def _bucket(feature: Column, n_buckets: int, hash_family: str) -> Column:
    if hash_family == "det":
        return F.pmod(det_hash_str_i64(feature), F.lit(n_buckets))
    return F.pmod(F.xxhash64(feature), F.lit(n_buckets))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    ngmax: int = 2,
    smooth: float = 0.5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight.

    Returns ``(doc_id, n_features, dsir_logweight)`` where
    ``dsir_logweight = sum_f ln[(c_t(f)+s)/(N_t+s*B)] -
    ln[(c_r(f)+s)/(N_r+s*B)]`` over the document's hashed features
    (duplicate features count each occurrence, as in the paper's
    multinomial). Higher = more target-like.
    """
    if ngmax not in (1, 2):
        raise ValueError("ngmax must be 1 or 2")
    if hash_family not in ("xxhash64", "det"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    spark = raw.sparkSession

    def corpus_counts(df: DataFrame, name: str) -> DataFrame:
        return (df.select(
                    F.explode(_features(F.col(text_col), ngmax))
                     .alias("feature"))
                .select(_bucket(F.col("feature"), n_buckets, hash_family)
                        .alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias(name)))

    # ONE raw-corpus scan: tokenize+explode+hash is the dominant cost,
    # and both the raw multinomial and the per-doc score are functions
    # of the per-(doc, bucket) occurrence counts — pre-aggregate those
    # once, persist, and derive both sides from the persisted table.
    # Size is bounded by n_docs x min(doc_features, n_buckets) rows of
    # (key, int8) — far below the exploded feature stream; MEMORY_AND_
    # DISK persist spills gracefully at 100-TB corpus scale. The score
    # rewrite sum_f logratio(f) == sum_bucket cnt * logratio(bucket) is
    # exact, so the DuckDB oracle is unchanged.
    doc_bucket = (raw.select(
                      F.col(id_col).alias("doc_id"),
                      F.explode_outer(_features(F.col(text_col), ngmax))
                       .alias("feature"))
                  .select("doc_id",
                          F.when(F.col("feature").isNotNull(),
                                 _bucket(F.col("feature"), n_buckets,
                                         hash_family)).alias("bucket"))
                  # count("bucket") ignores the null marker row an empty
                  # doc contributes via explode_outer -> cnt 0 for it
                  .groupBy("doc_id", "bucket")
                  .agg(F.count("bucket").alias("cnt"))
                  .persist())
    raw_counts = (doc_bucket.groupBy("bucket")
                  .agg(F.sum("cnt").alias("c_r")))

    grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    dist = (grid
            .join(F.broadcast(corpus_counts(target, "c_t")), "bucket", "left")
            .join(F.broadcast(raw_counts), "bucket", "left")
            .select("bucket",
                    F.coalesce("c_t", F.lit(0)).alias("c_t"),
                    F.coalesce("c_r", F.lit(0)).alias("c_r")))
    s = float(smooth)
    # totals via window sums over the n_buckets-row table (an .agg()
    # branch would re-execute both corpus scans — see psi_table note)
    from pyspark.sql import Window
    w = Window.partitionBy()
    logratio = (dist.select(
        "bucket",
        (F.log((F.col("c_t") + s) / (F.sum("c_t").over(w) + s * n_buckets))
         - F.log((F.col("c_r") + s) / (F.sum("c_r").over(w) + s * n_buckets))
         ).alias("logratio")))

    from hipipe_spark.operators.core import register_cached
    out = (doc_bucket
           .join(F.broadcast(logratio), "bucket", "left")
           .groupBy("doc_id")
           .agg(F.sum("cnt").alias("n_features"),
                F.round(F.coalesce(F.sum(F.col("cnt") * F.col("logratio")),
                                   F.lit(0.0)), 6)
                 .alias("dsir_logweight")))
    return register_cached(out, doc_bucket)


def gumbel_topk(
    df: DataFrame,
    logweight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 0,
    temperature: float = 1.0,
) -> DataFrame:
    """The paper's resampling step, made deterministic: select k rows
    by ``logweight/temperature + Gumbel(key, seed)`` where the Gumbel
    draw is key-derived (functions/hashing.py) — identical across
    cluster sizes and replicable in SQL. temperature -> 0 approaches
    argmax selection; 1.0 samples proportionally to exp(logweight).

    Global top-k via TakeOrderedAndProject (no full sort materialized).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = det_hash01(F.col(key_col), seed)
    # clamp away from 0 so -ln(-ln(u)) stays finite
    g = -F.log(-F.log(F.greatest(u, F.lit(1e-12))))
    scored = df.withColumn(
        "gumbel_score",
        F.round(F.col(logweight_col) / F.lit(float(temperature)) + g, 6))
    out = (scored
           .orderBy(F.col("gumbel_score").desc(), F.col(key_col).asc())
           .limit(k))
    # propagate any persisted intermediates (dsir_weights' doc_bucket)
    # so release_cached on the top-k result frees them too
    from hipipe_spark.operators.core import register_cached
    return register_cached(out, *getattr(df, "_hipipe_cached", ()))


def dsir_weights_oracle_sql(
    n_buckets: int = 4096,
    ngmax: int = 2,
    smooth: float = 0.5,
    raw_sql: str = "SELECT doc_id, text FROM documents",
    target_sql: str = ("SELECT doc_id, text FROM documents "
                       "WHERE doc_id % 7 = 0"),
) -> str:
    """DuckDB replica of :func:`dsir_weights(hash_family="det")`."""
    from hipipe_spark.functions.hashing import det_hash_str_i64_sql

    def toks(e: str) -> str:
        return (f"CASE WHEN trim({e}) = '' THEN CAST([] AS VARCHAR[]) "
                f"ELSE string_split_regex(trim(lower({e})), '\\s+') END")

    h = det_hash_str_i64_sql("f", 0)
    bucket = f"(((({h}) % {n_buckets}) + {n_buckets}) % {n_buckets})"
    bi = ("CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),"
          " i -> toks[i] || ' ' || toks[i + 1])"
          " ELSE CAST([] AS VARCHAR[]) END")
    feat = f"list_concat(toks, {bi})" if ngmax == 2 else "toks"
    s = float(smooth)
    return f"""
      WITH rawd AS ({raw_sql}),
      tgtd AS ({target_sql}),
      rfe AS MATERIALIZED (
        SELECT doc_id, {bucket} AS bucket
        FROM (SELECT doc_id, unnest({feat}) AS f
              FROM (SELECT doc_id, {toks('text')} AS toks FROM rawd))),
      tfe AS (
        SELECT {bucket} AS bucket
        FROM (SELECT unnest({feat}) AS f
              FROM (SELECT {toks('text')} AS toks FROM tgtd))),
      rc AS (SELECT bucket, count(*) AS c_r FROM rfe GROUP BY bucket),
      tc AS (SELECT bucket, count(*) AS c_t FROM tfe GROUP BY bucket),
      grid AS (SELECT range AS bucket FROM range({n_buckets})),
      dist AS (SELECT grid.bucket,
                      COALESCE(c_t, 0) AS c_t, COALESCE(c_r, 0) AS c_r
               FROM grid LEFT JOIN tc ON tc.bucket = grid.bucket
                         LEFT JOIN rc ON rc.bucket = grid.bucket),
      tot AS (SELECT sum(c_t) AS nt, sum(c_r) AS nr FROM dist),
      lr AS (SELECT bucket,
                    ln((c_t + {s}) / (nt + {s} * {n_buckets}))
                    - ln((c_r + {s}) / (nr + {s} * {n_buckets})) AS logratio
             FROM dist, tot),
      docs AS (SELECT doc_id FROM rawd)
      SELECT d.doc_id,
             CAST(count(lr.bucket) AS BIGINT) AS n_features,
             round(COALESCE(sum(lr.logratio), 0.0), 6) AS dsir_logweight
      FROM docs d
      LEFT JOIN rfe ON rfe.doc_id = d.doc_id
      LEFT JOIN lr ON lr.bucket = rfe.bucket
      GROUP BY d.doc_id
    """
