"""End-to-end training-corpus construction.

Composes the training-data stages into the canonical pretraining recipe
(the FineWeb / RefinedWeb pipeline shape): quality + repetition filter →
exact dedup → benchmark decontamination → concat-and-chunk packing.
Each stage is an existing operator; the composition exists so a user
gets the whole corpus build as ONE declarative plan Catalyst can
optimize end-to-end (the quality filter pushes to the parquet scan;
dedup is the only raw-text shuffle; the eval side broadcasts; packing
adds one range shuffle).

Relation to the reference: this is the pipeline-of-stages idea of
hipipe's ``stream | create | transform | filter | … | unpack`` chains
(`include/hipipe/core/stream/`), lifted to corpus granularity — stages
compose lazily and the engine schedules the whole chain at once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hipipe_spark.functions.text import (
    dup_ngram_frac, terminal_line_frac, token_count, tokens,
)
from hipipe_spark.operators.contamination import decontaminate
from hipipe_spark.operators.dedup import exact_dedup
from hipipe_spark.operators.packing import pack_chunks


@dataclass(frozen=True)
class CorpusFilter:
    """Thresholds for the keep decision (Gopher/C4-flavored defaults).

    ``min_tokens``: drop ultra-short docs; ``max_dup_2gram``: drop
    repetition-heavy docs; ``min_terminal_frac``: drop pages where few
    lines end in terminal punctuation (boilerplate). Every threshold is
    evaluated as a pure JVM expression on one shared tokenization.
    """

    min_tokens: int = 10
    max_dup_2gram: float = 0.3
    min_terminal_frac: float = 0.0


def quality_keep(df: DataFrame, text_col: str = "text",
                 flt: CorpusFilter = CorpusFilter()) -> DataFrame:
    """Rows passing the corpus filter. One narrow scan — the token
    array is computed once and every signal derives from it, so the
    filter collapses into the scan stage (no shuffle, no UDF)."""
    txt = F.col(text_col)
    ltoks = tokens(F.lower(txt))
    keep = (
        (token_count(txt, toks=ltoks) >= flt.min_tokens)
        & (dup_ngram_frac(txt, 2, toks=ltoks) <= flt.max_dup_2gram)
        & (terminal_line_frac(txt) >= flt.min_terminal_frac)
    )
    return df.filter(keep)


def build_training_set(docs: DataFrame, eval_docs: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       flt: CorpusFilter = CorpusFilter(),
                       contam_n: int = 3, contam_min_hits: int = 2,
                       seq_len: int = 512,
                       near_dedup: bool = False,
                       minhash_kwargs: dict | None = None,
                       boilerplate_min_docs: int | None = None,
                       shuffle_seed: int | None = None) -> DataFrame:
    """The full corpus build: filter → [optional line-level boilerplate
    removal] → exact dedup → [optional MinHash near-dedup] →
    decontaminate → pack → [optional deterministic shuffle rank].
    Returns the surviving documents with their packed layout
    (``tok_offset``/``chunk_first``/``chunk_last``/``n_chunks`` over
    the post-filter corpus in ``id_col`` order).

    ``boilerplate_min_docs`` strips lines occurring in that many
    distinct documents BEFORE dedup — pages differing only in shared
    navigation/footer lines then collapse to exact duplicates, which is
    why CCNet orders the stages this way. Documents reduced to nothing
    are dropped. ``shuffle_seed`` appends a ``shuffle_rank`` column —
    the bit-stable global training order (`ordering.py`).

    Shuffle budget at scale: one fingerprint shuffle (dedup), one band
    equi-join + component iteration when ``near_dedup`` is on, one
    broadcast join (decontaminate — eval side is benchmark-sized), one
    range shuffle (packing). The quality filter and the token counts
    ride the initial scan.

    ``near_dedup=True`` inserts MinHash+LSH candidate pairs →
    connected components → keep the canonical min-id doc per cluster
    (`dedup.minhash_lsh_pairs` / `dedup.dedup_clusters`); tune via
    ``minhash_kwargs``. Off by default because the driver oracle for
    the composite covers the deterministic stages — the near-dedup
    stage has its own oracled queries (`minhash_lsh`, `dedup_clusters`).
    """
    from hipipe_spark.operators.core import register_cached

    kept = quality_keep(docs, text_col, flt)
    if boilerplate_min_docs:
        from hipipe_spark.operators.boilerplate import (
            lines_from_text, remove_frequent_lines,
        )
        lined = kept.select(
            F.col(id_col),
            lines_from_text(F.col(text_col)).alias("__lines"))
        cleaned = remove_frequent_lines(
            lined, id_col, "__lines", min_docs=boilerplate_min_docs)
        kept = (cleaned.filter(F.size("clean_lines") > 0)
                .select(F.col(id_col),
                        F.array_join("clean_lines", "\n").alias(text_col)))
    # Persist the deduped corpus: its lineage (scan + filter +
    # fingerprint shuffle) feeds BOTH the contamination gram branch and
    # the anti-join probe side — uncached, Spark executes the full scan
    # and dedup shuffle twice (verified in the physical plan). The
    # caller owns the cache lifetime via release_cached, the same
    # contract as the pair generators. MEMORY_AND_DISK by Spark
    # default, so a corpus larger than cluster memory spills rather
    # than fails.
    deduped = exact_dedup(kept, text_col, id_col).persist()
    if near_dedup:
        from hipipe_spark.operators.dedup import (
            dedup_clusters, minhash_lsh_pairs,
        )
        pairs = minhash_lsh_pairs(deduped, id_col, text_col,
                                  exact_prepass=False,
                                  **(minhash_kwargs or {}))
        keep = (dedup_clusters(deduped, pairs, id_col)
                .filter("keep").select(id_col))
        deduped = deduped.join(keep, id_col, "left_semi")
    clean = decontaminate(deduped, eval_docs, id_col, text_col,
                          n=contam_n, min_hits=contam_min_hits)
    with_counts = clean.withColumn("n_tok", token_count(F.col(text_col)))
    packed = pack_chunks(with_counts, id_col, "n_tok", seq_len=seq_len)
    if shuffle_seed is not None:
        from hipipe_spark.operators.ordering import deterministic_shuffle
        # carry pack_chunks' cache handle across the shuffle (the
        # attribute lives on the DataFrame object, not the lineage)
        handles = getattr(packed, "_hipipe_cached", ())
        packed = register_cached(
            deterministic_shuffle(packed, id_col, seed=shuffle_seed),
            *handles)
    return register_cached(packed, deduped)


def corpus_stages(eval_docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  flt: CorpusFilter = CorpusFilter(),
                  contam_n: int = 3, contam_min_hits: int = 2,
                  seq_len: int = 512,
                  boilerplate_min_docs: int | None = None,
                  shuffle_seed: int | None = None):
    """The :func:`build_training_set` recipe as a named stage list for
    ``checkpoint.ResumablePipeline`` — each stage a pure
    ``DataFrame -> DataFrame`` committed as a snapshot, so a 100-TB
    corpus build that dies mid-decontamination resumes from the dedup
    snapshot instead of re-reading the raw corpus (the north-rule
    resumability contract, applied to the corpus half of the engine).

    Stage boundaries sit exactly at the expensive barriers: after the
    filtered scan, after the dedup shuffle, after the decontamination
    join, after packing. Results are row-identical to
    :func:`build_training_set` (packing orders by ``id_col``, so the
    parquet round-trip between stages cannot perturb the layout).
    """
    def _filter(df: DataFrame) -> DataFrame:
        kept = quality_keep(df, text_col, flt)
        if boilerplate_min_docs:
            from hipipe_spark.operators.boilerplate import (
                lines_from_text, remove_frequent_lines,
            )
            lined = kept.select(
                F.col(id_col),
                lines_from_text(F.col(text_col)).alias("__lines"))
            cleaned = remove_frequent_lines(
                lined, id_col, "__lines", min_docs=boilerplate_min_docs)
            kept = (cleaned.filter(F.size("clean_lines") > 0)
                    .select(F.col(id_col),
                            F.array_join("clean_lines", "\n")
                            .alias(text_col)))
        return kept

    def _dedup(df: DataFrame) -> DataFrame:
        return exact_dedup(df, text_col, id_col)

    def _decontaminate(df: DataFrame) -> DataFrame:
        return decontaminate(df, eval_docs, id_col, text_col,
                             n=contam_n, min_hits=contam_min_hits)

    def _pack(df: DataFrame) -> DataFrame:
        with_counts = df.withColumn("n_tok", token_count(F.col(text_col)))
        packed = pack_chunks(with_counts, id_col, "n_tok", seq_len=seq_len)
        if shuffle_seed is not None:
            from hipipe_spark.operators.ordering import deterministic_shuffle
            packed = deterministic_shuffle(packed, id_col, seed=shuffle_seed)
        return packed

    return [("filter", _filter), ("dedup", _dedup),
            ("decontaminate", _decontaminate), ("pack", _pack)]


# ----------------------------------------------------- corpus governance
def source_report(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus-composition report per ``group_cols``: ``n_docs``,
    ``n_chars``, ``n_tokens``, mean doc length, and each group's
    ``doc_share`` / ``token_share`` of the whole corpus — the
    governance table every curation run publishes (what fraction of
    the training set is each source×language?).

    One hash aggregation (all sums combine map-side) + the share
    division against corpus totals computed as window sums over the
    GROUP-sized frame (dimension-sized single-partition work, constant
    cost regardless of corpus size). No second corpus scan.
    """
    from pyspark.sql import Window

    toks = token_count(F.col(text_col))
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("n_chars"),
        F.sum(toks).alias("n_tokens"),
        F.round(F.avg(F.length(text_col)), 6).alias("mean_chars"),
    )
    wall = Window.partitionBy()
    return agg.select(
        *group_cols, "n_docs", "n_chars", "n_tokens", "mean_chars",
        F.round(F.col("n_docs") / F.sum("n_docs").over(wall), 6)
        .alias("doc_share"),
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(wall), 6)
        .alias("token_share"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 1000,
    order_by: str | None = None,
    order: str = "desc",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dominance capping: keep at most ``cap`` docs per ``group_col``
    (the C4/RefinedWeb-style per-domain cap that stops one crawler-
    friendly site from dominating the mixture). ``order_by`` picks
    WHICH docs survive (e.g. a quality score, ``order="desc"`` = best
    first); ``order_by=None`` ranks by ``id_col`` — deterministic,
    partition-independent. Ties always break on ``id_col``.

    One window exchange on ``group_col``; a monster group sorts in one
    task — for corpora where a single source exceeds executor memory,
    pre-filter with a Bernoulli sample or raise ``cap`` granularity
    (group on source×time-slice), same trade documented on
    ``generate_groups``.
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError("cap must be >= 1")
    if order_by is None:
        cols = [F.col(id_col).asc()]
    else:
        c = F.col(order_by)
        cols = [c.desc() if order == "desc" else c.asc(),
                F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*cols)
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= cap).drop("__rk"))


def vocab_growth(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_checkpoints: int = 10,
) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct vocabulary,
    token volume, and type-token ratio at ``n_checkpoints`` equal-width
    slices of the corpus in arrival order (``id_col`` is the arrival
    proxy — crawl ids are assigned monotonically).

    The curve is the standard corpus-composition diagnostic: a corpus
    whose vocabulary growth flattens early is saturated (more of the
    same data buys nothing); sub-linear growth per Heaps' law
    (V ~ k·Nᵝ, β≈0.5) is healthy; super-linear growth flags noise
    (OCR garbage, random ids) flooding the vocabulary.

    Scale shape: ONE explode→groupBy(token) shuffle computes each
    token's FIRST-occurrence bin (min over arrival bin — the shuffle
    key is the token, values are ints, so the wire volume is the
    distinct-occurrence table, never corpus bytes); per-doc token
    counts need no explode at all (``F.size``). Everything after the
    two aggregates runs on ``n_checkpoints`` rows. The cumulative
    window is a single-partition frame over those N rows — dimension
    arithmetic, not data.

    Returns one row per checkpoint: ``(bin, docs_cum, tokens_cum,
    vocab_cum, ttr)`` with ``ttr = vocab_cum / tokens_cum`` (null when
    a prefix has no tokens).
    """
    from pyspark.sql import Window

    if n_checkpoints < 1:
        raise ValueError("n_checkpoints must be >= 1")
    bounds = docs.agg(F.min(id_col).alias("lo"),
                      F.max(id_col).alias("hi")).collect()[0]
    if bounds["lo"] is None:  # empty corpus: empty curve
        return docs.sparkSession.createDataFrame(
            [], "bin int, docs_cum bigint, tokens_cum bigint, "
                "vocab_cum bigint, ttr double")
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = float(hi - lo + 1)
    n = int(n_checkpoints)

    def _bin(idc):
        return F.least(
            F.lit(n - 1),
            F.floor((idc - F.lit(lo)) * F.lit(float(n)) / F.lit(span)),
        ).cast("int")

    base = docs.select(
        _bin(F.col(id_col)).alias("bin"),
        F.size(tokens(F.lower(F.col(text_col)))).alias("n_tok"),
        F.lower(F.col(text_col)).alias("__lt"),
    )
    per_bin = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_toks"),
    )
    first_bin = (
        base.select("bin", F.explode(tokens(F.col("__lt"))).alias("token"))
            .groupBy("token").agg(F.min("bin").alias("fbin"))
            .groupBy("fbin").agg(F.count(F.lit(1)).alias("n_new")))

    grid = docs.sparkSession.range(n).select(F.col("id").cast("int").alias("bin"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return (grid
            .join(per_bin, "bin", "left")
            .join(first_bin, grid.bin == first_bin.fbin, "left")
            .select(
                "bin",
                F.sum(F.coalesce(F.col("n_docs"), F.lit(0))).over(w)
                 .alias("docs_cum"),
                F.sum(F.coalesce(F.col("n_toks"), F.lit(0))).over(w)
                 .alias("tokens_cum"),
                F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w)
                 .alias("vocab_cum"))
            .select(
                "bin", "docs_cum", "tokens_cum", "vocab_cum",
                F.round(F.when(F.col("tokens_cum") > 0,
                               F.col("vocab_cum") / F.col("tokens_cum")),
                        6).alias("ttr")))
