"""Sequence packing for LLM pretraining batches.

Concat-and-chunk packing — the standard GPT-style pretraining layout:
documents are concatenated in a stable order and the token stream is cut
into fixed-length training chunks. Each document's placement is fully
determined by its global token offset (the exclusive cumulative sum of
token counts in document order), so the whole operator reduces to a
distributed exclusive cumsum plus per-row chunk arithmetic.

Relation to the reference: hipipe's ``batch``/``rebatch`` stages
(``include/hipipe/core/stream/rebatch.hpp``) re-cut a stream of batches
to a fixed batch size while preserving order; :func:`pack_chunks` is the
same re-cutting semantic lifted to token granularity over an unbounded
corpus. It shares the two-phase range-partitioned prefix-sum recipe with
:func:`hipipe_spark.operators.groups.build_index_mapper` — phase 1
collects one partial sum per partition (a driver-sized vector), phase 2
adds the broadcast partition offset to a partition-local running sum —
so a 100-TB corpus never funnels through a single-task global window.

Greedy bin packing (first-fit by order, bin resets when full) is
deliberately NOT the default: it needs sequential state across the whole
corpus (each assignment depends on every prior one), which distributes
poorly and wastes no fewer tokens than concat-and-chunk when documents
are separated by EOS anyway. :func:`pack_greedy` provides it for
bounded inputs via a size-capped window, documented as the small-data
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _exclusive_cumsum(df: DataFrame, order_col: str, val_col: str,
                      out: str, n_partitions: int | None = None) -> DataFrame:
    """Exclusive prefix sum of ``val_col`` in ``order_col`` order,
    computed without a global single-task sort.

    Two-phase: range-partition by ``order_col`` (parallel range sort);
    phase 1 aggregates one (partition_id, sum) pair per partition —
    driver-sized — and prefix-sums those on the driver; phase 2 joins
    the broadcast offsets back and adds a partition-LOCAL running sum.
    Because range boundaries respect ``order_col`` order, the result
    equals ``sum(val) over (order by order_col rows unbounded preceding
    to 1 preceding)`` at any parallelism.

    Cache lifetime: the range-partitioned frame is persisted so both
    phases see one physical layout; caller releases via
    :func:`hipipe_spark.operators.core.release_cached`.
    """
    from hipipe_spark.operators.core import register_cached
    n_parts = int(n_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(n_parts, order_col)
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).persist()
    psums = {r["__pid"]: r["s"] for r in
             with_pid.groupBy("__pid")
             .agg(F.sum(F.col(val_col).cast("long")).alias("s")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(psums):
        offsets[pid] = acc
        acc += psums[pid] or 0
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long")
    w = (Window.partitionBy("__pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = F.coalesce(F.sum(F.col(val_col).cast("long")).over(w), F.lit(0))
    return register_cached(
        with_pid.join(F.broadcast(off_df), "__pid")
        .withColumn(out, (F.col("__off") + local).cast("long"))
        .drop("__pid", "__off"),
        with_pid,
    )


def pack_chunks(df: DataFrame, order_col: str, tokens_col: str,
                seq_len: int, n_partitions: int | None = None) -> DataFrame:
    """Assign every document its place in the concatenated-and-chunked
    token stream.

    Adds columns:

    - ``tok_offset``   — global offset of the document's first token
      (exclusive cumsum of ``tokens_col`` in ``order_col`` order);
    - ``chunk_first``  — index of the training chunk holding that first
      token (``tok_offset div seq_len``);
    - ``chunk_last``   — chunk holding the LAST token (empty documents
      pin to ``chunk_first`` so the span is always well-formed);
    - ``n_chunks``     — chunks the document spans (boundary crossings
      + 1 — the packing-waste / attention-fragmentation signal).

    One range shuffle + one driver-sized collect; the chunk math is
    pure column arithmetic. Deterministic at any parallelism.
    """
    out = _exclusive_cumsum(df, order_col, tokens_col, "tok_offset",
                            n_partitions)
    n_tok = F.col(tokens_col).cast("long")
    first = F.floor(F.col("tok_offset") / seq_len).cast("long")
    last = F.floor((F.col("tok_offset") + F.greatest(n_tok, F.lit(1)) - 1)
                   / seq_len).cast("long")
    from hipipe_spark.operators.core import register_cached
    # re-attach the cumsum's cache handle: withColumn returns a NEW
    # DataFrame object, so the register_cached attribute on `out` would
    # otherwise be lost and release_cached on the result a no-op.
    return register_cached(
        out.withColumn("chunk_first", first)
           .withColumn("chunk_last", last)
           .withColumn("n_chunks",
                       (F.col("chunk_last") - F.col("chunk_first") + 1)
                       .cast("int")),
        *getattr(out, "_hipipe_cached", ()))


def pack_stats(packed: DataFrame, tokens_col: str, seq_len: int) -> DataFrame:
    """Per-chunk packing stats from a :func:`pack_chunks` result:
    ``docs_started`` counts documents starting in each chunk;
    ``tokens_in_chunk`` sums each starting document's tokens that land
    before the next chunk boundary. One aggregation on ``chunk_first``
    — a dense, uniform-by-construction shuffle key, so no skew
    handling is needed."""
    contrib = F.least(
        F.lit(seq_len) - F.col("tok_offset") % seq_len,
        F.col(tokens_col).cast("long"),
    )
    return (packed.groupBy(F.col("chunk_first").alias("chunk_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("docs_started"),
                 F.sum(contrib).cast("long").alias("tokens_in_chunk"))
            )


def pack_greedy(df: DataFrame, order_col: str, tokens_col: str,
                seq_len: int, max_rows: int = 2_000_000) -> DataFrame:
    """First-fit-by-order greedy packing (bin resets when the next doc
    would overflow; docs longer than ``seq_len`` get a bin alone).

    The assignment is inherently sequential — bin k's contents depend on
    every earlier document — so this runs as ONE ordered window pass via
    an Arrow-batched running scan inside ``applyInPandas`` over a single
    group. It is the bounded-input path (guarded by ``max_rows``); at
    corpus scale use :func:`pack_chunks`, whose offsets distribute.
    """
    import pandas as pd

    cnt = df.limit(max_rows + 1).count()
    if cnt > max_rows:
        raise ValueError(
            f"pack_greedy is the bounded-input path (> {max_rows} rows); "
            "use pack_chunks at scale")

    schema = df.schema.add("bin_id", "long").add("bin_fill", "long")

    def assign(pdf):
        pdf = (pdf.drop(columns="__one")
               .sort_values(order_col, kind="mergesort").reset_index(drop=True))
        bins, fills = [], []
        bin_id, fill = 0, 0
        for t in pdf[tokens_col].astype("int64"):
            # oversized docs count as a full bin -> they sit alone
            t_eff = min(int(t), seq_len)
            if fill > 0 and fill + t_eff > seq_len:
                bin_id, fill = bin_id + 1, 0
            bins.append(bin_id)
            fill += t_eff
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return (df.withColumn("__one", F.lit(1))
              .groupBy("__one").applyInPandas(assign, schema=schema)
              .drop("__one"))


def chunk_overlap(
    df: DataFrame,
    tokens_col: str,
    window: int,
    stride: int | None = None,
    id_cols: Sequence[str] = ("doc_id",),
    out_col: str = "chunk",
) -> DataFrame:
    """Sliding-window chunking WITHIN each document: cut
    ``df[tokens_col]`` (array) into chunks of ``window`` tokens
    starting every ``stride`` tokens, so consecutive chunks overlap by
    ``window - stride`` — the long-document layout for models whose
    context is shorter than the document (each token appears in
    ≤ ceil(window/stride) chunks, and every window-length span is seen
    contiguously at least once).

    Emits one row per (document, chunk): ``id_cols``, ``chunk_idx``
    (0-based), ``chunk_start`` (0-based token offset), ``out_col``
    (the token slice; the final chunk is the tail and may be shorter),
    ``chunk_len``. Empty documents produce no rows.

    Chunk starts are 0, stride, 2·stride, …, stopping at the FIRST
    start whose chunk reaches the document end (last start =
    stride·⌈(len-window)/stride⌉, floored at 0) — a doc shorter than
    ``window`` yields exactly one chunk, and no start is emitted whose
    content is already a suffix of the previous chunk. Contrast with
    :func:`pack_chunks`: packing cuts the CONCATENATED corpus stream
    into disjoint fixed blocks (pretraining); overlap chunking stays
    inside one document and duplicates boundary context (long-doc SFT,
    retrieval indexing). Pure per-row explode arithmetic — narrow,
    no shuffle, no Python.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    stride = window if stride is None else stride
    if not 1 <= stride <= window:
        raise ValueError(f"stride must be in [1, window], got {stride}")
    n = F.size(F.col(tokens_col))
    # last start = stride * ceil((n - window)/stride), floored at 0:
    # the first start whose chunk [start, start+window) reaches the end
    last = F.greatest(
        F.lit(0),
        F.ceil((n - F.lit(window)) / F.lit(stride)) * F.lit(stride),
    )
    starts = F.sequence(F.lit(0).cast("long"), last, F.lit(stride).cast("long"))
    out = (
        df.filter(n > 0)
        .select(
            *id_cols,
            F.col(tokens_col).alias("__toks"),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .select(
            *id_cols,
            F.col("chunk_idx").cast("int"),
            F.col("chunk_start").cast("int"),
            # F.slice start is 1-based
            F.slice(
                F.col("__toks"), F.col("chunk_start") + F.lit(1), window
            ).alias(out_col),
        )
        .withColumn("chunk_len", F.size(F.col(out_col)))
    )
    return out
