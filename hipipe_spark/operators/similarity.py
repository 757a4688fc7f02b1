"""Approximate-nearest-neighbor similarity search over embedding columns.

Task-spec capability: top-k cosine neighbors for a query set against a
corpus of ``array<float>`` embeddings.

- :func:`brute_force_topk` — exact baseline: broadcast the (small) query
  set, JVM-side cosine per (query, corpus) pair, per-query top-k via
  window row_number. Corpus side never shuffles except the final top-k
  aggregation; at 100 TB the corpus scan is embarrassingly parallel.
- :func:`lsh_topk` — scale path: random-hyperplane sign sketches with
  multi-probe (hamming radius 0/1 bucket expansion) to cut the candidate
  set, then exact cosine re-rank of candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hipipe_spark.operators.dedup import cosine_sim

# The numpy/LSH/IVF paths collect the QUERY side to the driver (the
# corpus side never leaves the executors). That is the intended regime —
# query set ≪ corpus — and the bound below makes the assumption explicit
# instead of letting toPandas() silently OOM the driver.
MAX_QUERY_ROWS = 1_000_000


def _query_pdf(queries: "DataFrame", cols: list) -> "object":
    """Collect the query side with a hard size guard. Returns a pandas
    DataFrame (possibly empty)."""
    pdf = queries.select(*cols).limit(MAX_QUERY_ROWS + 1).toPandas()
    if len(pdf) > MAX_QUERY_ROWS:
        raise ValueError(
            f"query set exceeds MAX_QUERY_ROWS={MAX_QUERY_ROWS}; these "
            "search paths broadcast the query side and require query ≪ "
            "corpus — use brute_force_topk(impl='jvm') or pre-shard the "
            "query set")
    return pdf


def _empty_topk(spark, qid_t: str, nid_t: str) -> "DataFrame":
    return spark.createDataFrame(
        [], schema=f"query_id {qid_t}, neighbor_id {nid_t}, "
                   "cosine double, rank int")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _metric_expr(qv, cv, metric):
    """Similarity/distance expression per metric — all pure JVM."""
    if metric == "cosine":
        return cosine_sim(qv, cv)
    if metric == "dot":
        return _dot(qv, cv)
    if metric == "l2":
        return F.sqrt(F.aggregate(
            F.zip_with(qv, cv, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x))
    raise ValueError(f"unknown metric {metric!r}")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    impl: str = "jvm",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches).
    Output: (query_id, neighbor_id, <score>, rank) where <score> is
    named ``cosine`` for the default metric and ``score`` otherwise.

    ``metric``: "cosine" (default), "dot" (inner product, ranked
    descending), or "l2" (Euclidean distance, ranked ASCENDING —
    nearest first). The metric trio every embedding store exposes;
    pick "dot" for pre-normalized embeddings (skips two norms per
    pair) and "l2" for magnitude-sensitive spaces.

    ``impl="jvm"``: whole-stage-codegen expressions (zip_with dot
    product) — zero Python. ``impl="numpy"`` (cosine only):
    Arrow-batched mapInPandas with a BLAS matrix product per corpus
    batch against the broadcast query matrix — the faster path for
    high-dim embeddings (one matmul per batch instead of per-pair
    array folds), and a per-batch top-k pre-prune so only
    batch_size*k candidate rows leave Python."""
    if impl == "numpy":
        if metric != "cosine":
            raise ValueError("impl='numpy' supports metric='cosine'")
        return _brute_force_topk_numpy(corpus, queries, k, id_col, vec_col,
                                       query_id_col)
    qid = query_id_col or id_col
    score_name = "cosine" if metric == "cosine" else "score"
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cvec"))
    q = queries.select(F.col(qid).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            _metric_expr(F.col("qvec"), F.col("cvec"), metric).alias(score_name),
        )
    )
    order = F.col(score_name).asc() if metric == "l2" else F.col(score_name).desc()
    w = Window.partitionBy("query_id").orderBy(order, F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hard_negative_mine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str | None = None,
    min_sim: float | None = None,
    max_sim: float | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive / retrieval training: per
    query, the ``k`` most cosine-similar corpus vectors whose
    ``label_col`` DIFFERS from the query's — the confusable negatives
    a trainer pairs with each anchor (public recipe: in-batch negatives
    + mined hard negatives, e.g. DPR / sentence-transformers).

    ``min_sim``/``max_sim`` carve the SEMI-HARD band (FaceNet-style):
    negatives below ``min_sim`` are too easy to carry gradient signal,
    above ``max_sim`` are suspected label noise / unflagged duplicates;
    both bounds inclusive, None = unbounded.

    Output: (query_id, neighbor_id, cosine, rank) — rank 1 = hardest.
    Same scale shape as :func:`brute_force_topk`: the corpus never
    shuffles except the final per-query top-k; the query set (with its
    labels) broadcasts; the label-mismatch predicate and band filter
    run inside the joined scan, so pruned pairs never reach the window.
    Queries whose label is NULL match everything non-null (null-safe
    inequality); corpus rows with NULL labels are kept as negatives for
    any labeled query.
    """
    qid = query_id_col or id_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__nlbl"),
        F.col(vec_col).cast("array<double>").alias("cvec"))
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(label_col).alias("__qlbl"),
        F.col(vec_col).cast("array<double>").alias("qvec"))
    cos = cosine_sim(F.col("qvec"), F.col("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter((F.col("neighbor_id") != F.col("query_id"))
                & ~F.col("__nlbl").eqNullSafe(F.col("__qlbl")))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    if min_sim is not None:
        scored = scored.filter(F.col("cosine") >= float(min_sim))
    if max_sim is not None:
        scored = scored.filter(F.col("cosine") <= float(max_sim))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int | None = None,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """ANN evaluation: per-query recall@k of an approximate top-k
    result against the exact baseline — the number that says whether
    an IVF/LSH/int8 configuration is trustworthy BEFORE it indexes
    100 TB. Inputs are two (query_id, neighbor_id, ..., rank) frames
    (the shape every top-k operator here emits); ``k`` restricts both
    sides to rank ≤ k (None = use them whole).

    Output: one row per exact-side query — ``n_exact``, ``n_hit``
    (approx neighbors that appear in the exact set), ``recall`` =
    n_hit / n_exact. Queries the approx side missed entirely score
    0.0, not NULL — silent query dropout is precisely what this
    measures. Aggregate ``avg(recall)`` for the headline number.

    Cost: two dimension-sized joins on (query, neighbor) — this runs
    on top-k RESULTS (|Q|·k rows), never on the corpus.
    """
    a, e = approx, exact
    if k is not None:
        a = a.filter(F.col(rank_col) <= k)
        e = e.filter(F.col(rank_col) <= k)
    e_pairs = e.select(F.col(query_col).alias("__q"),
                       F.col(neighbor_col).alias("__n"))
    a_pairs = a.select(F.col(query_col).alias("__q"),
                       F.col(neighbor_col).alias("__n"))
    hits = (e_pairs.join(a_pairs, ["__q", "__n"], "left_semi")
            .groupBy("__q").agg(F.count(F.lit(1)).alias("n_hit")))
    base = e_pairs.groupBy("__q").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        base.join(hits, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.col("n_exact").cast("int"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("int").alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0))
                    / F.col("n_exact"), 6).alias("recall"),
        )
    )


def _brute_force_topk_numpy(corpus, queries, k, id_col, vec_col, query_id_col):
    import numpy as np
    import pandas as pd

    qid = query_id_col or id_col
    qpdf = _query_pdf(queries, [F.col(qid).alias("qid"),
                                F.col(vec_col).cast("array<double>").alias("v")])
    if not len(qpdf):
        return _empty_topk(corpus.sparkSession,
                           queries.schema[qid].dataType.simpleString(),
                           corpus.schema[id_col].dataType.simpleString())
    q_ids = qpdf["qid"].to_numpy()
    Q = np.stack(qpdf["v"].to_numpy())
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    spark = corpus.sparkSession
    b_q = spark.sparkContext.broadcast((q_ids, Qn))

    def batches(it):
        q_ids_l, Qn_l = b_q.value
        for pdf in it:
            if not len(pdf):
                continue
            C = np.stack(pdf["v"].to_numpy())
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
            sims = Qn_l @ Cn.T  # (n_q, n_batch) — one BLAS call
            nb_ids = pdf["nid"].to_numpy()
            # per-batch top-k pre-prune: at most n_q*k rows leave Python
            kk = min(k + 1, sims.shape[1])  # +1 in case self is in batch
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {"query_id": [], "neighbor_id": [], "cosine": []}
            for qi in range(sims.shape[0]):
                for ci in part[qi]:
                    if nb_ids[ci] == q_ids_l[qi]:
                        continue  # self-match
                    rows["query_id"].append(q_ids_l[qi])
                    rows["neighbor_id"].append(nb_ids[ci])
                    rows["cosine"].append(float(sims[qi, ci]))
            yield pd.DataFrame(rows)

    c = corpus.select(F.col(id_col).alias("nid"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    qid_t = queries.schema[qid].dataType.simpleString()
    nid_t = corpus.schema[id_col].dataType.simpleString()
    cand = c.mapInPandas(
        batches, schema=f"query_id {qid_t}, neighbor_id {nid_t}, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    refine_iters: int = 1,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search — the
    coarse-quantizer scale path alongside :func:`lsh_topk`.

    Train: seed centroids are ``n_cells`` corpus vectors chosen by
    stable hash order (deterministic, cluster-size-invariant), then
    ``refine_iters`` distributed Lloyd steps (assign via one BLAS
    matmul per Arrow batch; new centroids via posexplode +
    groupBy(cell, pos).avg — a pure shuffle-aggregate, no driver loop
    over data). Index: each corpus vector is assigned to its nearest
    centroid cell. Search: each query probes its ``n_probe`` nearest
    cells; candidates are fetched by an equi-join on ``cell`` (query
    side broadcast) and exactly cosine re-ranked.

    ``n_probe >= n_cells`` probes every cell and reproduces the exact
    brute-force result — the correctness anchor used in tests. At 100
    TB the corpus-side work is one narrow map (cell assignment) plus a
    partition-local candidate join; only ~|corpus|/n_cells·n_probe
    rows per query are scored.
    """
    import numpy as np
    import pandas as pd

    nid_t0 = corpus.schema[id_col].dataType.simpleString()
    qpdf = _query_pdf(queries, [F.col(id_col).alias("query_id"),
                                F.col(vec_col).cast("array<double>").alias("qvec")])
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cvec"))
    # ---- train: hash-sampled seeds, then distributed Lloyd refinement
    seeds = (c.orderBy(F.xxhash64(F.col("neighbor_id"), F.lit(seed)))
              .limit(n_cells).select("cvec").collect())
    if not len(qpdf) or not seeds:
        # empty query set (e.g. an upstream filter matched nothing) or
        # empty corpus: return an empty frame with the output schema
        # instead of crashing in np.stack
        return _empty_topk(corpus.sparkSession, nid_t0, nid_t0)
    cents = np.stack([np.array(r["cvec"]) for r in seeds])

    def assigner(cent_matrix):
        cn = cent_matrix / np.maximum(
            np.linalg.norm(cent_matrix, axis=1, keepdims=True), 1e-300)
        b = corpus.sparkSession.sparkContext.broadcast(cn)

        def assign(it):
            cn_l = b.value
            for pdf in it:
                if not len(pdf):
                    continue
                V = np.stack(pdf["cvec"].to_numpy())
                Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                                    1e-300)
                pdf = pdf.copy()
                pdf["cell"] = np.argmax(Vn @ cn_l.T, axis=1).astype("int32")
                yield pdf
        return assign

    nid_t = corpus.schema[id_col].dataType.simpleString()
    schema = f"neighbor_id {nid_t}, cvec array<double>, cell int"
    for _ in range(refine_iters):
        assigned = c.mapInPandas(assigner(cents), schema=schema)
        means = (assigned.select("cell", F.posexplode("cvec").alias("pos", "x"))
                 .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
                 .groupBy("cell")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
                 .select("cell", F.col("ms.m").alias("centroid"))
                 .collect())
        for r in means:  # cells may lose all members; keep old centroid then
            cents[r["cell"]] = np.array(r["centroid"])
    indexed = c.mapInPandas(assigner(cents), schema=schema)

    # ---- search: driver-side probe list for the (small) query set
    Q = np.stack(qpdf["qvec"].to_numpy())
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)
    npb = min(n_probe, n_cells)
    probes = np.argsort(-(Qn @ cn.T), axis=1)[:, :npb]
    qprobe = pd.DataFrame({
        "query_id": qpdf["query_id"].repeat(npb).to_numpy(),
        "qvec": qpdf["qvec"].repeat(npb).to_numpy(),
        "cell": probes.reshape(-1).astype("int32"),
    })
    spark = corpus.sparkSession
    q = spark.createDataFrame(
        qprobe, schema=f"query_id {nid_t}, qvec array<double>, cell int")
    scored = (
        indexed.join(F.broadcast(q), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine_sim(F.col("qvec"), F.col("cvec")).alias("cosine"))
    )  # each corpus row lives in exactly one cell and probe cells are
    #    distinct per query, so no dedup shuffle is needed
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: float | None = None,
    out_col: str = "qvec8",
) -> tuple[DataFrame, float]:
    """Symmetric int8 quantization of an embedding column:
    ``q = clamp(round(x * 127 / scale), -127, 127)`` as ``array<tinyint>``
    — 4× less memory/shuffle/IO than float32 (8× vs the double arrays
    JVM expressions otherwise force), the standard first step of any
    100-TB-scale vector index.

    ``scale=None`` computes the corpus max-|x| in one pass (an
    order-independent aggregate — deterministic at any parallelism) so
    the full dynamic range maps onto [-127, 127]. Pass an explicit
    scale to keep query and corpus on the SAME grid (required for
    meaningful integer dot products) — :func:`quantized_topk` does this
    for you. Returns ``(df_with_out_col, scale_used)``. Pure JVM
    arithmetic; round() is half-away-from-zero on both Spark and
    DuckDB, so oracles reproduce the codes exactly."""
    v = F.col(vec_col).cast("array<double>")
    if scale is None:
        row = df.agg(
            F.max(F.aggregate(v, F.lit(0.0),
                              lambda acc, x: F.greatest(acc, F.abs(x))))
        ).collect()
        scale = float(row[0][0] or 1.0) or 1.0
    q = F.transform(
        v,
        lambda x: F.least(
            F.lit(127), F.greatest(F.lit(-127),
                                   F.round(x * (127.0 / scale)).cast("int"))
        ).cast("tinyint"),
    )
    return df.withColumn(out_col, q), scale


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float | None = None,
) -> DataFrame:
    """Top-k by int8 integer dot product — the quantized scale path.

    Both sides are quantized on one shared grid (corpus max-|x| by
    default), then ranked by the exact INTEGER dot product of the int8
    codes: every score is a deterministic BIGINT, so results are
    hash-stable with no float rounding anywhere. Recall vs full
    precision is the standard int8 trade (ties broken by neighbor_id).

    Plan shape: corpus-side narrow map (quantize), broadcast of the
    quantized query side, codegen'd integer fold per pair, one final
    top-k window — identical to :func:`brute_force_topk` but moving 4×
    fewer bytes per vector through the scan and (at 100 TB) letting the
    candidate join run on arrays a SIMD-friendly 8-bit wide.

    Output: (query_id, neighbor_id, dot_q long, rank int).
    """
    c0 = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("v"))
    q0 = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("v"))
    c, scale = quantize_embeddings(c0, "v", scale, "cq")
    q, _ = quantize_embeddings(q0, "v", scale, "qq")
    dot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"),
                   lambda x, y: (x.cast("long") * y.cast("long"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = (
        c.select("neighbor_id", "cq")
        .crossJoin(F.broadcast(q.select("query_id", "qq")))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dot.alias("dot_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot_q").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _sketch(vec_col, planes) -> "F.Column":
    sketch = None
    for i, row in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(F.zip_with(vec_col, plane, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        bit = F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sketch = term if sketch is None else sketch.bitwiseOR(term)
    return sketch


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    probe_radius: int = 1,
    seed: int = 7,
    probe_all: bool = False,
) -> DataFrame:
    """Approximate top-k: bucket corpus by hyperplane sign sketch; probe
    each query's bucket plus all buckets within Hamming distance
    ``probe_radius`` (bit-flip expansion of the query sketch); exact
    cosine re-rank within candidates.

    The query side is broadcast (after the probe explode it is
    |queries| × (1 + n_probes) rows) — intended for query ≪ corpus;
    the corpus side only ever flows through one equi-join on bucket."""
    import numpy as np

    first = corpus.select(vec_col).first()
    if first is None:
        nid_t = corpus.schema[id_col].dataType.simpleString()
        return _empty_topk(corpus.sparkSession, nid_t, nid_t)
    dim = len(first[0])
    planes = np.random.RandomState(seed).randn(n_planes, dim)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cvec"))
    c = c.withColumn("bucket", _sketch(F.col("cvec"), planes))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    q = q.withColumn("qbucket", _sketch(F.col("qvec"), planes))
    if probe_all:
        # probe EVERY bucket — provably identical to brute force (each
        # corpus row lives in exactly one bucket and every bucket is
        # probed). The correctness anchor the driver oracle checks, in
        # the style of embedding_ivf_full.
        q = q.withColumn(
            "bucket",
            F.explode(F.sequence(F.lit(0).cast("long"),
                                 F.lit((1 << n_planes) - 1).cast("long"))))
    else:
        # multi-probe: bucket ± single-bit flips
        probes = [F.col("qbucket")]
        if probe_radius >= 1:
            probes += [F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        q = q.withColumn("bucket", F.explode(F.array(*probes)))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine_sim(F.col("qvec"), F.col("cvec")).alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def mean_pool(df: DataFrame, group_col: str, vec_col: str = "embedding",
              out_col: str = "pooled") -> DataFrame:
    """Element-wise mean of embeddings per group — turn-level vectors
    pooled into a conversation/document vector (the standard cheap
    aggregate representation).

    Scale shape: posexplode → groupBy (group, pos) avg → re-assemble by
    sorted position. Each dimension aggregates independently with full
    map-side partial aggregation — no per-group array state, no
    single-task stage, works for any group size. (A fold over
    collect_list would hold every member vector per group in one task —
    the monster-conversation trap.)"""
    exploded = df.select(
        F.col(group_col).alias("g"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"))
    return (exploded.groupBy("g", "pos").agg(F.avg("x").alias("m"),
                                             F.count("*").alias("n"))
            .groupBy("g")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"),
                 (F.max("n")).alias("n_vecs"))
            .select(F.col("g").alias(group_col),
                    F.col("ms.m").alias(out_col),
                    F.col("n_vecs")))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-index ANN scale path
# ---------------------------------------------------------------------------

def pq_formula_codebooks(m: int, n_codes: int, dsub: int) -> list:
    """Deterministic INTEGER codebooks from a closed-form formula —
    ``c[s][j][t] = (31j + 17t + 13s) mod 23 − 11``. Every entry is an
    exactly-representable small integer, so a SQL oracle can regenerate
    the codebook inline (no literals shipped) and the whole
    encode+score pipeline is bit-reproducible. Test/demo codebooks;
    production uses :func:`pq_train`."""
    return [[[float((31 * j + 17 * t + 13 * s) % 23 - 11)
              for t in range(dsub)]
             for j in range(n_codes)]
            for s in range(m)]


def _pq_dim(corpus: DataFrame, vec_col: str, m: int) -> int:
    row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        return 0
    d = int(row["d"])
    if d % m != 0:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    return d


def _kmeanspp_lloyd(X, k: int, seed: int, iters: int = 10):
    """Local deterministic k-means: k-means++ init (seeded rng) +
    Lloyd. Returns (k, dim) centroids; empty clusters keep their
    previous centroid."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = len(X)
    cents = [X[int(rng.integers(n))]]
    d2 = ((X - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = d2.sum()
        if tot <= 0:  # fewer distinct points than codes: duplicate
            cents.append(cents[-1])
            continue
        idx = int(rng.choice(n, p=d2 / tot))
        cents.append(X[idx])
        d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(axis=1))
    C = np.stack(cents)
    for _ in range(iters):
        dist = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = dist.argmin(axis=1)
        for j in range(k):
            mask = a == j
            if mask.any():
                C[j] = X[mask].mean(axis=0)
    return C


def pq_train(corpus: DataFrame, vec_col: str = "embedding",
             m: int = 4, n_codes: int = 16, seed: int = 7,
             refine_iters: int = 2, max_train_rows: int = 100_000,
             local_iters: int = 10) -> list:
    """Train PQ codebooks the way production vector indexes do
    (faiss's recipe): per-subspace k-means fitted LOCALLY on a
    bounded, deterministic hash-ordered sample (``max_train_rows`` —
    codebooks need a representative sample, never the full corpus),
    k-means++ init so codes spread across clusters instead of
    duplicating inside one, then ``refine_iters`` DISTRIBUTED Lloyd
    steps over the entire corpus — assignment is one BLAS argmin per
    Arrow batch (``mapInPandas``), and the centroid update is
    posexplode → ``groupBy(sub, code, t).avg``, a pure
    shuffle-aggregate whose result is the m·n_codes·dsub-float
    codebook (driver-sized). All ``m`` subspaces update in ONE corpus
    pass per iteration; empty cells keep their previous centroid."""
    import numpy as np

    d = _pq_dim(corpus, vec_col, m)
    if d == 0:
        return []
    dsub = d // m
    c = corpus.select(F.col(vec_col).cast("array<double>").alias("cvec"))
    sample = (c.orderBy(F.xxhash64(F.col("cvec").cast("string"),
                                   F.lit(seed)))
               .limit(max_train_rows).collect())
    S = np.stack([np.array(r["cvec"]) for r in sample])
    books = [_kmeanspp_lloyd(S[:, s * dsub:(s + 1) * dsub], n_codes,
                             seed + s, local_iters)
             for s in range(m)]

    def assigner(books_l):
        bc = corpus.sparkSession.sparkContext.broadcast(
            [b.copy() for b in books_l])

        def assign(it):
            bs = bc.value
            for pdf in it:
                if not len(pdf):
                    continue
                V = np.stack(pdf["cvec"].to_numpy())
                codes = np.empty((len(V), m), dtype="int32")
                for s in range(m):
                    Vs = V[:, s * dsub:(s + 1) * dsub]
                    # ||x-c||^2 = ||x||^2 - 2x·c + ||c||^2; argmin over
                    # codes only needs the last two terms
                    dist = (-2.0 * Vs @ bs[s].T
                            + (bs[s] ** 2).sum(axis=1)[None, :])
                    codes[:, s] = np.argmin(dist, axis=1)
                out = pdf.copy()
                out["codes"] = list(codes)
                yield out
        return assign

    schema = "cvec array<double>, codes array<int>"
    for _ in range(refine_iters):
        assigned = c.mapInPandas(assigner(books), schema=schema)
        upd = (assigned
               .select("codes", F.posexplode("cvec").alias("pos", "x"))
               .select((F.col("pos") / dsub).cast("int").alias("s"),
                       F.pmod(F.col("pos"), F.lit(dsub)).alias("t"),
                       F.element_at(
                           "codes",
                           (F.col("pos") / dsub).cast("int") + 1).alias("j"),
                       "x")
               .groupBy("s", "j", "t").agg(F.avg("x").alias("mu"))
               .collect())
        for r in upd:
            books[r["s"]][r["j"], r["t"]] = r["mu"]
    return [b.tolist() for b in books]


def _pq_encode_exprs(vec_col: str, codebooks: list):
    """(codes array<int>, xsq double) expression pair for a vector
    column against literal codebooks: per subspace, dists to all codes
    are built as unrolled left-fold sums (t ascending) so a SQL oracle
    folding in the same order reproduces every double bit-for-bit;
    argmin takes the FIRST minimum (array_position semantics, matching
    list_position). xsq = Σ_s ||c_{s,code_s}||² rides along for the
    ADC denominator."""
    v = F.col(vec_col).cast("array<double>")
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    code_cols, sq_cols = [], []
    for s, book in enumerate(codebooks):
        dists = []
        for cj in book:
            acc = F.lit(0.0)
            for t, cv in enumerate(cj):
                diff = F.element_at(v, s * dsub + t + 1) - F.lit(float(cv))
                acc = acc + diff * diff
            dists.append(acc)
        darr = F.array(*dists)
        code = (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
        code_cols.append(code)
        sq_cols.append(F.element_at(
            F.array(*[F.lit(float(sum(x * x for x in cj))) for cj in book]),
            code + 1))
    codes = F.array(*code_cols)
    xsq = sq_cols[0]
    for c in sq_cols[1:]:
        xsq = xsq + c
    return codes, xsq


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    n_codes: int = 16,
    codebooks: list | None = None,
    seed: int = 7,
    refine_iters: int = 2,
    impl: str = "numpy",
) -> DataFrame:
    """Product-quantization top-k cosine search with asymmetric
    distance computation (ADC) — the compressed-index scale path: the
    corpus is stored as ``m`` sub-codes (m bytes/vector at n_codes ≤
    256 — 32× less than float64 at m=4, d=64) and NEVER reconstructed;
    each query carries an m×n_codes lookup table of partial dot
    products, and a candidate's score is ``Σ_s LUT[s][code_s] /
    (‖q‖·√Σ_s‖c_{s,code_s}‖²)`` — cosine against the reconstruction,
    computed with m array lookups per pair instead of d multiplies.

    ``impl="numpy"`` (default): BLAS batch encode via ``mapInPandas``
    + numpy LUTs — the production path (codebooks from
    :func:`pq_train` when not given). ``impl="jvm"`` (requires
    explicit ``codebooks``): encode AND LUTs as pure unrolled JVM
    expressions — zero Python egress, every double bit-reproducible by
    a SQL oracle folding in the same order (the driver-query mode).

    Plan shape: corpus-side narrow map (encode) → broadcast of the
    query LUT frame → codegen'd m-lookup fold per pair → one top-k
    window. Identical to :func:`brute_force_topk` but moving m ints
    per corpus row instead of d doubles — at 100 TB the index fits
    where the vectors never could. Approximate by construction
    (quantization error); tests anchor recall vs brute force and exact
    equality when the corpus lies on the codebook grid.
    """
    import numpy as np

    nid_t = corpus.schema[id_col].dataType.simpleString()
    d = _pq_dim(corpus, vec_col, m)
    if d == 0:
        return _empty_topk(corpus.sparkSession, nid_t, nid_t)
    dsub = d // m
    if codebooks is None:
        if impl == "jvm":
            raise ValueError("impl='jvm' needs explicit codebooks "
                             "(literal expressions)")
        codebooks = pq_train(corpus, vec_col, m, n_codes, seed,
                             refine_iters)
    n_codes = len(codebooks[0])

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cvec"))
    if impl == "jvm":
        codes_e, xsq_e = _pq_encode_exprs("cvec", codebooks)
        enc = c.select("neighbor_id", codes_e.alias("codes"),
                       xsq_e.alias("xsq"))
        qv = F.col("qvec")
        lut_rows = []
        for s, book in enumerate(codebooks):
            per_code = []
            for cj in book:
                acc = F.lit(0.0)
                for t, cv in enumerate(cj):
                    acc = acc + F.element_at(qv, s * dsub + t + 1) \
                        * F.lit(float(cv))
                per_code.append(acc)
            lut_rows.append(F.array(*per_code))
        qn = F.lit(0.0)
        for i in range(d):
            x = F.element_at(qv, i + 1)
            qn = qn + x * x
        q = (queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).cast("array<double>")
                            .alias("qvec"))
             .select("query_id", F.array(*lut_rows).alias("lut"),
                     F.sqrt(qn).alias("qnorm")))
    else:
        books = [np.asarray(b) for b in codebooks]
        bc = corpus.sparkSession.sparkContext.broadcast(
            [b.copy() for b in books])

        def encode(it):
            bs = bc.value
            for pdf in it:
                if not len(pdf):
                    continue
                V = np.stack(pdf["cvec"].to_numpy())
                codes = np.empty((len(V), m), dtype="int32")
                xsq = np.zeros(len(V))
                for s in range(m):
                    Vs = V[:, s * dsub:(s + 1) * dsub]
                    sq = (bs[s] ** 2).sum(axis=1)
                    dist = -2.0 * Vs @ bs[s].T + sq[None, :]
                    codes[:, s] = np.argmin(dist, axis=1)
                    xsq += sq[codes[:, s]]
                yield pdf[["neighbor_id"]].assign(
                    codes=list(codes), xsq=xsq)
        enc = c.mapInPandas(
            encode,
            schema=f"neighbor_id {nid_t}, codes array<int>, xsq double")

        qpdf = _query_pdf(queries, [
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qvec")])
        if not len(qpdf):
            return _empty_topk(corpus.sparkSession, nid_t, nid_t)
        Q = np.stack(qpdf["qvec"].to_numpy())
        luts = [Q[:, s * dsub:(s + 1) * dsub] @ books[s].T
                for s in range(m)]  # each (|Q|, n_codes)
        qpdf = qpdf.assign(
            lut=[[luts[s][i].tolist() for s in range(m)]
                 for i in range(len(Q))],
            qnorm=np.linalg.norm(Q, axis=1)).drop(columns=["qvec"])
        q = corpus.sparkSession.createDataFrame(
            qpdf, schema=f"query_id {nid_t}, "
                         "lut array<array<double>>, qnorm double")

    dot = F.aggregate(
        F.zip_with(F.col("codes"), F.col("lut"),
                   lambda cd, row: F.element_at(row, cd + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    score = F.when((F.col("xsq") > 0) & (F.col("qnorm") > 0),
                   dot / (F.col("qnorm") * F.sqrt(F.col("xsq")))) \
             .otherwise(F.lit(0.0))
    scored = (enc.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id", score.alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
