"""Iterative graph analytics over edge-list DataFrames: PageRank.

Training-data pipelines use link analysis to weight sources (domain
PageRank is a core quality signal in CommonCrawl-derived corpora) and
to rank entities in interaction graphs (user <-> tool bipartite click
graphs). The reference has no graph operators (SURVEY.md SS2.3 - this is
north-rule extension surface, like `dedup.connected_components` which
already covers the clustering side of graph work).

Scale shape (the whole point at 100 TB):

1. the edge list is normalized ONCE (one shuffle to compute per-source
   out-weight, one join) and then persisted pre-partitioned on ``src``
   - the per-iteration ``ranks |><| edges`` join re-shuffles only the
   RANKS side (node-sized, orders of magnitude smaller than the edge
   list; for web graphs |V| ~ 1e9 while |E| ~ 1e11);
2. each iteration is two node-sized shuffles (join back-partition +
   ``groupBy(dst)`` partial-agg combine) - no edge-sized shuffle ever
   repeats;
3. ``localCheckpoint`` after every iteration cuts the lineage: without
   it the plan doubles per iteration and the driver dies on plan
   compilation long before the executors break a sweat (the classic
   iterative-Spark failure mode);
4. dangling mass (nodes with no out-edges) is folded in via a 1-row
   aggregate cross-joined into the update - a broadcast of one double,
   never a driver round-trip inside the loop beyond the checkpoint
   action itself.

Semantics (standard damped PageRank, Brin & Page 1998):

    rank_{t+1}(v) = (1-d)/N + d * ( sum_{u->v} rank_t(u) * w(u,v)/outw(u)
                                    + dangling_mass_t / N )

with ``sum(rank) == 1`` preserved at every step (pytest-pinned).
Deterministic given the edge list - no randomness anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    n_iter: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """Damped PageRank over a directed (optionally weighted) edge list.

    Parameters
    ----------
    edges : DataFrame with columns ``src``, ``dst`` and optionally a
        positive ``weight`` (unweighted = every edge weight 1.0).
        Parallel edges are summed into one transition probability.
    round_to : if set, round the final rank (NOT intermediate ones) -
        for hash-stable cross-engine comparison.

    Returns ``(node, rank)`` - one row per distinct node on either edge
    end; ranks sum to 1.
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    # collapse parallel edges first: keeps the per-iteration join thin
    e = e.groupBy("src", "dst").agg(F.sum("w").alias("w"))

    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node")))
              .distinct())

    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    # transition probabilities, normalized once; partitioned on src so
    # every iteration's join reuses this layout and shuffles ranks only
    en = (e.join(outw, "src")
           .select("src", "dst", (F.col("w") / F.col("outw")).alias("p"))
           .repartition("src")
           .persist())
    srcs = en.select("src").distinct().persist()

    n_nodes = nodes.count()  # one dimension-sized job, outside the loop
    if n_nodes == 0:
        en.unpersist(); srcs.unpersist()
        return nodes.select("node", F.lit(0.0).alias("rank"))

    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)

    for _ in range(n_iter):
        contrib = (en.join(ranks, en.src == ranks.node)
                     .groupBy("dst")
                     .agg(F.sum(F.col("p") * F.col("rank")).alias("contrib")))
        dang = (ranks.join(srcs, ranks.node == srcs.src, "left_anti")
                     .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("mass")))
        ranks = (nodes.join(contrib, nodes.node == contrib.dst, "left")
                      .crossJoin(dang)  # 1-row broadcast of the dangling mass
                      .select(
                          "node",
                          (F.lit(base) + F.lit(damping) * (
                              F.coalesce(F.col("contrib"), F.lit(0.0))
                              + F.col("mass") / F.lit(float(n_nodes))
                          )).alias("rank")))
        # cut lineage: O(1) plan size per iteration instead of O(2^t)
        ranks = ranks.localCheckpoint(eager=True)

    en.unpersist()
    srcs.unpersist()
    if round_to is not None:
        ranks = ranks.select("node", F.round("rank", round_to).alias("rank"))
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    damping: float = 0.85,
    n_iter: int = 10,
    round_to: int = 6,
) -> str:
    """ANSI-SQL (DuckDB-runnable) replica of :func:`pagerank`: the
    iteration is UNROLLED into ``n_iter`` chained CTEs (recursive CTEs
    cannot aggregate over the working table in most dialects). Each
    ``r{{t}}`` is referenced twice by step t+1, so every iteration CTE
    is MATERIALIZED — inlining would expand the plan 2^n_iter-fold.
    ``edges_sql`` must yield columns ``src, dst, w``."""
    pre = f"""
      WITH e0 AS ({edges_sql}),
      e AS MATERIALIZED (SELECT src, dst, SUM(w) AS w FROM e0 GROUP BY src, dst),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
      ow AS (SELECT src, SUM(w) AS outw FROM e GROUP BY src),
      en AS MATERIALIZED (SELECT e.src, e.dst, e.w / ow.outw AS p
             FROM e JOIN ow ON ow.src = e.src),
      r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for t in range(1, n_iter + 1):
        prev = f"r{t-1}"
        steps.append(f"""
      , d{t} AS (SELECT COALESCE(SUM(r.rank), 0) AS mass FROM {prev} r
                 WHERE r.node NOT IN (SELECT DISTINCT src FROM en))
      , r{t} AS MATERIALIZED (
          SELECT n.node,
                 (1 - {damping}) / (SELECT n FROM nn)
                 + {damping} * (COALESCE(c.contrib, 0)
                                + (SELECT mass FROM d{t}) / (SELECT n FROM nn))
                 AS rank
          FROM nodes n
          LEFT JOIN (SELECT en.dst AS node, SUM(en.p * r.rank) AS contrib
                     FROM en JOIN {prev} r ON r.node = en.src
                     GROUP BY en.dst) c ON c.node = n.node)""")
    return (pre + "".join(steps)
            + f"\n      SELECT node, ROUND(rank, {round_to}) AS rank"
              f" FROM r{n_iter}")


def label_propagation(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    n_iter: int = 5,
) -> DataFrame:
    """Semi-supervised label propagation over an undirected graph —
    the training-data use case: a small set of human-labeled documents
    transfers its labels (quality tier, topic, toxicity) through the
    near-duplicate graph (dedup.py pair outputs) to every connected
    neighbor, majority-vote per round.

    Semantics (deterministic): seeds keep their label forever
    (clamped). Each round, every unlabeled node adopts the most
    frequent label among its labeled neighbors; ties break to the
    SMALLEST label value (stable across engines and partitionings).
    After ``n_iter`` rounds, returns ``(node, label, seeded)`` for all
    nodes that acquired a label (unreached nodes are absent).

    Scale shape: edges symmetrize once and persist pre-partitioned on
    ``src``; each round is one join of the (node-sized) current label
    table against the edge list + one (node, label) aggregate + one
    argmax window — the same two-node-sized-shuffles-per-round shape
    as :func:`pagerank`, lineage cut per round via localCheckpoint.
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    und = und.distinct().repartition("s").persist()

    seeds = (labels.select(F.col(node_col).alias("node"),
                           F.col(label_col).alias("label"))
             .dropDuplicates(["node"])
             .withColumn("seeded", F.lit(True)))
    cur = seeds.localCheckpoint(eager=True)

    for _ in range(n_iter):
        votes = (und.join(cur, und.s == cur.node)
                 .groupBy(F.col("d").alias("cand"), "label")
                 .agg(F.count(F.lit(1)).alias("n")))
        w = Window.partitionBy("cand").orderBy(
            F.col("n").desc(), F.col("label").asc())
        adopted = (votes.withColumn("rk", F.row_number().over(w))
                   .filter(F.col("rk") == 1)
                   .select(F.col("cand").alias("node"), "label",
                           F.lit(False).alias("seeded")))
        # clamp: seeds + previously adopted win over this round's votes
        cur = (cur.unionByName(
                   adopted.join(cur.select("node"), "node", "left_anti"))
               .localCheckpoint(eager=True))

    und.unpersist()
    return cur


def label_propagation_oracle_sql(
    edges_sql: str,
    seeds_values: list[tuple[str, str]],
    n_iter: int = 5,
) -> str:
    """DuckDB replica of :func:`label_propagation`: rounds unrolled
    into MATERIALIZED CTEs (each l{t} is read by both the votes and
    the anti-join of round t+1). ``edges_sql`` must yield (src, dst);
    ``seeds_values`` are (node, label) literals."""
    seeds = ", ".join(f"('{n}', '{l}', TRUE)" for n, l in seeds_values)
    pre = f"""
      WITH e0 AS ({edges_sql}),
      und AS MATERIALIZED (
        SELECT DISTINCT s, d FROM (
          SELECT src AS s, dst AS d FROM e0
          UNION ALL SELECT dst AS s, src AS d FROM e0)),
      l0 AS MATERIALIZED (
        SELECT * FROM (VALUES {seeds}) t(node, label, seeded))"""
    steps = []
    for t in range(1, n_iter + 1):
        prev = f"l{t-1}"
        steps.append(f"""
      , v{t} AS (SELECT u.d AS cand, l.label, count(*) AS n
                 FROM und u JOIN {prev} l ON l.node = u.s
                 GROUP BY u.d, l.label)
      , a{t} AS (SELECT cand AS node, label FROM (
                   SELECT cand, label,
                          row_number() OVER (PARTITION BY cand
                            ORDER BY n DESC, label ASC) AS rk
                   FROM v{t}) WHERE rk = 1)
      , l{t} AS MATERIALIZED (
          SELECT node, label, seeded FROM {prev}
          UNION ALL
          SELECT a.node, a.label, FALSE FROM a{t} a
          WHERE a.node NOT IN (SELECT node FROM {prev}))""")
    return (pre + "".join(steps)
            + f"\n      SELECT node, label, seeded FROM l{n_iter}")


def triangle_stats(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Global triangle census of an undirected graph: node/edge
    counts, wedge (2-path) count, triangle count, and the global
    clustering coefficient ``3·triangles / wedges``.

    The compact-forward orientation trick: edges are canonicalized to
    ``a < b`` and triangles enumerated as ``a < b < c`` via two
    equi-joins — each triangle is generated exactly once and the
    quadratic wedge explosion is halved. At 100 TB the join keys are
    node ids (hash-shuffled, AQE-skew-splittable); degree-based
    orientation (low→high degree) is the standard next step for
    power-law graphs and slots into the same plan by re-keying the
    canonical order.

    Output: one row — ``n_nodes, n_edges, n_wedges, n_triangles
    (bigints), global_cc (double, rounded 6; null when wedge-free)``.
    """
    a, b = F.col(src), F.col(dst)
    e = (edges.where(a != b)
         .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
         .distinct())
    deg = (e.select(F.explode(F.array("a", "b")).alias("node"))
           .groupBy("node").agg(F.count("*").alias("deg")))
    base = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum(F.col("deg")) / 2).cast("bigint").alias("n_edges"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint")
         .alias("n_wedges"))
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (e1.join(e2, "y")            # paths x < y < z
           .join(e3, ["x", "z"])       # close the triangle
           .agg(F.count("*").alias("n_triangles")))
    out = base.crossJoin(tri)
    cc = F.when(F.col("n_wedges") > 0,
                F.round(3.0 * F.col("n_triangles")
                        / F.col("n_wedges"), 6))
    return out.select("n_nodes", "n_edges", "n_wedges",
                      F.col("n_triangles").cast("bigint")
                       .alias("n_triangles"),
                      cc.alias("global_cc"))


def textrank_keywords(df: DataFrame, id_col: str, text_col: str,
                      window: int = 2, n_iter: int = 6,
                      top_k: int = 20) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): corpus
    keywords = PageRank over the word co-occurrence graph (an edge
    per ordered pair of words within ``window`` token positions,
    weight = corpus-wide co-occurrence count), top-``top_k`` by rank.

    Distributed shape: tokenize → posexplode → one bounded self-join
    per document (fan-out ≤ window per token — linear in corpus
    size, never quadratic), then :func:`pagerank` on the VOCABULARY
    graph — node count is vocabulary-sized, so the iteration state is
    dimension-sized no matter how large the corpus. Both directions
    are emitted (undirected co-occurrence).

    Output: ``node (the word), rank (double, rounded 6)``, top_k rows
    ordered by rank desc then word.
    """
    from hipipe_spark.functions.text import tokens as _tokens
    pos = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(_tokens(F.lower(F.col(text_col))))
         .alias("__p", "__w"))
    a, b = pos.alias("a"), pos.alias("b")
    pairs = (a.join(b, (F.col("a.__id") == F.col("b.__id"))
                    & (F.col("b.__p") > F.col("a.__p"))
                    & (F.col("b.__p") <= F.col("a.__p") + window))
             .select(F.col("a.__w").alias("src"),
                     F.col("b.__w").alias("dst")))
    edges = pairs.unionAll(pairs.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
    ranked = pagerank(edges, n_iter=n_iter, round_to=6)
    return (ranked.orderBy(F.col("rank").desc(), F.col("node").asc())
            .limit(top_k))


def node_clustering(edges: DataFrame, src: str = "src",
                    dst: str = "dst", top_k: int = 20) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient
    ``2·Δ(v) / (deg(v)·(deg(v)−1))`` — the top-``top_k`` most
    triangle-dense nodes (ties broken by node id). The node-level
    twin of :func:`triangle_stats`: same canonical a<b<c enumeration,
    then each triangle credits its three corners via one explode —
    no per-node re-enumeration.

    Output: ``node, deg (bigint), triangles (bigint), local_cc
    (double rounded 6; null when deg < 2)``, top_k rows ordered by
    triangles desc, node asc.
    """
    a, b = F.col(src), F.col(dst)
    e = (edges.where(a != b)
         .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
         .distinct())
    deg = (e.select(F.explode(F.array("a", "b")).alias("node"))
           .groupBy("node").agg(F.count("*").alias("deg")))
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (e1.join(e2, "y").join(e3, ["x", "z"])
           .select(F.explode(F.array("x", "y", "z")).alias("node"))
           .groupBy("node").agg(F.count("*").alias("triangles")))
    j = deg.join(tri, "node", "left").select(
        "node",
        F.col("deg").cast("bigint").alias("deg"),
        F.coalesce(F.col("triangles"), F.lit(0)).cast("bigint")
         .alias("triangles"))
    cc = F.when(F.col("deg") >= 2,
                F.round(2.0 * F.col("triangles")
                        / (F.col("deg") * (F.col("deg") - 1)), 6))
    return (j.withColumn("local_cc", cc)
            .orderBy(F.col("triangles").desc(), F.col("node").asc())
            .limit(top_k))


def bipartite_project(df: DataFrame, left: str, right: str,
                      min_weight: int = 1,
                      max_right_degree: int | None = None) -> DataFrame:
    """Project a bipartite relation onto its LEFT side: an edge
    between two left-nodes per shared right-node, weight = number of
    shared rights. The universal co-occurrence graph builder (parts
    sharing orders, users sharing tools, docs sharing shingles) that
    `triangles` / `node_clustering` / `pagerank` consume.

    The scale hazard is the hub right-node: a right shared by d
    lefts emits C(d,2) pairs — quadratic in d. ``max_right_degree``
    drops hub rights BEFORE the self-join (the same guard as
    ngram_jaccard's max_df): at 100 TB this bound is what keeps the
    projection linear-ish; the dropped hubs are exactly the
    uninformative ones (a right shared by everyone distinguishes
    nothing).

    Output: ``src, dst (src < dst), weight (bigint)`` with
    ``weight >= min_weight``.
    """
    pairs_in = (df.select(F.col(left).alias("l"),
                          F.col(right).alias("r"))
                .where(F.col("l").isNotNull() & F.col("r").isNotNull())
                .distinct())
    if max_right_degree is not None:
        deg = (pairs_in.groupBy("r")
               .agg(F.count("*").alias("__d"))
               .where(F.col("__d") <= max_right_degree)
               .select("r"))
        pairs_in = pairs_in.join(deg, "r")
    a, b = pairs_in.alias("a"), pairs_in.alias("b")
    edges = (a.join(b, (F.col("a.r") == F.col("b.r"))
                    & (F.col("a.l") < F.col("b.l")))
             .groupBy(F.col("a.l").alias("src"),
                      F.col("b.l").alias("dst"))
             .agg(F.count("*").alias("weight")))
    return (edges.where(F.col("weight") >= min_weight)
            .select("src", "dst",
                    F.col("weight").cast("bigint").alias("weight")))


def degree_powerlaw(edges: DataFrame, src: str = "src",
                    dst: str = "dst", k_min: int = 2) -> DataFrame:
    """Degree-distribution diagnosis: the continuous-MLE power-law
    exponent ``α = 1 + n / Σ ln(k / (k_min − ½))`` (Clauset–Shalizi–
    Newman 2009, discrete approximation) over nodes with degree ≥
    ``k_min``, plus max/mean degree — the number that decides HOW
    skewed a graph is before you pick salting factors or the
    degree-ordered triangle orientation.

    One degree aggregate + one fold over the node-dimension frame.
    Output: one row — ``n_nodes, n_tail (bigints, tail = deg ≥
    k_min), mean_deg, max_deg, alpha (doubles rounded 6; alpha null
    when the tail is empty)``.
    """
    a, b = F.col(src), F.col(dst)
    e = (edges.where(a != b)
         .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
         .distinct())
    deg = (e.select(F.explode(F.array("a", "b")).alias("node"))
           .groupBy("node").agg(F.count("*").alias("deg")))
    km = float(k_min) - 0.5
    tail = F.when(F.col("deg") >= k_min,
                  F.log(F.col("deg") / F.lit(km)))
    agg = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.when(F.col("deg") >= k_min, 1).otherwise(0))
         .alias("n_tail"),
        F.avg("deg").alias("mean_deg"),
        F.max("deg").alias("max_deg"),
        F.sum(tail).alias("lsum"))
    alpha = F.when((F.col("n_tail") > 0) & (F.col("lsum") > 0),
                   1.0 + F.col("n_tail") / F.col("lsum"))
    return agg.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_tail").cast("bigint").alias("n_tail"),
        F.round(F.col("mean_deg"), 6).alias("mean_deg"),
        F.col("max_deg").cast("double").alias("max_deg"),
        F.round(alpha, 6).alias("alpha"))


def assortativity(edges: DataFrame, src: str = "src",
                  dst: str = "dst") -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over UNDIRECTED edges (each edge contributes both
    orientations, the standard symmetrization) — positive = hubs link
    hubs (social), negative = hubs link leaves (infrastructure). The
    sign decides whether hub-salting or leaf-side broadcast wins.

    One degree aggregate, two broadcast joins of the node-dimension
    degree table onto the edges, one sufficient-statistics fold.
    Output: one row — ``n_edges (bigint), r (double rounded 6; null
    for degenerate variance)``.
    """
    a, b = F.col(src), F.col(dst)
    e = (edges.where(a != b)
         .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
         .distinct())
    deg = (e.select(F.explode(F.array("a", "b")).alias("node"))
           .groupBy("node").agg(F.count("*").alias("deg")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dx"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("dy"))
    both = (e.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
            .select(F.col("dx").cast("double"),
                    F.col("dy").cast("double")))
    # symmetrize: every edge in both orientations
    sym = both.unionAll(both.select(F.col("dy").alias("dx"),
                                    F.col("dx").alias("dy")))
    agg = sym.agg(F.count("*").alias("m"),
                  F.sum("dx").alias("sx"), F.sum("dy").alias("sy"),
                  F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
                  F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
                  F.sum(F.col("dy") * F.col("dy")).alias("syy"))
    m = F.col("m").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / m
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / m
    vy = F.col("syy") - F.col("sy") * F.col("sy") / m
    r = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return agg.select(
        (F.col("m") / 2).cast("bigint").alias("n_edges"),
        F.round(r, 6).alias("r"))


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 8,
    round_to: int | None = None,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed edge
    list — PageRank's bipartite dual: a node is a good AUTHORITY when
    good hubs point at it, a good HUB when it points at good
    authorities. On a user-journey transition graph the two scores
    separate "states journeys funnel INTO" from "states that route
    traffic onward" — one number (PageRank) can't make that
    distinction. Parallel edges are collapsed (classic unweighted
    HITS).

    Per iteration: ``auth ← Eᵀ·hub`` then ``hub ← E·auth``, each
    L2-normalized. The norm is a rounded handoff (12 dp) so the two
    engines' different summation orders cannot compound across
    iterations — the same design rule as CUPED's θ
    (operators/stats.py module docstring).

    Scale shape: the deduped edge list is persisted once partitioned
    by the join side; each iteration is two node-keyed equi-join +
    aggregate passes plus a 1-row norm broadcast (crossJoin of a
    single-row aggregate, exactly pagerank's dangling-mass shape);
    lineage is cut per iteration with ``localCheckpoint`` so the plan
    stays O(1) per round. Returns ``(node, hub, auth)`` for every
    node on either edge end.
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().persist())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    state = nodes.select("node", F.lit(1.0).alias("hub"),
                         F.lit(1.0).alias("auth"))
    state = state.localCheckpoint(eager=True)
    for _ in range(n_iter):
        a_raw = (e.join(state.select(F.col("node"), "hub"),
                        e.src == F.col("node"))
                 .groupBy("dst").agg(F.sum("hub").alias("a_raw")))
        a = (nodes.join(a_raw, nodes.node == a_raw.dst, "left")
             .select("node",
                     F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")))
        # checkpoint the raw-score frames: the norm aggregate AND the
        # normalized projection both read them, and the hub half reads
        # auth again — uncheckpointed, each reference re-evaluates the
        # whole join subtree and one iteration costs ~6 passes instead
        # of 2 (measured 26s -> 9s on the 8-iteration driver query)
        a = a.localCheckpoint(eager=True)
        na = a.agg(F.round(F.sqrt(F.sum(F.col("a_raw") * F.col("a_raw"))),
                           12).alias("na"))
        auth = (a.crossJoin(na)  # 1-row broadcast, pagerank's shape
                .select("node", F.when(F.col("na") > 0,
                                       F.col("a_raw") / F.col("na"))
                                 .otherwise(F.lit(0.0)).alias("auth")))
        h_raw = (e.join(auth.select(F.col("node"), "auth"),
                        e.dst == F.col("node"))
                 .groupBy("src").agg(F.sum("auth").alias("h_raw")))
        h = (nodes.join(h_raw, nodes.node == h_raw.src, "left")
             .select("node",
                     F.coalesce("h_raw", F.lit(0.0)).alias("h_raw")))
        h = h.localCheckpoint(eager=True)
        nh = h.agg(F.round(F.sqrt(F.sum(F.col("h_raw") * F.col("h_raw"))),
                           12).alias("nh"))
        hub = (h.crossJoin(nh)
               .select("node", F.when(F.col("nh") > 0,
                                      F.col("h_raw") / F.col("nh"))
                                .otherwise(F.lit(0.0)).alias("hub")))
        state = (hub.join(auth, "node")
                 .select("node", "hub", "auth"))
        state = state.localCheckpoint(eager=True)
    e.unpersist()
    if round_to is not None:
        state = state.select("node",
                             F.round("hub", round_to).alias("hub"),
                             F.round("auth", round_to).alias("auth"))
    return state


def hits_oracle_sql(
    edges_sql: str,
    n_iter: int = 8,
    round_to: int = 6,
) -> str:
    """DuckDB replica of :func:`hits` — iterations unrolled into
    chained MATERIALIZED CTEs (the :func:`pagerank_oracle_sql`
    technique), norms rounded to 12 dp exactly like the Spark side.
    ``edges_sql`` must yield columns ``src, dst``."""
    pre = f"""
      WITH e0 AS ({edges_sql}),
      e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      s0 AS MATERIALIZED (SELECT node, 1.0 AS hub, 1.0 AS auth FROM nodes)"""
    steps = []
    for t in range(1, n_iter + 1):
        prev = f"s{t-1}"
        steps.append(f"""
      , ar{t} AS MATERIALIZED (
          SELECT n.node, COALESCE(x.a_raw, 0) AS a_raw
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, SUM(p.hub) AS a_raw
            FROM e JOIN {prev} p ON p.node = e.src GROUP BY e.dst
          ) x ON x.node = n.node)
      , an{t} AS (SELECT ROUND(SQRT(SUM(a_raw * a_raw)), 12) AS na FROM ar{t})
      , a{t} AS MATERIALIZED (
          SELECT node, CASE WHEN (SELECT na FROM an{t}) > 0
                            THEN a_raw / (SELECT na FROM an{t})
                            ELSE 0.0 END AS auth FROM ar{t})
      , hr{t} AS MATERIALIZED (
          SELECT n.node, COALESCE(x.h_raw, 0) AS h_raw
          FROM nodes n LEFT JOIN (
            SELECT e.src AS node, SUM(a.auth) AS h_raw
            FROM e JOIN a{t} a ON a.node = e.dst GROUP BY e.src
          ) x ON x.node = n.node)
      , hn{t} AS (SELECT ROUND(SQRT(SUM(h_raw * h_raw)), 12) AS nh FROM hr{t})
      , s{t} AS MATERIALIZED (
          SELECT h.node,
                 CASE WHEN (SELECT nh FROM hn{t}) > 0
                      THEN h.h_raw / (SELECT nh FROM hn{t})
                      ELSE 0.0 END AS hub,
                 a.auth
          FROM hr{t} h JOIN a{t} a ON a.node = h.node)""")
    return (pre + "".join(steps)
            + f"\n      SELECT node, ROUND(hub, {round_to}) AS hub,"
              f" ROUND(auth, {round_to}) AS auth FROM s{n_iter}")


def link_features(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
    min_common: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Link-prediction features for non-adjacent node pairs sharing at
    least ``min_common`` neighbors: common-neighbor count,
    Adamic-Adar (Σ 1/ln deg(w) over shared neighbors w — the classic
    "rare shared friends matter more" weighting, Adamic & Adar 2003),
    resource allocation (Σ 1/deg(w), Zhou et al. 2009), and
    neighbor-set Jaccard. The standard feature block for "which nodes
    will connect next" / entity-resolution candidate scoring.

    Scale shape: the graph is canonicalized undirected (a<b, dedup);
    candidate pairs come from a WEDGE equi-join through the shared
    neighbor (:func:`triangle_stats`' shape — each unordered pair
    through each shared neighbor exactly once, never an all-pairs
    cross join); degrees attach by broadcast-join of the
    node-dimension degree table; already-adjacent pairs are removed
    with a left-anti join. ``max_degree`` (optional) drops hub
    neighbors BEFORE the wedge join — the same hub guard as
    :func:`bipartite_project`: a degree-d hub contributes O(d²) wedges
    and ~zero Adamic-Adar signal (1/ln d → 0), so capping bounds the
    join output at corpus scale; None = exact.

    Output: ``(node_a, node_b, common, adamic_adar, resource_alloc,
    jaccard)`` with ``node_a < node_b``, one row per qualifying pair.
    """
    a, b = F.col(src), F.col(dst)
    e = (edges.where(a != b)
         .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
         .distinct().persist())
    deg = (e.select(F.explode(F.array("a", "b")).alias("node"))
           .groupBy("node").agg(F.count("*").alias("deg")))
    # adjacency with both orientations: wedges pivot on the neighbor
    adj = (e.select(F.col("a").alias("w"), F.col("b").alias("n"))
           .union(e.select(F.col("b").alias("w"), F.col("a").alias("n"))))
    if max_degree is not None:
        keep = deg.where(F.col("deg") <= max_degree) \
                  .select(F.col("node").alias("w"))
        adj = adj.join(F.broadcast(keep), "w")
    l = adj.select("w", F.col("n").alias("na"))
    r = adj.select("w", F.col("n").alias("nb"))
    wedges = (l.join(r, "w")
              .where(F.col("na") < F.col("nb"))
              .join(deg.select(F.col("node").alias("w"),
                               F.col("deg").alias("wdeg")), "w"))
    pairs = (wedges.groupBy(F.col("na").alias("node_a"),
                            F.col("nb").alias("node_b"))
             .agg(F.count(F.lit(1)).alias("common"),
                  F.sum(F.when(F.col("wdeg") > 1,
                               1.0 / F.log(F.col("wdeg"))).otherwise(0.0))
                   .alias("aa"),
                  F.sum(1.0 / F.col("wdeg")).alias("ra"))
             .where(F.col("common") >= int(min_common)))
    # drop pairs that are already edges
    pairs = pairs.join(
        e.select(F.col("a").alias("node_a"), F.col("b").alias("node_b")),
        ["node_a", "node_b"], "left_anti")
    da = deg.select(F.col("node").alias("node_a"),
                    F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("node_b"),
                    F.col("deg").alias("deg_b"))
    out = (pairs.join(F.broadcast(da), "node_a")
           .join(F.broadcast(db), "node_b")
           .select("node_a", "node_b", "common",
                   F.round("aa", round_to).alias("adamic_adar"),
                   F.round("ra", round_to).alias("resource_alloc"),
                   F.round(F.col("common")
                           / (F.col("deg_a") + F.col("deg_b")
                              - F.col("common")), round_to)
                    .alias("jaccard")))
    from hipipe_spark.operators.core import register_cached
    return register_cached(out, e)


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    n_rounds: int = 8,
) -> DataFrame:
    """k-core membership by iterative peeling (Seidman 1983; the
    Batagelj-Zaversnik distributed variant): repeatedly delete nodes
    with degree < k until none remain — the surviving subgraph is the
    k-core, the standard "dense interaction kernel" extractor (spam
    rings, power-user communities, rigid near-dup cliques that
    connected components over-merge).

    ``n_rounds`` bounds the peel (each round is one degree aggregate +
    two semi-joins + a ``localCheckpoint`` lineage cut). Peeling
    converges when a round removes nothing; the output's
    ``converged`` flag reports whether THIS run got there — a
    truncated run is disclosed in-band, not silently wrong. Real
    graphs converge in few rounds (each round removes a full shell);
    pytest pins round-(R) == round-(R+1) on the driver fixture.

    Scale shape: the canonical edge set is persisted once; every round
    touches only node-keyed aggregates and semi-joins (edge set
    monotonically shrinks — checkpointed per round so the plan stays
    O(1)). Output: ``(node, in_core, core_deg, converged)`` for every
    node of the input graph; ``core_deg`` is the node's degree inside
    the final surviving subgraph (0 when peeled).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    a, b = F.col(src), F.col(dst)
    e0 = (edges.where(a != b)
          .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
          .distinct().persist())
    all_nodes = (e0.select(F.col("a").alias("node"))
                 .union(e0.select(F.col("b").alias("node")))
                 .distinct().persist())
    e = e0
    prev_n = None
    converged = False
    for _ in range(n_rounds):
        deg = (e.select(F.explode(F.array("a", "b")).alias("node"))
               .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
        survivors = deg.where(F.col("deg") >= k).select("node")
        survivors = survivors.localCheckpoint(eager=True)
        n_now = survivors.count()
        if prev_n is not None and n_now == prev_n:
            converged = True
            break
        prev_n = n_now
        e = (e.join(survivors.withColumnRenamed("node", "a"), "a",
                    "left_semi")
             .join(survivors.withColumnRenamed("node", "b"), "b",
                   "left_semi"))
        e = e.localCheckpoint(eager=True)
        if n_now == 0:
            converged = True
            break
    final_deg = (e.select(F.explode(F.array("a", "b")).alias("node"))
                 .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
                 .where(F.col("deg") >= k))
    out = (all_nodes.join(final_deg, "node", "left")
           .select("node",
                   F.col("deg").isNotNull().alias("in_core"),
                   F.coalesce("deg", F.lit(0)).cast("bigint")
                    .alias("core_deg"),
                   F.lit(converged).alias("converged")))
    from hipipe_spark.operators.core import register_cached
    return register_cached(out, e0, all_nodes)


def k_core_oracle_sql(
    edges_sql: str,
    k: int,
    n_rounds: int = 8,
) -> str:
    """DuckDB replica of :func:`k_core` — the peel unrolled into
    ``n_rounds`` chained MATERIALIZED CTEs. The Spark side may stop
    early on convergence; since peeling is monotone, extra rounds are
    no-ops, so a fixed-round oracle matches any converged run (the
    ``converged`` output column is reproduced as a constant TRUE and
    only comparable when the Spark run converged — the driver fixture
    pins that). ``edges_sql`` must yield ``src, dst``."""
    pre = f"""
      WITH eraw AS ({edges_sql}),
      e0 AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM eraw WHERE src != dst),
      nodes AS MATERIALIZED (
        SELECT a AS node FROM e0 UNION SELECT b FROM e0)"""
    steps = []
    for t in range(1, n_rounds + 1):
        prev = f"e{t-1}"
        steps.append(f"""
      , s{t} AS MATERIALIZED (
          SELECT node FROM (
            SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
          GROUP BY node HAVING COUNT(*) >= {k})
      , e{t} AS MATERIALIZED (
          SELECT e.a, e.b FROM {prev} e
          JOIN s{t} sa ON sa.node = e.a
          JOIN s{t} sb ON sb.node = e.b)""")
    return (pre + "".join(steps) + f"""
      , fd AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                 SELECT a AS node FROM e{n_rounds}
                 UNION ALL SELECT b FROM e{n_rounds})
               GROUP BY node HAVING COUNT(*) >= {k})
      SELECT n.node, fd.node IS NOT NULL AS in_core,
             COALESCE(fd.deg, 0) AS core_deg, TRUE AS converged
      FROM nodes n LEFT JOIN fd ON fd.node = n.node""")


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    community_col: str = "community",
    round_to: int = 6,
) -> DataFrame:
    """Newman modularity of a partition over an undirected simple
    graph — the standard quality score for a community assignment
    (e.g. :func:`label_propagation` output over the near-duplicate
    graph, or any clustering of the co-occurrence projection):
    ``Q = Σ_c [ e_c/m − (d_c / 2m)² ]`` with e_c = intra-community
    edges, d_c = community degree sum, m = total edges.

    Input edges are canonicalized (symmetrized, deduplicated,
    self-loops dropped); nodes missing from ``assign`` contribute
    their edges to m only (standard convention — the partition is
    scored as given). Returns one row per community:
    ``(community, n_nodes, internal_edges, degree_sum, q_contrib)``;
    the graph's Q is ``sum(q_contrib)`` — kept per-community so the
    caller sees WHICH communities carry the structure.

    Scale shape: one distinct over canonical edges, one degree
    aggregate, two node-keyed joins of the edge list against the
    (node-sized) assignment, then community-sized aggregates. No
    iteration, no window over facts.
    """
    from hipipe_spark.operators.core import register_cached

    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                      F.greatest(F.col(src), F.col(dst)).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct()
         .persist())
    m = e.count()
    if m == 0:
        raise ValueError("modularity: no edges after canonicalization")
    asg = (assign.select(F.col(node_col).alias("node"),
                         F.col(community_col).alias("c"))
           .dropDuplicates(["node"]))
    # degrees from the canonical edge list (each edge adds 1 to both)
    deg = (e.select(F.col("a").alias("node"))
           .union(e.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    ca = asg.select(F.col("node").alias("a"), F.col("c").alias("c_a"))
    cb = asg.select(F.col("node").alias("b"), F.col("c").alias("c_b"))
    intra = (e.join(ca, "a").join(cb, "b")
             .filter(F.col("c_a") == F.col("c_b"))
             .groupBy(F.col("c_a").alias("c"))
             .agg(F.count(F.lit(1)).alias("internal_edges")))
    comm = (asg.join(deg, "node", "left")
            .groupBy("c")
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.sum(F.coalesce(F.col("deg"), F.lit(0)))
                  .alias("degree_sum")))
    out = (comm.join(intra, "c", "left")
           .withColumn("internal_edges",
                       F.coalesce(F.col("internal_edges"), F.lit(0)))
           .withColumn(
               "q_contrib",
               F.round(F.col("internal_edges") / F.lit(float(m))
                       - F.pow(F.col("degree_sum")
                               / F.lit(2.0 * m), F.lit(2.0)),
                       round_to))
           .select(F.col("c").alias(community_col), "n_nodes",
                   "internal_edges", "degree_sum", "q_contrib"))
    return register_cached(out, e)
