"""triangle_stats on known graphs; hist_quantiles error bounds."""

import numpy as np

from hipipe_spark.operators.graph import triangle_stats
from hipipe_spark.operators.sketches import hist_quantiles


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def test_triangles_k4(spark):
    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    r = triangle_stats(_edges(spark, k4)).collect()[0]
    assert r.n_nodes == 4 and r.n_edges == 6
    assert r.n_triangles == 4          # C(4,3)
    assert r.n_wedges == 12            # 4 nodes × C(3,2)
    assert r.global_cc == 1.0


def test_triangles_path_graph_has_none(spark):
    path = [(i, i + 1) for i in range(10)]
    r = triangle_stats(_edges(spark, path)).collect()[0]
    assert r.n_triangles == 0
    assert r.global_cc == 0.0


def test_triangles_canonicalizes_duplicates_and_direction(spark):
    # triangle 1-2-3 given with reversed + duplicated + self edges
    messy = [(1, 2), (2, 1), (3, 2), (1, 3), (1, 3), (2, 2)]
    r = triangle_stats(_edges(spark, messy)).collect()[0]
    assert r.n_edges == 3 and r.n_triangles == 1
    assert r.n_nodes == 3


def test_hist_quantiles_error_bounded_by_bin_width(spark):
    rng = np.random.RandomState(5)
    vals = rng.gamma(2.0, 50.0, 4000)
    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "g: string, v: double")
    out = hist_quantiles(df, "g", "v", n_bins=128).collect()
    width = (vals.max() - vals.min()) / 128
    assert len(out) == 4
    for r in out:
        assert r.err <= width + 1e-6   # interpolation stays in-bin
    # median estimate sane
    med = [r for r in out if r.q == 0.5][0]
    assert abs(med.est - np.percentile(vals, 50)) < width + 1e-6


def test_hist_quantiles_exact_on_degenerate_group(spark):
    df = spark.createDataFrame([("c", 7.0)] * 20, "g: string, v: double")
    out = hist_quantiles(df, "g", "v", n_bins=16).collect()
    for r in out:
        assert r.est == 7.0 and r.exact == 7.0 and r.err == 0.0


def test_textrank_hub_word_ranks_first(spark):
    from hipipe_spark.operators.graph import textrank_keywords
    # "spark" co-occurs with everything; filler words are peripheral
    docs = [
        (1, "spark engine runs spark jobs on spark clusters"),
        (2, "the engine compiles plans for spark"),
        (3, "clusters schedule jobs and spark handles plans"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    out = textrank_keywords(df, "doc_id", "text", window=2,
                            n_iter=6, top_k=5).collect()
    assert out[0].node == "spark"
    assert len(out) == 5
    ranks = [r.rank for r in out]
    assert ranks == sorted(ranks, reverse=True)


def test_node_clustering_known_graph(spark):
    from hipipe_spark.operators.graph import node_clustering
    # K4 on {0,1,2,3} plus a pendant node 4 attached to 0
    edges = ([(i, j) for i in range(4) for j in range(4) if i < j]
             + [(0, 4)])
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = {r.node: r for r in node_clustering(df, top_k=10).collect()}
    # inside K4 every node is in C(3,2)=3 triangles
    for v in (1, 2, 3):
        assert out[v].triangles == 3 and out[v].local_cc == 1.0
    # node 0 has deg 4 but only the 3 K4 triangles: cc = 3/C(4,2)=0.5
    assert out[0].deg == 4 and out[0].triangles == 3
    assert out[0].local_cc == 0.5
    # the pendant has deg 1: cc undefined
    assert out[4].triangles == 0 and out[4].local_cc is None


def test_bipartite_project_weights_and_hub_guard(spark):
    from hipipe_spark.operators.graph import bipartite_project
    rows = ([(1, "o1"), (2, "o1"),           # pair (1,2) via o1
             (1, "o2"), (2, "o2"),           # and again via o2
             (3, "o3"), (4, "o3")]           # pair (3,4) once
            + [(i, "hub") for i in range(10, 20)])  # 10-way hub
    df = spark.createDataFrame(rows, "l: long, r: string")
    out = {(r.src, r.dst): r.weight for r in
           bipartite_project(df, "l", "r", min_weight=1,
                             max_right_degree=5).collect()}
    assert out[(1, 2)] == 2
    assert out[(3, 4)] == 1
    # the hub's C(10,2)=45 pairs are dropped before the join
    assert all(not (10 <= s < 20) for s, _ in out)
    # min_weight filter
    heavy = bipartite_project(df, "l", "r", min_weight=2,
                              max_right_degree=5).collect()
    assert [(r.src, r.dst) for r in heavy] == [(1, 2)]


def test_powerlaw_alpha_on_planted_distribution(spark):
    import numpy as np
    from hipipe_spark.operators.graph import degree_powerlaw
    # build a star-forest whose degree sequence follows k^-2.5:
    # hubs h with planned degree d_h each connect to fresh leaves
    rng = np.random.RandomState(17)
    edges, nxt = [], 10_000
    for h in range(300):
        d = int(np.floor((1 - rng.rand()) ** (-1 / 1.5)) + 1)  # α≈2.5
        d = min(d, 200)
        for _ in range(d):
            edges.append((h, nxt))
            nxt += 1
    df = spark.createDataFrame(edges, "src: long, dst: long")
    r = degree_powerlaw(df, k_min=2).collect()[0]
    assert r.alpha is not None
    assert 1.8 < r.alpha < 3.5          # recovers the heavy tail
    assert r.max_deg >= 10


def test_assortativity_signs(spark):
    from hipipe_spark.operators.graph import assortativity
    # star: hub links leaves only → strongly disassortative (r < 0)
    star = [(0, i) for i in range(1, 20)]
    # two cliques: within each, all degrees equal... add a path with
    # matched degrees instead: cycle → all degrees 2 → r undefined
    cyc = [(i, (i + 1) % 10) for i in range(10)]
    r_star = assortativity(
        spark.createDataFrame(star, "src: long, dst: long")).collect()[0]
    assert r_star.r is not None and r_star.r < -0.9
    r_cyc = assortativity(
        spark.createDataFrame(cyc, "src: long, dst: long")).collect()[0]
    assert r_cyc.r is None               # zero degree variance
    assert r_cyc.n_edges == 10
