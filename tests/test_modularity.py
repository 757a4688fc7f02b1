"""Newman modularity (graph.modularity).

Hand-computed partitions pin the Q formula, canonicalization
(symmetrize/dedupe/self-loop drop), unassigned-node convention, and
the known analytic cases (perfect split vs single community).
"""

import pytest

from hipipe_spark.operators.graph import modularity


def _run(spark, edges, assign, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    a = spark.createDataFrame(assign, "node long, community string")
    rows = modularity(e, a, **kw).collect()
    return {r["community"]: r for r in rows}


def test_two_cliques_perfect_split(spark):
    # two triangles, no cross edges: m=6, each community
    # e_c=3, d_c=6 -> q = 3/6 - (6/12)^2 = 0.25; Q = 0.5
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    assign = [(n, "A") for n in (1, 2, 3)] + [(n, "B") for n in (4, 5, 6)]
    got = _run(spark, edges, assign)
    for c in ("A", "B"):
        assert got[c]["internal_edges"] == 3
        assert got[c]["degree_sum"] == 6
        assert got[c]["n_nodes"] == 3
        assert got[c]["q_contrib"] == pytest.approx(0.25)


def test_single_community_is_zero(spark):
    # everything in one community -> Q = m/m - (2m/2m)^2 = 0 exactly
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    assign = [(n, "all") for n in (1, 2, 3, 4)]
    got = _run(spark, edges, assign)
    assert got["all"]["q_contrib"] == pytest.approx(0.0)
    assert got["all"]["internal_edges"] == 5
    assert got["all"]["degree_sum"] == 10


def test_canonicalization(spark):
    # duplicates, reversed duplicates, and self-loops collapse:
    # the effective graph is the single edge (1, 2)
    edges = [(1, 2), (2, 1), (1, 2), (3, 3)]
    assign = [(1, "A"), (2, "A"), (3, "B")]
    got = _run(spark, edges, assign)
    assert got["A"]["internal_edges"] == 1
    assert got["A"]["degree_sum"] == 2
    assert got["A"]["q_contrib"] == pytest.approx(0.0)  # 1/1 - 1^2
    # node 3 kept (n_nodes) but contributes no edges/degree
    assert got["B"]["n_nodes"] == 1
    assert got["B"]["degree_sum"] == 0
    assert got["B"]["internal_edges"] == 0
    assert got["B"]["q_contrib"] == pytest.approx(0.0)


def test_unassigned_nodes_count_toward_m_only(spark):
    # edge (1,2) intra-A; edge (2,9) reaches unassigned node 9:
    # m=2; A: e=1, d = deg(1)+deg(2) = 1+2 = 3
    # q_A = 1/2 - (3/4)^2 = -0.0625
    edges = [(1, 2), (2, 9)]
    assign = [(1, "A"), (2, "A")]
    got = _run(spark, edges, assign)
    assert set(got) == {"A"}
    assert got["A"]["q_contrib"] == pytest.approx(-0.0625)


def test_empty_graph_raises(spark):
    e = spark.createDataFrame([(1, 1)], "src long, dst long")
    a = spark.createDataFrame([(1, "A")], "node long, community string")
    with pytest.raises(ValueError):
        modularity(e, a)
