"""Reciprocal Rank Fusion and isotonic (PAV) calibration."""

import pytest

from hipipe_spark.operators.evaluation import isotonic_calibrate
from hipipe_spark.operators.retrieval import rrf_fuse


def test_rrf_fuse_known_values(spark):
    runs = [
        # query 1: bm25 ranks d1,d2,d3; ann ranks d2,d1
        ("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3),
        ("q1", "d2", 1), ("q1", "d1", 2),
    ]
    df = spark.createDataFrame(runs, "query_id string, doc_id string, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse(df, k=60).collect()}
    s_d1 = 1 / 61 + 1 / 62
    s_d2 = 1 / 62 + 1 / 61
    s_d3 = 1 / 63
    # d1 and d2 tie exactly (same rank multiset) -> doc_id tiebreak
    assert got["d1"]["fused_rank"] == 1 and got["d2"]["fused_rank"] == 2
    assert got["d3"]["fused_rank"] == 3
    assert abs(got["d1"]["rrf_score"] - round(s_d1, 6)) < 1e-12
    assert abs(got["d3"]["rrf_score"] - round(s_d3, 6)) < 1e-12
    assert got["d1"]["n_sources"] == 2 and got["d3"]["n_sources"] == 1
    assert got["d2"]["rrf_score"] == round(s_d2, 6)
    with pytest.raises(ValueError):
        rrf_fuse(df, k=0)


def test_rrf_top_n_and_query_isolation(spark):
    runs = ([("q1", f"d{i}", i) for i in range(1, 6)]
            + [("q2", "x", 1)])
    df = spark.createDataFrame(runs, "query_id string, doc_id string, rank int")
    got = rrf_fuse(df, top_n=2).collect()
    q1 = sorted(r["doc_id"] for r in got if r["query_id"] == "q1")
    assert q1 == ["d1", "d2"]
    assert [r["fused_rank"] for r in got if r["query_id"] == "q2"] == [1]


def _pav_reference(bins):
    """O(n^2) brute minimax: x_b = max_{i<=b} min_{j>=b} avg(i..j)."""
    out = []
    for b in range(len(bins)):
        best = -1.0
        for i in range(b + 1):
            worst = None
            for j in range(b, len(bins)):
                seg = bins[i:j + 1]
                a = sum(s for _, s in seg) / sum(n for n, _ in seg)
                worst = a if worst is None else min(worst, a)
            best = max(best, worst)
        out.append(best)
    return out


def test_isotonic_matches_minimax_and_is_monotone(spark):
    # frac_pos per bin deliberately non-monotone: PAV must pool
    rows = []
    spec = [(0.05, 40, 4), (0.15, 40, 20), (0.25, 40, 10),  # violation
            (0.35, 40, 18), (0.45, 40, 30), (0.55, 40, 26),  # violation
            (0.65, 40, 30), (0.75, 40, 36)]
    for p, n, pos in spec:
        rows += [(p, 1.0)] * pos + [(p, 0.0)] * (n - pos)
    df = spark.createDataFrame(rows, "prob double, label double")
    got = isotonic_calibrate(df, "prob", "label", n_bins=10).collect()
    got = sorted(got, key=lambda r: r["bin"])
    ref = _pav_reference([(n, float(pos)) for _, n, pos in spec])
    assert [r["bin"] for r in got] == [0, 1, 2, 3, 4, 5, 6, 7]
    for r, expect in zip(got, ref):
        assert abs(r["calibrated"] - expect) < 1e-9, r["bin"]
    cals = [r["calibrated"] for r in got]
    assert cals == sorted(cals)  # monotone
    # pooled groups preserve the weighted mean
    assert abs(sum(c * 40 for c in cals)
               - sum(pos for _, _, pos in spec)) < 1e-6


def test_isotonic_already_monotone_is_identity(spark):
    rows = []
    for p, pos in [(0.1, 1), (0.3, 3), (0.5, 5), (0.9, 9)]:
        rows += [(p, 1.0)] * pos + [(p, 0.0)] * (10 - pos)
    df = spark.createDataFrame(rows, "prob double, label double")
    got = sorted(isotonic_calibrate(df, "prob", "label", n_bins=10).collect(),
                 key=lambda r: r["bin"])
    assert [r["calibrated"] for r in got] == [0.1, 0.3, 0.5, 0.9]
    assert [r["frac_pos"] for r in got] == [0.1, 0.3, 0.5, 0.9]
