"""Bradley-Terry MM ratings (evaluation.py bradley_terry)."""

import pytest

from hipipe_spark.operators.evaluation import bradley_terry


def _mm_reference(pairs, n_iter):
    """Same MM updates in plain python."""
    items = sorted({x for p in pairs for x in p})
    nij, wins = {}, {i: 0 for i in items}
    for w, l in pairs:
        a, b = min(w, l), max(w, l)
        nij[(a, b)] = nij.get((a, b), 0) + 1
        wins[w] += 1
    p = {i: 1.0 for i in items}
    for _ in range(n_iter):
        d = {i: 0.0 for i in items}
        for (a, b), n in nij.items():
            t = n / (p[a] + p[b])
            d[a] += t
            d[b] += t
        newp = {i: (wins[i] / d[i] if d[i] > 0 else 1.0) for i in items}
        m = sum(newp.values()) / len(items)
        p = {i: v / m for i, v in newp.items()}
    return p


def test_bradley_terry_matches_reference_mm(spark):
    pairs = ([("a", "b")] * 9 + [("b", "a")] * 1
             + [("b", "c")] * 9 + [("c", "b")] * 1
             + [("a", "c")] * 8 + [("c", "a")] * 2)
    df = spark.createDataFrame(pairs, "winner string, loser string")
    got = {r["item"]: r for r in bradley_terry(df, n_iter=15).collect()}
    ref = _mm_reference(pairs, 15)
    for item, exp in ref.items():
        assert abs(got[item]["rating"] - exp) < 1e-9, item
    assert got["a"]["rating"] > got["b"]["rating"] > got["c"]["rating"]
    assert got["a"]["n_wins"] == 17
    assert got["a"]["n_comparisons"] == 20


def test_bradley_terry_edges(spark):
    # an item that never wins trends to ~0; never-loses trends high
    pairs = [("top", "bottom")] * 5 + [("top", "mid")] * 3 + [("mid", "bottom")] * 3
    df = spark.createDataFrame(pairs, "winner string, loser string")
    got = {r["item"]: r["rating"] for r in
           bradley_terry(df, n_iter=25).collect()}
    assert got["top"] > got["mid"] > got["bottom"]
    assert got["bottom"] < 0.05
    with pytest.raises(ValueError):
        bradley_terry(df, n_iter=0)
