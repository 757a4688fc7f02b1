"""Johnson-Lindenstrauss random projection (decomposition.py).

Pins the deterministic sign matrix (balance, row decorrelation, exact
reproducibility), numpy-reference parity of the projection fold, and
the JL property itself: pairwise distances preserved within a modest
distortion band at k=16.
"""

import numpy as np
import pytest

from hipipe_spark.operators.decomposition import (
    jl_signs, random_projection,
)


def test_signs_deterministic_and_balanced():
    a = jl_signs(64, 16, 0)
    assert a == jl_signs(64, 16, 0)
    assert a != jl_signs(64, 16, 1)
    flat = [s for row in a for s in row]
    assert set(flat) == {-1, 1}
    assert abs(sum(flat)) < 0.1 * len(flat)  # near-balanced
    m = np.array(a)
    corr = m @ m.T / 64.0
    off = np.abs(corr[~np.eye(16, dtype=bool)])
    assert off.max() < 0.45  # rows decorrelated (lattice trap pinned)


def test_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(20, 16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(20)],
        "id long, vec array<float>")
    out = random_projection(df, "vec", dims=16, k=4, seed=0)
    got = {r["id"]: [r[f"rp{c}"] for c in range(4)]
           for r in out.collect()}
    S = np.array(jl_signs(16, 4, 0), dtype=np.float64)
    want = (X.astype(np.float64) @ S.T) / np.sqrt(4)
    for i in range(20):
        assert got[i] == pytest.approx(list(want[i]), abs=1e-9)


def test_jl_distance_preservation(spark):
    rng = np.random.RandomState(11)
    X = rng.randn(40, 64).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "id long, vec array<float>")
    out = random_projection(df, "vec", dims=64, k=16, seed=0)
    P = np.array([[r[f"rp{c}"] for c in range(16)]
                  for r in out.orderBy("id").collect()])
    ratios = []
    for i in range(0, 40, 3):
        for j in range(i + 1, 40, 7):
            d0 = np.linalg.norm(X[i].astype(np.float64) - X[j])
            d1 = np.linalg.norm(P[i] - P[j])
            ratios.append(d1 / d0)
    ratios = np.array(ratios)
    # E[ratio] = 1; k=16 gives generous but non-vacuous bounds
    assert 0.8 < ratios.mean() < 1.2
    assert ratios.min() > 0.4 and ratios.max() < 1.8


def test_round_and_guards(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, vec array<float>")
    out = random_projection(df, "vec", dims=2, k=1, round_to=2).collect()[0]
    assert out["rp0"] == round(out["rp0"], 2)
    with pytest.raises(ValueError):
        random_projection(df, "vec", dims=0, k=1)
    with pytest.raises(ValueError):
        random_projection(df, "vec", dims=2, k=0)
