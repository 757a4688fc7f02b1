"""Hard-negative mining: label exclusion, semi-hard band, ranking."""

import math
import random

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.similarity import (
    brute_force_topk, hard_negative_mine)


@pytest.fixture(scope="module")
def labeled_vecs(spark):
    rng = random.Random(11)
    rows = []
    for i in range(80):
        base = [1.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0]
        v = [b + rng.uniform(-0.3, 0.3) for b in base]
        rows.append((i, v, i % 2))
    rows.append((100, [0.5, 0.5, 0.0], None))  # unlabeled corpus row
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int").cache()


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


def test_hard_negatives_exclude_own_label(labeled_vecs):
    q = labeled_vecs.filter(F.col("vec_id") < 4)
    out = hard_negative_mine(labeled_vecs, q, k=5).collect()
    lbl = {r.vec_id: r.label for r in labeled_vecs.collect()}
    assert len(out) == 4 * 5
    for r in out:
        assert lbl[r.neighbor_id] != lbl[r.query_id]
        assert r.neighbor_id != r.query_id


def test_hard_negatives_match_python_reference(labeled_vecs):
    rows = {r.vec_id: (list(r.embedding), r.label)
            for r in labeled_vecs.collect()}
    q = labeled_vecs.filter(F.col("vec_id") == 0)
    out = hard_negative_mine(labeled_vecs, q, k=3).orderBy("rank").collect()
    qv, ql = rows[0]
    expect = sorted(
        ((-_cos(qv, v), nid) for nid, (v, l) in rows.items()
         if nid != 0 and l != ql),
        )[:3]
    assert [r.neighbor_id for r in out] == [nid for _, nid in expect]
    for r, (negc, _) in zip(out, expect):
        assert abs(r.cosine - (-negc)) < 1e-9


def test_semi_hard_band(labeled_vecs):
    q = labeled_vecs.filter(F.col("vec_id") < 4)
    out = hard_negative_mine(labeled_vecs, q, k=50,
                             min_sim=0.2, max_sim=0.8).collect()
    assert out, "band should retain some negatives"
    for r in out:
        assert 0.2 <= r.cosine <= 0.8


def test_null_label_is_negative_for_labeled_query(labeled_vecs):
    q = labeled_vecs.filter(F.col("vec_id") == 0)
    out = hard_negative_mine(labeled_vecs, q, k=200).collect()
    assert any(r.neighbor_id == 100 for r in out)


def test_subset_of_unlabeled_topk(labeled_vecs):
    """Hard negatives are exactly the label-filtered prefix of the
    unconstrained ranking (same scoring, same tie-break)."""
    q = labeled_vecs.filter(F.col("vec_id") == 1)
    full = brute_force_topk(labeled_vecs, q, k=200)
    lbl = {r.vec_id: r.label for r in labeled_vecs.collect()}
    want = [r.neighbor_id for r in full.orderBy("rank").collect()
            if lbl[r.neighbor_id] != lbl[1]][:4]
    got = [r.neighbor_id for r in
           hard_negative_mine(labeled_vecs, q, k=4).orderBy("rank").collect()]
    assert got == want
