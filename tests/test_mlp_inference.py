"""Vendored numpy MLP through the real InferenceStage path."""

import numpy as np
import pytest

from hipipe_spark.operators.mlp import (
    FEATURE_COLS, mlp_predict, quality_weights, score_quality_mlp)


def test_weights_deterministic_and_dyadic():
    w1, b1, w2, b2 = quality_weights()
    assert quality_weights() == (w1, b1, w2, b2)
    for v in [x for row in w1 for x in row] + b1 + w2 + [b2]:
        # dyadic rationals: exactly representable (v * 8 is an integer)
        assert float(v * 8) == int(v * 8)


def test_forward_pass_reference():
    """Pinned-order numpy forward == independent plain-python forward."""
    w1, b1, w2, b2 = quality_weights()
    X = np.array([[3.0, 0.125, 0.25, 4.5], [0.0, 0.0, 0.0, 0.0]])
    got = mlp_predict((w1, b1, w2, b2), X)
    for r, x in enumerate(X):
        want = b2
        for h in range(len(b1)):
            z = sum(x[f] * w1[f][h] for f in range(len(x))) + b1[h]
            want += max(z, 0.0) * w2[h]
        assert got[r] == pytest.approx(want, abs=1e-12)


def test_score_quality_mlp_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "!!! ??? ###"),
         (3, "")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in score_quality_mlp(df).collect()}
    assert set(rows) == {1, 2, 3}
    # feature columns are internal — dropped from the output; raw text
    # is excluded from the Arrow passthrough by default (wide-column
    # discipline) and restorable with keep_text=True
    out_cols = score_quality_mlp(df).columns
    for c in FEATURE_COLS:
        assert c not in out_cols
    assert "text" not in out_cols
    assert "text" in score_quality_mlp(df, keep_text=True).columns
    # prose scores above pure-punctuation noise with these weights is
    # not guaranteed a priori; what IS pinned: deterministic replay
    again = {r["doc_id"]: r["mlp_score"]
             for r in score_quality_mlp(df).collect()}
    assert all(again[i] == rows[i]["mlp_score"] for i in rows)
    # empty text: all features 0 -> score = sum(relu(b1)*w2) + b2
    w1, b1, w2, b2 = quality_weights()
    want_empty = sum(max(b, 0.0) * w for b, w in zip(b1, w2)) + b2
    assert rows[3]["mlp_score"] == pytest.approx(want_empty, abs=1e-12)
