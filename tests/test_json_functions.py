"""JSON column operators (functions/json.py)."""

import pytest

from hipipe_spark.functions.json import json_features, json_key_profile


def test_json_features_typed_extraction(spark):
    rows = [
        (1, '{"k": 69, "tag": "a", "extra": true}'),
        (2, '{"k": "not-an-int", "tag": "b"}'),
        (3, 'not json at all'),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, props string")
    out = {r["id"]: r for r in
           json_features(df, "props", {"k": "int", "tag": "string"}).collect()}
    assert out[1]["k"] == 69 and out[1]["tag"] == "a"
    assert out[2]["k"] is None and out[2]["tag"] == "b"  # type miss -> null
    assert out[3]["k"] is None and out[3]["tag"] is None
    assert out[4]["k"] is None
    with pytest.raises(ValueError):
        json_features(df, "props", {})


def test_json_key_profile(spark):
    rows = [(1, '{"a": 1, "b": 2}'), (2, '{"a": 3}'),
            (3, 'broken'), (4, '{"c": null}')]
    df = spark.createDataFrame(rows, "id int, props string")
    out = {r["key"]: r for r in json_key_profile(df, "props").collect()}
    assert out["a"]["n_docs"] == 2 and out["a"]["doc_share"] == 0.5
    assert out["b"]["n_docs"] == 1
    assert out["c"]["n_docs"] == 1
    assert set(out) == {"a", "b", "c"}
