"""table_diff change data feed (operators/validate.py)."""

import pytest

from hipipe_spark.operators.validate import table_diff


def test_table_diff_states(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, v string, n int")
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "C", 30), (4, None, 40), (5, "e", 50)],
        "k int, v string, n int")
    out = {r["k"]: r for r in table_diff(old, new, ["k"]).collect()}
    assert out[1]["change"] == "deleted" and out[1]["v_old"] == "a"
    assert out[3]["change"] == "changed" and out[3]["v_new"] == "C"
    assert out[5]["change"] == "inserted" and out[5]["v_new"] == "e"
    assert 2 not in out and 4 not in out          # unchanged filtered
    full = {r["k"]: r["change"] for r in
            table_diff(old, new, ["k"], include_unchanged=True).collect()}
    assert full[2] == "unchanged"
    assert full[4] == "unchanged"                 # null == null (null-safe)


def test_table_diff_compare_subset_and_validation(spark):
    old = spark.createDataFrame([(1, "a", 10)], "k int, v string, n int")
    new = spark.createDataFrame([(1, "a", 99)], "k int, v string, n int")
    # comparing only v -> unchanged; n excluded
    out = table_diff(old, new, ["k"], compare=["v"],
                     include_unchanged=True).collect()
    assert out[0]["change"] == "unchanged"
    with pytest.raises(ValueError):
        table_diff(old, new, [])
