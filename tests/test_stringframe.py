"""StringFrame — reference hipipe::dataframe semantics
(/root/reference/test/core/dataframe.cpp fixtures)."""

import pytest

from hipipe_spark.sources.dataframe import StringFrame, from_spark


def simple():
    # dataframe.cpp:27-36
    return StringFrame(
        [[1, 2, 3], ["a1", "a2", "a3"], ["1.1", "1.2", "1.3"]],
        ["Id", "A", "B"])


def test_constructor_invariants():
    with pytest.raises(ValueError):
        StringFrame([[1, 2], [3]], None)            # ragged
    with pytest.raises(ValueError):
        StringFrame([[1], [2], [3]], ["short", "header"])
    with pytest.raises(ValueError):
        StringFrame([[1], [2], [3]], ["invalid", "", "header"])
    with pytest.raises(ValueError):
        StringFrame([[1], [2]], ["dup", "dup"])


def test_insert_col():
    df = simple()
    with pytest.raises(ValueError):
        df.insert_col([5, 6, 7])            # missing name (header present)
    with pytest.raises(ValueError):
        df.insert_col(["only", "two"], "X")
    df.insert_col([5, 6, 7], "C")
    assert (df.n_cols, df.n_rows) == (4, 3)
    assert df.header() == ["Id", "A", "B", "C"]
    assert df.raw_cols()[3] == ["5", "6", "7"]
    assert df.raw_rows()[0][3] == "5"


def test_drop_col_and_row():
    df = simple()
    with pytest.raises(KeyError):
        df.drop_col("X")
    with pytest.raises(IndexError):
        df.drop_icol(3)
    df.drop_col("B")
    assert df.header() == ["Id", "A"]
    assert df.raw_rows()[2] == ["3", "a3"]
    df.drop_icol(1)
    assert df.header() == ["Id"]
    df2 = simple()
    with pytest.raises(IndexError):
        df2.drop_row(3)
    df2.drop_row(1)
    assert df2.raw_icol(1) == ["a1", "a3"]


def test_insert_row_typed():
    df = simple()
    with pytest.raises(ValueError):
        df.insert_row(["too", "few"])
    df.insert_row([4, "a3", True])
    # bool renders as 'true' (dataframe.cpp:104)
    assert df.raw_rows()[3] == ["4", "a3", "true"]


def test_typed_views_and_index():
    df = simple()
    assert df.col("Id", int) == [1, 2, 3]
    assert df.icol(2, float) == [1.1, 1.2, 1.3]
    a, b = df.cols(["A", "B"], [str, float])
    assert a == ["a1", "a2", "a3"] and b == [1.1, 1.2, 1.3]
    assert df.rows(["Id", "B"], [int, float])[1] == (2, 1.2)
    # index views (dataframe.cpp:122-140) → lookup dicts
    assert df.index_col("Id", "B", int, float) == {1: 1.1, 2: 1.2, 3: 1.3}
    m = df.index_cols("Id", ["A", "B"], int, [str, float])
    assert m[3] == ("a3", 1.3)


def test_bool_parse_tolerant():
    df = StringFrame([["Yes", "off", "1"]], ["flag"])
    assert df.col("flag", bool) == [True, False, True]
    bad = StringFrame([["maybe"]], ["flag"])
    with pytest.raises(ValueError):
        bad.col("flag", bool)


def test_spark_bridge_roundtrip(spark):
    df = simple()
    sdf = df.to_spark(spark, types={"Id": "int", "B": "double"})
    rows = sdf.orderBy("Id").collect()
    assert rows[0].Id == 1 and abs(rows[2].B - 1.3) < 1e-9
    back = from_spark(df.to_spark(spark))
    assert back.header() == ["Id", "A", "B"]
    assert sorted(back.col("Id", int)) == [1, 2, 3]
