"""ndim utilities and the batched-inference stage."""

import pandas as pd
from pyspark.sql import functions as F

from hipipe_spark.functions.ndim import flat_view, ndim_size, reshaped_view, same_size
from hipipe_spark.operators.core import create, unpack
from hipipe_spark.operators.inference import InferenceStage


def test_ndim_utilities(spark):
    df = create(
        spark,
        [([[1, 2], [3]], [1, 2, 3, 4, 5])],
        schema="nested array<array<int>>, flat array<int>",
    )
    out = df.select(
        ndim_size(F.col("nested")).alias("outer"),
        ndim_size(F.col("nested"), dim=2).alias("inner"),
        flat_view(F.col("nested")).alias("flat2"),
        reshaped_view(F.col("flat"), 2).alias("resh"),
        same_size(F.col("nested"), F.col("nested")).alias("same"),
    ).collect()[0]
    assert out.outer == 2
    assert out.inner == [2, 1]
    assert out.flat2 == [1, 2, 3]
    assert out.resh == [[1, 2], [3, 4], [5]]  # last chunk short
    assert out.same is True
    empty = create(spark, [([],)], schema="flat array<int>")
    r = empty.select(reshaped_view(F.col("flat"), 3).alias("r")).collect()[0].r
    assert list(r) == []


def test_inference_stage(spark):
    df = create(spark, [(1.0, 2.0), (3.0, 4.0)], schema="a double, b double")

    def loader():
        # stands in for loading model weights once per worker
        def predict(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"score": pdf["a"] * 10 + pdf["b"]})
        return predict

    out = InferenceStage(loader, ["a", "b"], "score double")(df)
    assert sorted(unpack(out, "score")) == [12.0, 34.0]
    assert out.columns == ["a", "b", "score"]
