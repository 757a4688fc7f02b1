"""Batched model inference — the TensorFlow-bridge analog.

Reference ``include/hipipe/tensorflow/run_graph.hpp:43-102`` feeds column
vectors into a frozen TF graph per batch and gets output columns back.
The Spark-native shape: broadcast the model handle once, run it over
Arrow batches via ``mapInPandas`` (the same pattern as
``predict_batch_udf``). No ML runtime ships in this container, so the
model is any picklable ``fn(pandas.DataFrame) -> pandas.DataFrame``;
a real TF/torch model slots in by loading weights lazily per executor
(the ``loader`` indirection below keeps heavy state out of the closure).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame

from hipipe_spark.plans.pipeline import Stage


class InferenceStage(Stage):
    """Run a batched model over selected input columns, appending output
    columns. ``loader()`` is called once per executor-python-worker and
    returns the predict function — the broadcast-model pattern."""

    def __init__(self, loader: Callable[[], Callable[[pd.DataFrame], pd.DataFrame]],
                 input_cols: list[str], output_schema: str,
                 name: str = "inference",
                 passthrough: list[str] | None = None):
        super().__init__(name)
        self.loader, self.input_cols, self.output_schema = loader, input_cols, output_schema
        # Arrow transfer discipline: every passthrough column is
        # serialized to the Python worker and back. Default keeps all
        # columns (the ergonomic contract); pass an explicit list to
        # keep wide payloads (raw text, binary blobs) JVM-side when the
        # model only needs the feature columns.
        self.passthrough = passthrough

    def apply(self, df: DataFrame) -> DataFrame:
        loader, input_cols = self.loader, self.input_cols
        passthrough = (list(self.passthrough) if self.passthrough is not None
                       else [c for c in df.columns])
        staged = df.select(*dict.fromkeys(passthrough + input_cols))
        schema = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}"
             for f in staged.schema.fields if f.name in passthrough]
        ) + ", " + self.output_schema
        df = staged

        def runner(batches: Iterable[pd.DataFrame]):
            predict = loader()  # once per worker, not per batch
            for pdf in batches:
                out = predict(pdf[input_cols])
                yield pd.concat([pdf[passthrough].reset_index(drop=True),
                                 out.reset_index(drop=True)], axis=1)

        return df.mapInPandas(runner, schema=schema)
