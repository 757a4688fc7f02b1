"""hipipe_spark — a PySpark-native feature-engineering engine.

A from-scratch re-imagination of iterait/hipipe's column-oriented
stream-transformation pipeline (reference: /root/reference, MIT) as an
idiomatic Spark DataFrame engine:

- hipipe ``stream | create | transform | filter | ... | unpack`` chains
  become :class:`hipipe_spark.plans.Pipeline` objects of named
  ``DataFrame -> DataFrame`` stages (reference
  ``include/hipipe/core/stream/transform.hpp:71-106`` — the
  ``partial_transform`` batch-level primitive is the ancestor of our Stage).
- the keyed/temporal operators hipipe users hand-roll inside
  ``transform(dim<0>)`` stages — as-of join, lag/lead, sliding-window
  backfill, gap sessionization — are first-class operators here
  (``hipipe_spark.operators.temporal`` / ``.asof``).
- everything is vectorized: built-in ``pyspark.sql.functions`` in the hot
  path, Arrow-batched pandas UDFs where Python is unavoidable, never
  per-row Python (mirrors hipipe's zero-copy batched columns,
  ``include/hipipe/core/stream/column_t.hpp:126-132``).
"""

from hipipe_spark.plans.pipeline import Pipeline, Stage
from hipipe_spark.session import get_spark

__all__ = ["Pipeline", "Stage", "get_spark"]
__version__ = "0.1.0"
