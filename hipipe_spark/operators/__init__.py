from hipipe_spark.operators import (
    asof,
    core,
    dedup,
    flagship,
    groups,
    similarity,
    temporal,
)

__all__ = ["asof", "core", "dedup", "flagship", "groups", "similarity", "temporal"]
