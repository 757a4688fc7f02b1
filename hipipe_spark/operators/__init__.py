from hipipe_spark.operators import (
    asof,
    boilerplate,
    contamination,
    core,
    corpus,
    dedup,
    drift,
    encoders,
    flagship,
    groups,
    inference,
    ordering,
    packing,
    retrieval,
    sampling,
    similarity,
    temporal,
)

__all__ = [
    "asof", "boilerplate", "contamination", "core", "corpus", "dedup",
    "drift", "encoders", "flagship", "groups", "inference", "ordering",
    "packing", "retrieval", "sampling", "similarity", "temporal",
]
