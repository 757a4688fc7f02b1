from hipipe_spark.operators import (
    asof,
    boilerplate,
    bpe,
    contamination,
    core,
    corpus,
    dedup,
    drift,
    encoders,
    flagship,
    groups,
    inference,
    joins,
    ordering,
    packing,
    retrieval,
    sampling,
    similarity,
    temporal,
)

__all__ = [
    "asof", "boilerplate", "bpe", "contamination", "core", "corpus", "dedup",
    "drift", "encoders", "flagship", "groups", "inference", "joins",
    "ordering",
    "packing", "retrieval", "sampling", "similarity", "temporal",
]
