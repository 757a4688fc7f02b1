"""Skew-aware join strategies.

A handful of hot keys (the 1% of conversations holding half the turns —
datagen's hot_frac, and the reality of any web-scale corpus) turn a
plain shuffle join into one straggler task. AQE's skew-join split
handles *sort-merge* skew when statistics surface it; ``salted_join``
is the explicit, deterministic version that works on any plan shape and
any Spark version, at the cost of replicating the small side ``salts``
times.

hipipe sidesteps the problem entirely (single-node column streams have
no shuffle — reference ``stream/transform.hpp`` operates in-core); at
10^12 rows the shuffle IS the architecture, so the engine must own it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Join a skewed ``fact`` table to a (relatively) small ``dim``
    table on ``on``, splitting every hot fact key across ``salts``
    shuffle partitions.

    Mechanics: each fact row gets a round-robin salt in ``[0, salts)``
    (derived from ``monotonically_increasing_id`` — the salt VALUE
    never affects results, only placement, so any uniform source is
    correct); the dim side is exploded ``salts`` times so every
    (key, salt) bucket finds its dim rows. The join key becomes
    ``on + [salt]`` — a single hot key now lands in ``salts`` tasks
    instead of one.

    Result is row-identical to ``fact.join(dim, on, how)`` for
    ``how in ("inner", "left")``; right/full joins are refused because
    replicated unmatched dim rows would multiply. Cost trade: dim-side
    rows shuffled ×``salts`` — use when |dim| ≪ |fact| but too big to
    broadcast (the broadcast join needs no salting at all).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(replicated dim rows would multiply unmatched right rows)"
        )
    if salts < 2:
        raise ValueError("salts must be >= 2 (1 is a plain join)")
    keys = [on] if isinstance(on, str) else list(on)
    fact_s = fact.withColumn(
        SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salts)).cast("int")
    )
    # sequence of int literals yields array<int> — no cast (a generator
    # cannot nest inside another expression)
    dim_s = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return fact_s.join(dim_s, on=keys + [SALT], how=how).drop(SALT)
