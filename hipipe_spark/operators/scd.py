"""Slowly-changing-dimension (SCD type 2) builders.

The as-of join family (operators/asof.py) consumes point-in-time
profile UPDATES; warehouses usually materialize the same information
as validity INTERVALS — one row per (key, version) with
``valid_from / valid_to / is_current``. :func:`scd2` turns an update
stream into that layout; it is the write-side twin of the as-of read
path (`asof.py featurize`'s profile side), and interval rows join to
facts with a plain range predicate (operators/joins.py interval_join)
when an engine lacks as-of support.

Scale shape: ONE exchange on ``key``; inside each partition one
window sort by (ts, tiebreak) computes the change filter (null-safe
lag comparison per tracked attribute) and the interval bounds
(``lead(ts)``). No self-join of updates x updates, no driver state.
Exact duplicates of (key, ts) are resolved deterministically by
``tiebreak`` (last wins), so re-running over an at-least-once ingest
is idempotent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2(
    updates: DataFrame,
    key: str,
    ts_col: str,
    attrs: Sequence[str],
    tiebreak: str | None = None,
    collapse: bool = True,
) -> DataFrame:
    """Build SCD2 validity intervals from an update stream.

    Returns one row per retained version: all input columns plus
    ``valid_from`` (= its ts), ``valid_to`` (next retained version's
    ts; null for the open current version), ``is_current`` and
    ``version`` (1-based per key).

    ``collapse=True`` drops an update whose tracked ``attrs`` all
    equal the previous retained version's (null-safe) — the standard
    "no-op update" suppression; the dropped row's time range folds
    into its predecessor. With multiple updates at the same (key, ts),
    the one with the highest ``tiebreak`` wins.
    """
    if not attrs:
        raise ValueError("attrs must be non-empty")
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    wk = Window.partitionBy(key).orderBy(*order)

    df = updates
    if tiebreak:
        # last update per (key, ts) wins
        wdup = Window.partitionBy(key, ts_col).orderBy(F.col(tiebreak).desc())
        df = (df.withColumn("__rk", F.row_number().over(wdup))
                .filter(F.col("__rk") == 1).drop("__rk"))

    if collapse:
        changed = F.lit(False)
        for a in attrs:
            changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(wk))
        first = F.lag(ts_col).over(wk).isNull()
        df = (df.withColumn("__chg", first | changed)
                .filter(F.col("__chg")).drop("__chg"))

    # lead over the RETAINED rows (post-collapse) gives interval ends
    return (df
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(wk))
            .withColumn("is_current", F.col("valid_to").isNull())
            .withColumn("version", F.row_number().over(wk)))
