"""Extreme-skew A/B for decay features: naive conv-partitioned DecayAgg
vs the bucketed variant on the monster-conversation fixture (one conv =
half of all rows). Appends its own table to BENCH/SKEW.md."""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hipipe_spark.operators.temporal import DecayAgg  # noqa: E402
from hipipe_spark.session import get_spark  # noqa: E402
from tools.skew_bench import build, force, timed  # noqa: E402


def main():
    spark = get_spark(app_name="skew_decay_bench")
    turns = build(spark)
    n = turns.count()
    naive = DecayAgg("text_len", lookback=16, tau="1 hour")
    bucketed = DecayAgg("text_len", lookback=16, tau="1 hour",
                        bucket_size=65536)
    t_naive = timed(lambda: force(naive(turns)))
    t_bucket = timed(lambda: force(bucketed(turns)))
    date = datetime.now(timezone.utc).isoformat(timespec="seconds")
    line = (f"| {date} | {n} | {t_naive:.2f}s | {t_bucket:.2f}s | "
            f"{t_naive / t_bucket:.2f}x |")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "SKEW.md")
    header = "## Decay-feature skew A/B (16-lag fold, same monster fixture)"
    existing = open(path).read() if os.path.exists(path) else ""
    with open(path, "a") as f:
        if header not in existing:
            f.write(f"\n{header}\n\n"
                    "| date | rows | decay naive | decay bucketed | speedup |\n"
                    "|---|---|---|---|---|\n")
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
