"""Skew evidence for line-level boilerplate removal: a line occurring
in EVERY document (the worst hub) plus one monster document with ~100x
the median line count, A/B'd against a uniform corpus of identical
total line volume. The doc-frequency count is safe because the
``distinct`` pre-shuffle partitions by (digest, doc_id) — spreading the
hub line across all reducers — and the final count per digest is
partially aggregated, so the hot reducer receives at most
n_partitions rows per line, not n_docs. Appends to BENCH/SKEW.md."""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hipipe_spark.operators.boilerplate import remove_frequent_lines  # noqa: E402
from hipipe_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("BP_SKEW_DOCS", "200000"))
LINES_PER_DOC = 10


def build_skewed(spark):
    """Every doc carries the hub line; doc 0 has 100x the lines."""
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.array(F.lit("hub boilerplate line")),
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.when(F.col("id") == 0,
                           F.lit(LINES_PER_DOC * 100))
                    .otherwise(F.lit(LINES_PER_DOC - 1))),
                lambda i: F.concat_ws(
                    " ", F.lit("line"), F.col("id").cast("string"),
                    i.cast("string"))),
        ).alias("lines"))
    return docs.persist()


def build_uniform(spark):
    """Same total line volume, no hub, no monster."""
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(LINES_PER_DOC)),
            lambda i: F.concat_ws(
                " ", F.lit("line"), F.col("id").cast("string"),
                i.cast("string"))).alias("lines"))
    return docs.persist()


def force(df):
    return df.select(F.count(F.lit(1)), F.sum(F.length(
        F.concat_ws("\n", "clean_lines")))).collect()[0][0]


def timed(fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    spark = get_spark(app_name="bp_skew", cores=32, shuffle_partitions=64)
    sk = build_skewed(spark)
    un = build_uniform(spark)
    sk.count(), un.count()
    t_skew = timed(lambda: force(remove_frequent_lines(sk, min_docs=1000)))
    t_unif = timed(lambda: force(remove_frequent_lines(un, min_docs=1000)))
    date = datetime.now(timezone.utc).isoformat(timespec="seconds")
    line = (f"| {date} | boilerplate {N_DOCS} docs | skewed (hub line in "
            f"100% of docs + 100x monster doc) {t_skew:.2f}s | uniform "
            f"{t_unif:.2f}s | ratio {t_skew / t_unif:.2f}x |")
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "SKEW.md"), "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
