"""Prefix-filter A/B: plain inverted-index n-gram Jaccard join vs the
PPJoin-style prefix-filtered variant on a hub-heavy corpus (every doc
shares k universal boilerplate tokens — the fan-out that melts the
plain index at scale). Measures candidate-pair counts (the real scale
metric: candidates ~ shuffle + verify volume) and wall time on the
identical input; appends to BENCH/SKEW.md."""

from __future__ import annotations

import os
import random
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hipipe_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs, ngram_jaccard_prefix_pairs, word_ngrams,
)
from hipipe_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("PF_DOCS", "30000"))
N_HUBS = int(os.environ.get("PF_HUBS", "3"))
T = float(os.environ.get("PF_T", "0.6"))


def build(spark):
    """Docs of 12 tokens: N_HUBS universal boilerplate tokens + 9 drawn
    from a 30k vocab; every 10th doc is a near-dup of its predecessor."""
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30000)]
    rows = []
    prev = None
    for i in range(N_DOCS):
        if prev is not None and i % 10 == 9:
            toks = list(prev)
            toks[-1] = rng.choice(vocab)
        else:
            toks = rng.sample(vocab, 12 - N_HUBS)
        prev = toks
        rows.append((i, " ".join(f"hub{h}" for h in range(N_HUBS))
                     + " " + " ".join(toks)))
    return spark.createDataFrame(
        rows, "doc_id long, text string").repartition(32).persist()


def candidates_plain(docs):
    base = docs.select(F.col("doc_id").alias("id"),
                       word_ngrams(F.col("text"), 1).alias("gs"))
    grams = base.select("id", F.explode("gs").alias("g"))
    a, b = grams.alias("a"), grams.alias("b")
    return (a.join(b, on="g").filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id"), F.col("b.id")).count())


def candidates_prefix(docs, t):
    base = docs.select(F.col("doc_id").alias("id"),
                       word_ngrams(F.col("text"), 1).alias("gs"))
    grams = base.select("id", F.size("gs").alias("sz"),
                        F.explode("gs").alias("g"))
    dfreq = grams.groupBy("g").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy("df", "g")
    ranked = (grams.join(dfreq, on="g")
              .select("id", "g", "sz", F.row_number().over(w).alias("pos")))
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz") - F.lit(1e-9)) + 1)
    a = prefix.select(F.col("id").alias("ia"), "g", F.col("sz").alias("sa"))
    b = prefix.select(F.col("id").alias("ib"), "g", F.col("sz").alias("sb"))
    return (a.join(b, on="g")
            .filter((F.col("ia") < F.col("ib"))
                    & (F.least("sa", "sb").cast("double")
                       >= F.lit(t) * F.greatest("sa", "sb") - F.lit(1e-9)))
            .select("ia", "ib").count())


def timed(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return out, best


def main():
    spark = get_spark(cores=32, shuffle_partitions=32)
    docs = build(spark)
    docs.count()  # materialize + warm

    n_plain, t_cand_plain = timed(lambda: candidates_plain(docs))
    n_pref, t_cand_pref = timed(lambda: candidates_prefix(docs, T))

    r_plain, t_plain = timed(
        lambda: ngram_jaccard_pairs(docs, threshold=T).count())
    r_pref, t_pref = timed(
        lambda: ngram_jaccard_prefix_pairs(docs, threshold=T).count())
    assert r_plain == r_pref, f"output mismatch {r_plain} vs {r_pref}"

    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    row = (
        f"| {stamp} | {N_DOCS} docs, {N_HUBS} universal hub tokens, t={T} "
        f"| candidates {n_plain:,} / {t_cand_plain:.2f}s "
        f"| candidates {n_pref:,} / {t_cand_pref:.2f}s "
        f"| {n_plain / max(n_pref, 1):.0f}x fewer "
        f"| e2e {t_plain:.2f}s vs {t_pref:.2f}s ({t_plain / t_pref:.2f}x), "
        f"{r_plain} identical pairs |"
    )
    print(row)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "SKEW.md"), "a") as f:
        f.write(row + "\n")


if __name__ == "__main__":
    main()
