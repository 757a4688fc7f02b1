"""Train/eval contamination detection for LLM corpora.

The standard decontamination recipe (published with GPT-3, PaLM, and the
FineWeb pipeline): a training document is contaminated when it shares at
least ``min_hits`` distinct word ``n``-grams with any document of an
evaluation set. The eval side is benchmark-sized (thousands of docs) and
the train side is the corpus (up to 100 TB), so the scale architecture
is fixed: explode DISTINCT n-grams on both sides, broadcast the eval
grams, equi-join, count per (train, eval) pair. The corpus is touched by
exactly one narrow pass — no shuffle of train data, no corpus self-join.

Relation to the reference: this is the cross-table sibling of the
``ngram_jaccard`` near-dup family (`operators/dedup.py`); hipipe itself
has no corpus-level analogue (its streams are single-source), which is
why SURVEY.md lists it under the training-data extensions rather than
§2.1 parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hipipe_spark.functions.text import tokens, word_ngrams


def _distinct_grams(df: DataFrame, id_col: str, text_col: str,
                    n: int, out_id: str) -> DataFrame:
    """(id, gram) pairs — DISTINCT per document, so a gram repeated
    inside one document counts once (hit counts measure breadth of
    overlap, not within-doc repetition)."""
    grams = F.array_distinct(
        word_ngrams(tokens(F.lower(F.col(text_col))), n))
    return (df.select(F.col(id_col).alias(out_id),
                      F.explode(grams).alias("__gram")))


def contamination_pairs(train: DataFrame, test: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 8, min_hits: int = 1) -> DataFrame:
    """(train_id, test_id, n_shared_grams) for every train/eval pair
    sharing >= ``min_hits`` distinct word ``n``-grams.

    The eval side is broadcast: at corpus scale the train side streams
    through one map-side hash join and one partial-aggregated count —
    the train corpus is never shuffled on raw text. If the eval set
    outgrows the broadcast threshold Spark falls back to a shuffle join
    on the gram key automatically (AQE), still never a cross join.
    """
    tr = _distinct_grams(train, id_col, text_col, n, "train_id")
    te = _distinct_grams(test, id_col, text_col, n, "test_id")
    return (tr.join(F.broadcast(te), "__gram")
              .groupBy("train_id", "test_id")
              .agg(F.count(F.lit(1)).cast("int").alias("n_shared_grams"))
              .filter(F.col("n_shared_grams") >= min_hits))


def decontaminate(train: DataFrame, test: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 8, min_hits: int = 1) -> DataFrame:
    """Training corpus minus contaminated documents (left-anti join on
    the contamination pairs) — the actual pipeline stage."""
    hits = (contamination_pairs(train, test, id_col, text_col, n, min_hits)
            .select(F.col("train_id").alias(id_col)).distinct())
    return train.join(hits, id_col, "left_anti")
