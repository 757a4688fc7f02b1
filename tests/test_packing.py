"""Sequence packing (concat-and-chunk + greedy) and repetition stats.

pack_chunks must equal a single-threaded pandas cumsum reference at ANY
parallelism — the two-phase range-partitioned prefix sum is only correct
if partition boundaries respect the global order.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.packing import pack_chunks, pack_greedy, pack_stats

SEQ = 16


def _docs_df(spark, n=200, seed=7):
    """Deterministic token counts incl. zeros and oversized docs."""
    rows = []
    for i in range(n):
        h = (i * 2654435761 + seed) % 97
        if h < 5:
            tok = 0                      # empty doc
        elif h < 10:
            tok = SEQ * 2 + (h % 7)      # spans >2 chunks
        else:
            tok = h % (SEQ + 3)
        rows.append((i, tok))
    return spark.createDataFrame(rows, "doc_id int, n_tok int")


def _pandas_ref(pdf):
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    pdf["tok_offset"] = pdf["n_tok"].cumsum().shift(1, fill_value=0)
    pdf["chunk_first"] = pdf["tok_offset"] // SEQ
    last = (pdf["tok_offset"] + pdf["n_tok"].clip(lower=1) - 1) // SEQ
    pdf["chunk_last"] = last
    pdf["n_chunks"] = (last - pdf["chunk_first"] + 1).astype("int64")
    return pdf


@pytest.mark.parametrize("n_partitions", [1, 5, 32])
def test_pack_chunks_matches_pandas_any_parallelism(spark, n_partitions):
    df = _docs_df(spark)
    got = (pack_chunks(df, "doc_id", "n_tok", SEQ, n_partitions=n_partitions)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    ref = _pandas_ref(df.toPandas())
    for c in ["tok_offset", "chunk_first", "chunk_last", "n_chunks"]:
        assert list(got[c]) == list(ref[c]), c


def test_pack_stats_conserves_tokens(spark):
    df = _docs_df(spark)
    packed = pack_chunks(df, "doc_id", "n_tok", SEQ)
    stats = pack_stats(packed, "n_tok", SEQ).toPandas()
    total_tok = df.agg(F.sum("n_tok")).first()[0]
    # every starting doc contributes min(room-left, its tokens); docs
    # spanning chunks contribute only their first-chunk slice here, so
    # the sum is <= total and > 0, and docs_started sums to n docs
    assert stats["docs_started"].sum() == df.count()
    assert 0 < stats["tokens_in_chunk"].sum() <= total_tok
    assert (stats["tokens_in_chunk"] <= SEQ).all()


def test_pack_greedy_bins_respect_budget(spark):
    df = _docs_df(spark, n=120)
    got = (pack_greedy(df, "doc_id", "n_tok", SEQ)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    # bin ids are non-decreasing in doc order (first-fit-by-order)
    assert got["bin_id"].is_monotonic_increasing
    fills = got.groupby("bin_id")["n_tok"].apply(
        lambda s: s.clip(upper=SEQ).sum())
    assert (fills <= SEQ).all()
    # oversized docs share their bin with nothing that takes space
    # (zero-token docs add no fill, so they may co-reside)
    lone = got[got["n_tok"] > SEQ]
    nonempty_counts = got[got["n_tok"] > 0].groupby("bin_id").size()
    assert all(nonempty_counts[b] == 1 for b in lone["bin_id"])


def test_pack_greedy_guard(spark):
    df = _docs_df(spark, n=30)
    with pytest.raises(ValueError, match="bounded-input"):
        pack_greedy(df, "doc_id", "n_tok", SEQ, max_rows=10)


def test_contamination_pairs_and_decontaminate(spark):
    from hipipe_spark.operators.contamination import (
        contamination_pairs, decontaminate,
    )
    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "completely unrelated text about spark plans"),
         (2, "quick brown fox quick brown fox repeated twice")],
        "doc_id int, text string")
    test = spark.createDataFrame(
        [(100, "a quick brown fox appears"),
         (101, "nothing in common here at all")],
        "doc_id int, text string")
    pairs = contamination_pairs(train, test, n=3, min_hits=1).collect()
    hits = {(r["train_id"], r["test_id"]): r["n_shared_grams"]
            for r in pairs}
    # 'quick brown fox' is the only shared 3-gram; distinct-per-doc so
    # doc 2's repetition still counts once
    assert hits == {(0, 100): 1, (2, 100): 1}
    clean = decontaminate(train, test, n=3, min_hits=1)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1]


def test_repetition_stats_hand_values(spark):
    from hipipe_spark.functions.text import (
        dup_line_char_frac, dup_line_frac, dup_ngram_frac, top_ngram_frac,
    )
    rows = [
        (0, "a b a b a"),            # 2grams: ab ba ab ba -> dup 0.5, top 0.5
        (1, "x y z"),                # all distinct -> 0, top 1/2
        (2, "w"),                    # no 2grams
        (3, ""),                     # empty
        (4, "l1\nl2\nl1\n\nl3"),     # 4 non-blank lines, 2 dup (l1 x2)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        dup_ngram_frac(F.col("text"), 2).alias("d2"),
        top_ngram_frac(F.col("text"), 2).alias("t2"),
        dup_line_frac(F.col("text")).alias("dl"),
        dup_line_char_frac(F.col("text")).alias("dlc"),
    ).collect()}
    assert got[0]["d2"] == pytest.approx(0.5)
    assert got[0]["t2"] == pytest.approx(0.5)
    assert got[1]["d2"] == 0.0
    assert got[1]["t2"] == pytest.approx(0.5)
    assert got[2]["d2"] == 0.0 and got[2]["t2"] == 0.0
    assert got[3]["d2"] == 0.0 and got[3]["dl"] == 0.0
    # doc 4: lines l1,l2,l1,l3 -> dup_frac 1 - 3/4; chars 8 total, 4 dup
    assert got[4]["dl"] == pytest.approx(0.25)
    assert got[4]["dlc"] == pytest.approx(0.5)


def test_pack_chunks_random_property(spark):
    """Property: for random token-count sequences, offsets are an
    exclusive cumsum and chunk spans tile the token stream, at a
    parallelism that does not divide the row count evenly."""
    import random
    rng = random.Random(42)
    for trial in range(3):
        n = rng.randint(1, 60)
        rows = [(i, rng.choice([0, 1, 3, SEQ, SEQ + 5, 2 * SEQ + 1]))
                for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id int, n_tok int")
        got = (pack_chunks(df, "doc_id", "n_tok", SEQ, n_partitions=7)
               .toPandas().sort_values("doc_id").reset_index(drop=True))
        acc = 0
        for _, r in got.iterrows():
            assert r["tok_offset"] == acc
            assert r["chunk_first"] == acc // SEQ
            assert r["chunk_last"] == (acc + max(r["n_tok"], 1) - 1) // SEQ
            acc += r["n_tok"]
