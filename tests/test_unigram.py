"""Unigram-LM tokenizer: Viterbi analytics, hard-EM training
behavior, round-trip invariants, determinism."""

import math

import pandas as pd
import pytest

from hipipe_spark.operators.unigram import (
    _train_unigram_local, _viterbi, unigram_segment, unigram_train,
)


def test_viterbi_picks_max_likelihood():
    logp = {"ab": -1.0, "a": -2.0, "b": -2.0, "c": -1.5}
    # 'ab' (-1) beats 'a'+'b' (-4)
    assert _viterbi("ab", logp, 4) == ["ab"]
    assert _viterbi("abc", logp, 4) == ["ab", "c"]
    # unknown char falls back to the unk floor but still segments
    assert _viterbi("axb", logp, 4) == ["a", "x", "b"]


def test_viterbi_tie_breaks_fewer_then_lex():
    # "aa" as one piece vs two: equal score -> fewer pieces wins
    logp = {"aa": -2.0, "a": -1.0}
    assert _viterbi("aa", logp, 4) == ["aa"]
    # two equal-score single-piece options cannot happen for the same
    # span; equal-score different split points -> lexicographic last
    # piece decides deterministically
    logp2 = {"ab": -1.0, "a": -0.5, "b": -0.5, "c": -0.5, "bc": -1.0}
    seg = _viterbi("abc", logp2, 4)
    # 'ab'+'c' = -1.5 ; 'a'+'bc' = -1.5 ; 'a'+'b'+'c' = -1.5 but more
    # pieces. Tie between the two 2-piece splits -> smaller LAST piece
    # 'bc' < 'c' -> 'a','bc'
    assert seg == ["a", "bc"]
    assert sum(len(p) for p in seg) == 3


def test_local_training_learns_frequent_word_as_piece():
    words = {"hello": 500, "world": 400, "he": 30, "low": 20,
             "word": 10}
    vocab = _train_unigram_local(words, vocab_size=40,
                                 max_piece_len=5, n_em=3,
                                 prune_frac=0.25)
    pieces = {p for p, _, _ in vocab}
    assert "hello" in pieces and "world" in pieces
    # every char survives
    for ch in set("".join(words)):
        assert ch in pieces
    # probs normalized: sum exp(logprob) over EMITTED pieces <= 1+eps
    total = sum(math.exp(lp) for _, lp, _ in vocab)
    assert total <= 1.0 + 1e-9
    # deterministic: retrain gives the identical table
    assert vocab == _train_unigram_local(words, 40, 5, 3, 0.25)


def test_train_segment_roundtrip_spark(spark):
    pdf = pd.DataFrame({
        "doc_id": range(40),
        "text": [f"alpha beta gamma doc{i} alpha beta" for i in range(40)],
    })
    df = spark.createDataFrame(pdf)
    vocab = unigram_train(df, "text", vocab_size=60, sample_cap=1000,
                          max_piece_len=5, n_em=2)
    vrows = vocab.collect()
    assert len(vrows) <= 60 + 5  # chars may exceed target slightly
    seg = unigram_segment(df, vocab, "text", out="pieces",
                          max_piece_len=5).toPandas()
    for _, row in seg.iterrows():
        joined = "".join(row["pieces"])
        assert joined == row["text"].lower().replace(" ", "")
    # frequent words segment into one piece
    pieces_by_doc = seg.iloc[0]["pieces"]
    assert "alpha" in pieces_by_doc and "beta" in pieces_by_doc


def test_vocab_size_respected(spark):
    words = {f"w{i:03d}x": 10 + i for i in range(80)}
    vocab = _train_unigram_local(words, vocab_size=30,
                                 max_piece_len=4, n_em=2,
                                 prune_frac=0.3)
    chars = {p for p, _, c in vocab if c}
    multi = [p for p, _, c in vocab if not c]
    assert len(multi) <= max(0, 30 - len(chars))


def test_segment_memoizes_and_handles_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["aa bb aa", None, ""]}))
    vocab = {"aa": -1.0, "bb": -1.0, "a": -3.0, "b": -3.0}
    out = unigram_segment(df, vocab, "text", out="p",
                          max_piece_len=2).toPandas()
    assert list(out.iloc[0]["p"]) == ["aa", "bb", "aa"]
    assert list(out.iloc[1]["p"]) == []
    assert list(out.iloc[2]["p"]) == []
