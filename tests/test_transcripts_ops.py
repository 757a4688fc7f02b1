"""render_conversations / truncate_context: templates, ordering,
assistant stats, head+tail semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.transcripts import (
    render_conversations, truncate_context)


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        ("a", 0, "system", "be helpful"),
        ("a", 2, "assistant", "hi there"),
        ("a", 1, "user", "hello"),          # out of order on purpose
        ("b", 0, "user", "only user turns"),
        ("b", 1, "user", "again"),
        ("c", 0, "assistant", ""),           # zero chars total
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    ).cache()


def test_render_plain(convs):
    out = {r.conv_id: r.asDict()
           for r in render_conversations(convs).collect()}
    assert out["a"]["rendered"] == (
        "system: be helpful\nuser: hello\nassistant: hi there")
    assert out["a"]["n_turns"] == 3
    assert out["a"]["assistant_turns"] == 1
    # 8 assistant chars of 10+5+8=23
    assert out["a"]["assistant_char_frac"] == pytest.approx(8 / 23, abs=1e-6)
    assert out["b"]["assistant_turns"] == 0
    assert out["b"]["assistant_char_frac"] == 0.0
    assert out["c"]["assistant_char_frac"] == 0.0  # 0/0 guarded


def test_render_chatml(convs):
    out = {r.conv_id: r.rendered for r in
           render_conversations(convs, template="chatml").collect()}
    assert out["b"] == ("<|im_start|>user\nonly user turns<|im_end|>\n"
                        "<|im_start|>user\nagain<|im_end|>")


def test_render_unknown_template(convs):
    with pytest.raises(ValueError):
        render_conversations(convs, template="nope")


@pytest.fixture(scope="module")
def long_conv(spark):
    rows = [("x", i, "user", f"t{i}") for i in range(10)]
    rows += [("y", i, "user", f"t{i}") for i in range(3)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


def test_truncate_head_tail(long_conv):
    out = truncate_context(long_conv, head=2, tail=3)
    kept = sorted(r.turn_idx for r in out.filter("conv_id = 'x'").collect())
    assert kept == [0, 1, 7, 8, 9]
    # short conversation passes through whole (3 <= 2+3)
    assert out.filter("conv_id = 'y'").count() == 3


def test_truncate_tail_only_and_ranks(long_conv):
    out = truncate_context(long_conv, tail=4).filter("conv_id = 'x'")
    rows = {r.turn_idx: r for r in out.collect()}
    assert sorted(rows) == [6, 7, 8, 9]
    assert rows[6].kept_rank == 7 and rows[6].conv_turns == 10


def test_truncate_validation(long_conv):
    with pytest.raises(ValueError):
        truncate_context(long_conv)           # head + tail == 0
    with pytest.raises(ValueError):
        truncate_context(long_conv, head=-1, tail=2)


def test_render_cap_tail(convs):
    out = {r.conv_id: r.asDict() for r in
           render_conversations(convs, cap_tail=2).collect()}
    assert out["a"]["rendered"] == "user: hello\nassistant: hi there"
    assert out["a"]["n_turns"] == 2
    assert out["a"]["assistant_char_frac"] == pytest.approx(8 / 13, abs=1e-6)


def test_truncate_overlap_no_duplicates(long_conv):
    # head+tail spanning the whole conversation must not duplicate rows
    out = truncate_context(long_conv, head=6, tail=6).filter("conv_id = 'x'")
    assert out.count() == 10
    assert out.select("turn_idx").distinct().count() == 10


def test_build_sft_examples(spark):
    from hipipe_spark.operators.transcripts import build_sft_examples
    rows = [
        # conv a: valid (2 turns, has assistant)
        ("a", 0, "user", "hi"), ("a", 1, "assistant", "yo"),
        # conv b: duplicate rendering of a -> deduped (a < b keeps a)
        ("b", 0, "user", "hi"), ("b", 1, "assistant", "yo"),
        # conv c: no assistant -> dropped
        ("c", 0, "user", "hi"), ("c", 1, "user", "anyone?"),
        # conv d: single turn -> dropped
        ("d", 0, "assistant", "alone"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    out = build_sft_examples(df).collect()
    assert [r.conv_id for r in out] == ["a"]
    assert out[0].rendered == "user: hi\nassistant: yo"
    # dedup off keeps both byte-identical examples
    both = build_sft_examples(df, dedup=False)
    assert {r.conv_id for r in both.collect()} == {"a", "b"}
    # assistant requirement off admits conv c
    no_req = build_sft_examples(df, require_assistant=False)
    assert {r.conv_id for r in no_req.collect()} == {"a", "c"}


def test_truncate_token_budget(spark):
    from hipipe_spark.operators.transcripts import truncate_token_budget
    rows = [
        ("a", 0, "one two three"),        # 3 tokens
        ("a", 1, "four five"),            # 2
        ("a", 2, "six"),                  # 1
        ("b", 0, "w " * 50),              # 50 tokens, over any budget
        ("b", 1, "tail turn"),            # 2
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string")
    out = truncate_token_budget(df, budget=3, text_col="text")
    a = {r.turn_idx: r.suffix_tokens
         for r in out.filter("conv_id = 'a'").collect()}
    # suffix sums from the end: t2=1, t1=3, t0=6 -> keep t1, t2
    assert a == {1: 3, 2: 1}
    b = {r.turn_idx for r in out.filter("conv_id = 'b'").collect()}
    assert b == {1}  # the 50-token turn and everything before it drop
    import pytest as _pt
    with _pt.raises(ValueError):
        truncate_token_budget(df, budget=0)
