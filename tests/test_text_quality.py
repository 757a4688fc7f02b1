"""PII scrub + C4 quality heuristics — hand-computed values."""

import pytest
from pyspark.sql import functions as F

from hipipe_spark.functions.pii import pii_counts, scrub_pii
from hipipe_spark.functions.text import (
    c4_flags, mean_words_per_line, terminal_line_frac,
)


def test_scrub_pii_and_counts(spark):
    rows = [
        (0, "mail me at alice@example.com or bob.smith+x@sub.dom.org ok"),
        (1, "server at 192.168.0.1 and 10.0.0.255 responded"),
        (2, "no pii here at all"),
        (3, "mixed: carol@x.io from 127.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    counts = pii_counts(F.col("text"), ("email", "ipv4"))
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        scrub_pii(F.col("text"), ("email", "ipv4")).alias("s"),
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
    ).collect()}
    assert got[0]["s"] == "mail me at <EMAIL> or <EMAIL> ok"
    assert got[0]["n_email"] == 2 and got[0]["n_ipv4"] == 0
    assert got[1]["s"] == "server at <IP> and <IP> responded"
    assert got[1]["n_ipv4"] == 2
    assert got[2]["s"] == rows[2][1]
    assert got[3]["s"] == "mixed: <EMAIL> from <IP>"


def test_scrub_phone(spark):
    df = spark.createDataFrame(
        [(0, "call +1 (555) 123-4567 now"), (1, "just 42 apples")],
        "doc_id int, text string")
    got = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", scrub_pii(F.col("text"), ("phone",)).alias("s")).collect()}
    assert got[0] == "call <PHONE> now"
    assert got[1] == "just 42 apples"


def test_c4_heuristics(spark):
    rows = [
        (0, 'Good line one.\nAnother fine line!\nno punctuation here\n'),
        (1, "function f() { return 1; }"),
        (2, "Lorem Ipsum dolor sit amet."),
        (3, "Please enable JavaScript to view."),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    flags = c4_flags(F.col("text"))
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        terminal_line_frac(F.col("text")).alias("tf"),
        mean_words_per_line(F.col("text")).alias("wpl"),
        flags["has_brace"].alias("b"),
        flags["has_lorem"].alias("l"),
        flags["has_javascript"].alias("j"),
    ).collect()}
    # doc 0: 3 non-blank lines, 2 end in terminal punctuation
    assert got[0]["tf"] == pytest.approx(2 / 3)
    assert got[0]["wpl"] == pytest.approx(3.0)
    assert not got[0]["b"]
    assert got[1]["b"] and not got[1]["l"]
    assert got[2]["l"] and got[2]["tf"] == 1.0
    assert got[3]["j"]
    assert got[4]["tf"] == 0.0 and got[4]["wpl"] == 0.0


def test_hashed_count_vector_matches_python(spark):
    """Feature-hashing vector vs a pure-python recount on real docs."""
    import pyspark.sql.functions as F

    from hipipe_spark.functions.hashing import _A, _C, _M
    from hipipe_spark.functions.text import hashed_count_vector

    def py_hash(s, seed=0):
        acc = seed % _M
        for ch in s:
            acc = (acc * 31 + ord(ch)) % _M
        x = acc % _M
        x = (x * _A + _C) % _M
        x = (x * _A + _C) % _M
        return x

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").limit(50)
    out = docs.withColumn("fv", hashed_count_vector(F.col("text"), dim=16)) \
        .collect()
    assert len(out) == 50
    for r in out:
        toks = r["text"].strip().lower().split() if r["text"].strip() else []
        want = [0] * 16
        for t in toks:
            want[py_hash(t) % 16] += 1
        assert list(r["fv"]) == want, r["doc_id"]
