"""Readability indices (functions/text.py readability).

Hand-computed counts pin the three formulas, the sentence/syllable
clamps, and the empty-text null policy.
"""

import pytest
from pyspark.sql import functions as F

from hipipe_spark.functions.text import readability


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    cols = readability(F.col("text"))
    out = df.select("id", *[c.alias(n) for n, c in cols.items()])
    return {r["id"]: r for r in out.collect()}


def test_hand_computed_counts(spark):
    # "the cat sat. it ran!" -> W=5, S=2, C=14, Y: vowel runs:
    # e, a, a, i, a = 5 -> clamped to max(5,5)=5
    t = "the cat sat. it ran!"
    got = _run(spark, [t])[0]
    W, S, C, Y = 5.0, 2.0, 14.0, 5.0
    fre = 206.835 - 1.015 * (W / S) - 84.6 * (Y / W)
    fkgl = 0.39 * (W / S) + 11.8 * (Y / W) - 15.59
    ari = 4.71 * (C / W) + 0.5 * (W / S) - 21.43
    assert got["fre"] == pytest.approx(round(fre, 4))
    assert got["fkgl"] == pytest.approx(round(fkgl, 4))
    assert got["ari"] == pytest.approx(round(ari, 4))


def test_sentence_clamp_and_syllable_clamp(spark):
    # no terminator -> S clamps to 1; vowelless words -> Y clamps to W
    got = _run(spark, ["xyzzyq brrr grrr"])[0]
    # W=3, S=1, Y = max(3, 1 vowel run 'y'... 'y' IS a vowel here):
    # xyzzyq -> y, y (2 runs); brrr, grrr -> 0 -> total 2 -> clamp 3
    W, S, Y, C = 3.0, 1.0, 3.0, 14.0
    fkgl = 0.39 * (W / S) + 11.8 * (Y / W) - 15.59
    assert got["fkgl"] == pytest.approx(round(fkgl, 4))
    ari = 4.71 * (C / W) + 0.5 * (W / S) - 21.43
    assert got["ari"] == pytest.approx(round(ari, 4))


def test_empty_text_is_null(spark):
    got = _run(spark, ["", "   ", None])
    for i in range(3):
        assert got[i]["fre"] is None
        assert got[i]["fkgl"] is None
        assert got[i]["ari"] is None


def test_ordering_is_sane(spark):
    simple = "the cat sat on the mat. it was fun. we ran a lot."
    dense = ("notwithstanding institutional heterogeneity, "
             "organizational interdependencies necessitate "
             "comprehensive infrastructural rationalization.")
    got = _run(spark, [simple, dense])
    assert got[0]["fre"] > got[1]["fre"]      # simple reads easier
    assert got[0]["fkgl"] < got[1]["fkgl"]    # lower grade level
    assert got[0]["ari"] < got[1]["ari"]
