"""Two-sample Anderson-Darling (drift.ad_table).

A plain-python replica of the tie-aware formula pins the Spark plan;
analytic sanity: identical samples give A2 ~ 0, a location shift gives
a large A2, and AD out-weighs KS in the tails.
"""

import pytest

from hipipe_spark.operators.drift import ad_table


def _py_a2(xs, ys):
    import collections
    ca, cb = collections.Counter(xs), collections.Counter(ys)
    vals = sorted(set(xs) | set(ys))
    na, nb = float(len(xs)), float(len(ys))
    N = na + nb
    h = ma = 0.0
    a2 = 0.0
    for v in vals:
        l = ca[v] + cb[v]
        h += l
        ma += ca[v]
        if h < N:
            a2 += round(l * (N * ma - na * h) ** 2 * (1 / na + 1 / nb)
                        / (h * (N - h)) / N, 9)
    return round(a2, 6)


def _run(spark, xs, ys):
    a = spark.createDataFrame([(float(x),) for x in xs], "value double")
    b = spark.createDataFrame([(float(y),) for y in ys], "value double")
    rows = ad_table(a, b, "value").collect()
    return rows[0]["a2"], rows


def test_matches_python_replica(spark):
    xs = [1, 2, 2, 3, 5, 8, 8, 9]
    ys = [2, 3, 3, 4, 4, 7, 10]
    a2, rows = _run(spark, xs, ys)
    assert a2 == pytest.approx(_py_a2(xs, ys), abs=2e-6)
    # per-row contribs sum to a2
    assert sum(r["contrib"] for r in rows) == pytest.approx(a2, abs=1e-4)


def test_identical_samples_near_zero(spark):
    xs = list(range(30))
    a2, _ = _run(spark, xs, xs)
    assert a2 == pytest.approx(0.0, abs=1e-9)


def test_shift_is_large(spark):
    xs = list(range(30))
    ys = [x + 15 for x in xs]
    a2_shift, _ = _run(spark, xs, ys)
    a2_same, _ = _run(spark, xs, xs)
    assert a2_shift > 5.0 > a2_same


def test_tail_sensitivity(spark):
    # same median mass, divergent tail: AD grows with the tail gap
    base = [5] * 20
    xs = base + [1, 2, 3]
    ys = base + [97, 98, 99]
    a2_tail, _ = _run(spark, xs, ys)
    xs2 = base + [4, 5, 6]
    ys2 = base + [5, 6, 7]
    a2_mid, _ = _run(spark, xs2, ys2)
    assert a2_tail > a2_mid
