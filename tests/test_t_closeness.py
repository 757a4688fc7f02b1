"""t-closeness / entropy l-diversity audit (validate.t_closeness).

Hand-computed distributions pin the TVD absent-value correction, the
entropy fold, null-sensitive grouping, and the violation taxonomy.
"""

import math

import pytest

from hipipe_spark.operators.validate import t_closeness


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, s string")
    out = t_closeness(df, ["g"], "s", **kw)
    return {r["g"]: r for r in out.collect()}


def test_hand_computed_tvd_and_entropy(spark):
    # global: a=4, b=2, c=2 over 8 rows -> p_g = (.5, .25, .25)
    # class A = {a,a,a,a} -> p = (1,0,0):
    #   tvd = 0.5*(|1-.5| + .25 + .25) = 0.5;  entropy = 0
    # class B = {b,b,c,c} -> p = (0,.5,.5):
    #   tvd = 0.5*(.5 + .25 + .25) = 0.5;  entropy = ln 2
    rows = [("A", "a")] * 4 + [("B", "b")] * 2 + [("B", "c")] * 2
    got = _run(spark, rows, l=1, t=0.0, violations_only=False)
    assert got["A"]["tvd"] == pytest.approx(0.5)
    assert got["A"]["entropy"] == pytest.approx(0.0)
    assert got["A"]["distinct_sensitive"] == 1
    assert got["B"]["tvd"] == pytest.approx(0.5)
    assert got["B"]["entropy"] == pytest.approx(round(math.log(2), 6))
    assert got["B"]["class_size"] == 4


def test_single_class_matches_global(spark):
    # one class == global distribution -> tvd exactly 0
    rows = [("A", "x")] * 3 + [("A", "y")] * 5
    got = _run(spark, rows, l=1, t=1.0, violations_only=False)
    assert got["A"]["tvd"] == 0.0
    h = -(3 / 8) * math.log(3 / 8) - (5 / 8) * math.log(5 / 8)
    assert got["A"]["entropy"] == pytest.approx(round(h, 6))


def test_null_sensitive_counts_as_value(spark):
    rows = [("A", None)] * 2 + [("A", "x")] * 2 + [("B", "x")] * 4
    got = _run(spark, rows, l=2, t=1.0, violations_only=False)
    assert got["A"]["distinct_sensitive"] == 2  # {NULL, x}
    assert got["B"]["distinct_sensitive"] == 1
    assert got["B"]["violation"] == "l"
    # B: p=(0, 1) vs global (.25, .75) -> tvd = .25
    assert got["B"]["tvd"] == pytest.approx(0.25)


def test_violation_taxonomy_and_filter(spark):
    # global = (.5, .5); lo and mid are single-valued (l violation)
    # AND maximally skewed (tvd = .5 > t); ok matches global exactly
    rows = ([("lo", "a")] * 6 + [("mid", "b")] * 6
            + [("ok", "a")] * 3 + [("ok", "b")] * 3)
    got = _run(spark, rows, l=2, t=0.3, violations_only=False)
    assert got["lo"]["violation"] == "l+t"
    assert got["lo"]["tvd"] == pytest.approx(0.5)
    assert got["mid"]["violation"] == "l+t"
    assert got["ok"]["violation"] is None
    only = _run(spark, rows, l=2, t=0.3)  # violations_only default
    assert set(only) == {"lo", "mid"}


def test_param_guards(spark):
    df = spark.createDataFrame([("a", "b")], "g string, s string")
    with pytest.raises(ValueError):
        t_closeness(df, [], "s")
    with pytest.raises(ValueError):
        t_closeness(df, ["g"], "s", l=0)
    with pytest.raises(ValueError):
        t_closeness(df, ["g"], "s", t=1.5)
