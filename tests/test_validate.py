"""check_rules / flag_violations / fk_audit / profile_columns."""

import numpy as np
from pyspark.sql import functions as F

from hipipe_spark.operators.validate import (
    check_rules, fk_audit, flag_violations, profile_columns)


def test_check_rules_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (-1, "b"), (0, "c")], "x int, s string")
    out = check_rules(df, [
        ("x_pos", F.col("x") > 0),
        ("s_present", F.col("s").isNotNull()),
    ]).toPandas()
    assert list(out["rule"]) == ["x_pos", "s_present"]
    assert list(out["n_rows"]) == [4, 4]
    assert list(out["n_fail"]) == [2, 1]
    assert np.allclose(out["fail_rate"], [0.5, 0.25])


def test_check_rules_null_predicate_not_failed(spark):
    # predicate NULL (x null) is neither pass nor fail-count
    df = spark.createDataFrame([(None,), (1,), (-1,)], "x int")
    out = check_rules(df, [("x_pos", F.col("x") > 0)]).toPandas()
    assert out["n_fail"].iloc[0] == 1


def test_flag_violations_rows(spark):
    df = spark.createDataFrame(
        [(1, "a"), (-2, None), (3, None)], "x int, s string")
    out = flag_violations(df, [
        ("x_pos", F.col("x") > 0),
        ("s_present", F.col("s").isNotNull()),
    ]).orderBy("x").toPandas()
    got = {r["x"]: (list(r["violations"]), r["violations_n"])
           for _, r in out.iterrows()}
    assert got[1] == ([], 0)
    assert got[-2] == (["x_pos", "s_present"], 2)
    assert got[3] == (["s_present"], 1)


def test_fk_audit_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,), (2,)], "k int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    out = fk_audit(child, parent, "k").toPandas().iloc[0]
    assert out["n_rows"] == 5
    assert out["n_null_key"] == 1
    assert out["n_orphan"] == 1
    assert abs(out["orphan_rate"] - 0.2) < 1e-12
    assert abs(out["match_rate"] - 0.6) < 1e-12


def test_profile_columns_matches_pandas(transcripts, transcripts_pdf):
    out = profile_columns(
        transcripts, ["role", "turn_idx"]).toPandas().set_index("column")
    pdf = transcripts_pdf
    r = out.loc["role"]
    assert r["n_rows"] == len(pdf)
    assert r["n_null"] == int(pdf["role"].isna().sum())
    assert r["n_distinct"] == pdf["role"].nunique()
    assert r["min_s"] == pdf["role"].min()
    assert r["max_s"] == pdf["role"].max()
    t = out.loc["turn_idx"]
    assert t["n_distinct"] == pdf["turn_idx"].nunique()
    assert int(t["min_s"]) == int(pdf["turn_idx"].min())
    assert abs(t["mean"] - pdf["turn_idx"].mean()) < 1e-4


def test_profile_columns_approximate_close(transcripts):
    exact = profile_columns(transcripts, ["conv_id"]).toPandas().iloc[0]
    approx = profile_columns(transcripts, ["conv_id"],
                             approximate=True).toPandas().iloc[0]
    # HLL default rsd = 5%
    assert abs(approx["n_distinct"] - exact["n_distinct"]) \
        <= max(3, 0.15 * exact["n_distinct"])


def test_leakage_audit_counts_and_leads(spark):
    from hipipe_spark.operators.validate import leakage_audit
    # numeric epoch-second timestamps; src_a clean (one null miss),
    # src_b leaks twice (leads 5.5 and 2.0), src_c exactly-at-ts (not
    # a leak at tolerance 0)
    df = spark.createDataFrame(
        [(100.0, 90.0, 105.5, 100.0),
         (200.0, None, 202.0, 200.0),
         (300.0, 300.0, 299.0, 300.0)],
        "ts double, src_a double, src_b double, src_c double")
    out = {r["source"]: r for r in leakage_audit(
        df, "ts", ["src_a", "src_b", "src_c"]).collect()}
    a, b, c = out["src_a"], out["src_b"], out["src_c"]
    assert (a["n_rows"], a["n_matched"], a["n_leaks"]) == (3, 2, 0)
    assert a["ok"] and a["max_lead_s"] is None
    assert (b["n_leaks"], b["max_lead_s"]) == (2, 5.5)
    assert not b["ok"] and abs(b["leak_rate"] - 2 / 3) < 1e-6
    assert c["n_leaks"] == 0 and c["ok"]


def test_leakage_audit_tolerance_and_timestamps(spark):
    from hipipe_spark.operators.validate import leakage_audit
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 00:00:03"),
         ("2024-01-01 01:00:00", "2024-01-01 00:59:00")],
        "ts string, src string").select(
        F.to_timestamp("ts").alias("ts"),
        F.to_timestamp("src").alias("src"))
    strict = leakage_audit(df, "ts", ["src"]).collect()[0]
    assert strict["n_leaks"] == 1 and strict["max_lead_s"] == 3.0
    lenient = leakage_audit(df, "ts", ["src"], tolerance_s=5.0).collect()[0]
    assert lenient["n_leaks"] == 0 and lenient["ok"]
