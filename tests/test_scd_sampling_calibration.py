"""scd2 (operators/scd.py), sample_per_key (sampling.py),
calibration_report (evaluation.py)."""

import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.evaluation import calibration_report
from hipipe_spark.operators.sampling import sample_per_key
from hipipe_spark.operators.scd import scd2


def test_scd2_intervals_and_collapse(spark):
    rows = [
        (1, 10.0, "gold", "EU"),
        (1, 20.0, "gold", "EU"),    # no-op update -> collapsed
        (1, 30.0, "plat", "EU"),
        (1, 40.0, "plat", "US"),
        (2, 15.0, None, "EU"),
        (2, 25.0, None, "EU"),      # null == null (null-safe) -> collapsed
        (2, 35.0, "gold", "EU"),
    ]
    df = spark.createDataFrame(rows, "k int, ts double, tier string, region string")
    out = scd2(df, "k", "ts", ["tier", "region"]).orderBy("k", "version").collect()
    k1 = [r for r in out if r["k"] == 1]
    assert [(r["valid_from"], r["valid_to"], r["version"]) for r in k1] == [
        (10.0, 30.0, 1), (30.0, 40.0, 2), (40.0, None, 3)]
    assert [r["is_current"] for r in k1] == [False, False, True]
    k2 = [r for r in out if r["k"] == 2]
    assert len(k2) == 2
    assert k2[0]["valid_to"] == 35.0   # collapsed row folds into predecessor
    with pytest.raises(ValueError):
        scd2(df, "k", "ts", [])


def test_scd2_no_collapse_and_tiebreak(spark):
    rows = [(1, 10.0, 1, "a"), (1, 10.0, 2, "b"), (1, 20.0, 3, "b")]
    df = spark.createDataFrame(rows, "k int, ts double, seq int, v string")
    # same-ts duplicate: highest tiebreak wins -> "b" at ts 10
    out = scd2(df, "k", "ts", ["v"], tiebreak="seq").collect()
    assert len(out) == 1  # b@10, then b@20 collapsed
    assert out[0]["v"] == "b" and out[0]["is_current"]
    out2 = scd2(df, "k", "ts", ["v"], tiebreak="seq", collapse=False).collect()
    assert len(out2) == 2


def test_sample_per_key_deterministic_and_bounded(spark):
    rows = [(g, g * 1000 + i) for g in range(5) for i in range(50)]
    df = spark.createDataFrame(rows, "g int, id long")
    a = sample_per_key(df, "g", "id", 7, seed=1)
    b = sample_per_key(df, "g", "id", 7, seed=1)
    assert sorted(r["id"] for r in a.collect()) == sorted(r["id"] for r in b.collect())
    sizes = {r["g"]: r["n"] for r in
             a.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(n == 7 for n in sizes.values())
    # different seed -> (almost surely) different members
    c = sample_per_key(df, "g", "id", 7, seed=2)
    assert sorted(r["id"] for r in c.collect()) != sorted(r["id"] for r in a.collect())
    # small groups pass through whole
    small = spark.createDataFrame([(1, 1), (1, 2)], "g int, id long")
    assert sample_per_key(small, "g", "id", 10).count() == 2
    with pytest.raises(ValueError):
        sample_per_key(df, "g", "id", 0)


def test_calibration_report_exact(spark):
    # bin 9 (p=0.9): 4 rows, 2 positive -> gap .4; bin 1 (p=0.1): 2 rows,
    # 0 positive -> gap .1; p=1.0 lands in top bin
    rows = ([(0.9, 1)] * 2 + [(0.9, 0)] * 2 + [(0.1, 0)] * 2 + [(1.0, 1)])
    df = spark.createDataFrame(rows, "p double, y int")
    out = {r["bin"]: r.asDict()
           for r in calibration_report(df, "p", "y", n_bins=10).collect()}
    assert len(out) == 10
    assert out[1]["n"] == 2 and out[1]["frac_pos"] == 0.0
    b9 = out[9]
    assert b9["n"] == 5
    # ECE = (|avg_p - frac|*n summed) / N ; brier = mean (p-y)^2
    exp_ece = (abs(0.1 - 0.0) * 2 + abs((0.9 * 4 + 1.0) / 5 - 3 / 5) * 5) / 7
    exp_brier = (2 * (0.9 - 1) ** 2 + 2 * (0.9 - 0) ** 2
                 + 2 * (0.1 - 0) ** 2 + (1.0 - 1) ** 2) / 7
    assert b9["ece"] == round(exp_ece, 6)
    assert b9["brier"] == round(exp_brier, 6)
    assert out[5]["n"] == 0 and out[5]["avg_prob"] is None
    with pytest.raises(ValueError):
        calibration_report(df, "p", "y", n_bins=0)
