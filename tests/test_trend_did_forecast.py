"""Theil–Sen robustness vs OLS, DiD recovers a planted effect,
forecast_eval scores a planted seasonal series correctly."""

import math

import numpy as np
import pytest

from hipipe_spark.operators.stats import diff_in_diff, theil_sen
from hipipe_spark.operators.temporal import forecast_eval


def test_theil_sen_exact_on_clean_line(spark):
    rows = [("g", float(t), 3.0 + 0.5 * t) for t in range(60)]
    df = spark.createDataFrame(rows, "g: string, t: double, v: double")
    r = theil_sen(df, "g", "t", "v").collect()[0]
    assert r.slope == 0.5 and r.intercept == 3.0 and r.n == 60


def test_theil_sen_shrugs_off_30pct_outliers(spark):
    rng = np.random.RandomState(3)
    rows = []
    for t in range(100):
        v = 10.0 + 2.0 * t
        if t % 4 == 0:                      # 25% wild outliers
            v += float(rng.choice([-1, 1]) * rng.uniform(500, 5000))
        rows.append(("g", float(t), v))
    df = spark.createDataFrame(rows, "g: string, t: double, v: double")
    r = theil_sen(df, "g", "t", "v").collect()[0]
    assert abs(r.slope - 2.0) < 0.2        # OLS would be destroyed


def test_theil_sen_single_point_group_null(spark):
    df = spark.createDataFrame([("a", 1.0, 5.0)],
                               "g: string, t: double, v: double")
    r = theil_sen(df, "g", "t", "v").collect()[0]
    assert r.n == 1 and r.slope is None and r.intercept is None


def test_did_recovers_planted_effect(spark):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(4000):
        treat = i % 2 == 0
        post = i % 4 < 2
        v = 100.0 + (5.0 if treat else 0.0) + (3.0 if post else 0.0)
        if treat and post:
            v += 7.0                        # the causal effect
        rows.append(("s", bool(treat), bool(post),
                     v + float(rng.normal(0, 2))))
    df = spark.createDataFrame(
        rows, "seg: string, treat: boolean, post: boolean, v: double")
    r = diff_in_diff(df, "seg", "treat", "post", "v").collect()[0]
    assert abs(r.did - 7.0) < 0.5
    assert r.p_value < 1e-4                 # strongly significant
    assert r.se is not None and r.z_stat > 10


def test_did_degenerate_cell_nulls_inference(spark):
    df = spark.createDataFrame(
        [("s", True, True, 1.0), ("s", True, False, 2.0),
         ("s", False, True, 3.0), ("s", False, False, 4.0)],
        "seg: string, treat: boolean, post: boolean, v: double")
    r = diff_in_diff(df, "seg", "treat", "post", "v").collect()[0]
    assert r.se is None and r.z_stat is None and r.p_value is None
    assert r.did is not None                # point estimate still defined


def test_forecast_eval_seasonal_series(spark):
    period = 24
    rows = [(t, 100.0 + 20.0 * math.sin(2 * math.pi * t / period))
            for t in range(20 * period)]
    df = spark.createDataFrame(rows, "t: bigint, v: double")
    out = {r.method: r for r in
           forecast_eval(df, "t", "v", season=period).collect()}
    assert out["naive"].mase == 1.0          # by construction
    # perfectly periodic: seasonal-naive is exact, naive is not
    assert out["seasonal_naive"].mae == 0.0
    assert out["seasonal_naive"].rmse == 0.0
    assert out["naive"].mae > 1.0
    assert out["seasonal_naive"].mase == 0.0
    assert out["naive"].n == out["seasonal_naive"].n == 20 * period - period


def test_forecast_eval_rejects_bad_season(spark):
    df = spark.createDataFrame([(1, 1.0)], "t: bigint, v: double")
    with pytest.raises(ValueError):
        forecast_eval(df, "t", "v", season=0)


def test_acf_detects_planted_period(spark):
    import math
    from hipipe_spark.operators.temporal import acf_ljung_box
    period = 6
    rows = [(t, 10.0 * math.sin(2 * math.pi * t / period))
            for t in range(600)]
    df = spark.createDataFrame(rows, "t: bigint, v: double")
    out = {r.lag: r for r in
           acf_ljung_box(df, "t", "v", max_lag=6).collect()}
    assert out[6].r > 0.95               # full period: strong positive
    assert out[3].r < -0.95              # half period: strong negative
    assert out[6].p_value < 1e-6         # decisively not white noise
    qs = [out[k].q_stat for k in range(1, 7)]
    assert qs == sorted(qs)              # Q is cumulative


def test_acf_white_noise_not_rejected(spark):
    import numpy as np
    from hipipe_spark.operators.temporal import acf_ljung_box
    rng = np.random.RandomState(9)
    rows = [(t, float(v)) for t, v in enumerate(rng.normal(0, 1, 800))]
    df = spark.createDataFrame(rows, "t: bigint, v: double")
    out = acf_ljung_box(df, "t", "v", max_lag=10).collect()
    assert all(abs(r.r) < 0.15 for r in out)
    assert out[-1].p_value > 0.01        # no spurious rejection


def test_seasonal_anomalies_flags_planted_spike_only(spark):
    import math
    import numpy as np
    from hipipe_spark.operators.temporal import seasonal_anomalies
    rng = np.random.RandomState(21)
    period, n = 24, 24 * 20
    # noise sigma chosen so the spike's leakage into the mean-based
    # trend (spike/25) and phase means (spike/20) stays well under the
    # 3.5-robust-sigma threshold while the spike itself towers over it
    rows = []
    for t in range(n):
        v = (100.0 + 0.1 * t
             + 15.0 * math.sin(2 * math.pi * t / period)
             + float(rng.normal(0, 3.0)))
        if t == 240:
            v += 40.0                    # the anomaly
        rows.append((t, v))
    df = spark.createDataFrame(rows, "t: bigint, v: double")
    out = {r.t: r for r in
           seasonal_anomalies(df, "t", "v", period=period,
                              k=3.5).collect()}
    assert out[240].anomaly
    flagged = [t for t, r in out.items() if r.anomaly]
    assert len(flagged) <= 3             # spike + at most noise tail
    # edges (undefined trend) are excluded entirely
    assert 0 not in out and n - 1 not in out


def test_knee_point_on_planted_elbow(spark):
    from hipipe_spark.operators.temporal import knee_point
    # sharp saturating curve: knee of y = x/(x+5) on [0, 100]
    rows = [(float(x), x / (x + 5.0)) for x in range(101)]
    df = spark.createDataFrame(rows, "x: double, y: double")
    r = knee_point(df, "x", "y").collect()[0]
    # analytic Kneedle argmax of y_norm - x_norm lands near x ≈ 18
    assert 10 <= r.x <= 30
    assert r.score > 0.5
    # decreasing mirror: elbow of a decaying curve
    rows2 = [(float(x), 100.0 / (x + 1.0)) for x in range(101)]
    df2 = spark.createDataFrame(rows2, "x: double, y: double")
    r2 = knee_point(df2, "x", "y", decreasing=True).collect()[0]
    assert 2 <= r2.x <= 20
