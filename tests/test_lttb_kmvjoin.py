"""LTTB downsampling shape/spike retention; KMV join-cardinality
estimates vs exact overlap."""

import math

from hipipe_spark.operators.sketches import kmv_join_estimate
from hipipe_spark.operators.temporal import lttb_downsample


def test_lttb_keeps_endpoints_spikes_and_bucket_shape(spark):
    n = 1000
    rows = []
    for t in range(n):
        v = 50.0 + 10.0 * math.sin(t / 30.0)
        if t in (333, 666):
            v = 500.0                      # spikes LTTB must keep
        rows.append((t, v))
    df = spark.createDataFrame(rows, "t: bigint, v: double")
    out = lttb_downsample(df, "t", "v", n_out=40).collect()
    assert len(out) == 40
    ts = [r.t for r in out]
    assert ts[0] == 0 and ts[-1] == n - 1   # endpoints always kept
    assert ts == sorted(ts)
    assert {r.bucket for r in out} == set(range(40))  # one per bucket
    vs = {r.t: r.v for r in out}
    assert 333 in vs and 666 in vs          # spikes survive
    assert vs[333] == 500.0


def test_lttb_short_series_returned_whole(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                               "t: bigint, v: double")
    out = lttb_downsample(df, "t", "v", n_out=40).collect()
    assert len(out) == 10
    assert [r.t for r in out] == list(range(10))
    assert [r.bucket for r in out] == list(range(10))


def test_kmv_join_estimates_overlap(spark):
    a = spark.createDataFrame([(i,) for i in range(6000)], "k: long")
    b = spark.createDataFrame([(i,) for i in range(3000, 12000)],
                              "k: long")
    r = kmv_join_estimate(a, "k", b, "k", k=256, tau=0.2).collect()[0]
    assert r.k_used == 256
    assert r.exact_inter == 3000
    assert abs(r.union_est - 12000) / 12000 < 0.25
    assert abs(r.jaccard_est - 0.25) < 0.12
    assert abs(r.inter_est - 3000) / 3000 < 0.5   # k=256 → coarse but sane


def test_kmv_join_disjoint_sides(spark):
    a = spark.createDataFrame([(i,) for i in range(2000)], "k: long")
    b = spark.createDataFrame([(i,) for i in range(50000, 52000)],
                              "k: long")
    r = kmv_join_estimate(a, "k", b, "k", k=128, tau=0.2).collect()[0]
    assert r.exact_inter == 0
    assert r.jaccard_est == 0.0 and r.inter_est == 0.0


def test_kmv_join_unsaturated_theta_fallback(spark):
    a = spark.createDataFrame([(i,) for i in range(300)], "k: long")
    b = spark.createDataFrame([(i,) for i in range(150, 450)], "k: long")
    r = kmv_join_estimate(a, "k", b, "k", k=4096, tau=0.5).collect()[0]
    assert r.k_used < 4096                  # sketch not saturated
    # fixed-threshold theta: survivors/tau ≈ true union (450)
    assert abs(r.union_est - 450) / 450 < 0.3
