"""Fleiss' kappa, Spearman rank correlation, MAD outliers."""

import math

from pyspark.sql import functions as F

from hipipe_spark.operators.evaluation import fleiss_kappa
from hipipe_spark.operators.features import mad_outliers, spearman_corr


def test_fleiss_kappa_textbook(spark):
    # Fleiss (1971)-style worked example: 4 items x 3 raters, 3 cats
    ratings = [
        (1, "a"), (1, "a"), (1, "a"),          # unanimous
        (2, "a"), (2, "b"), (2, "b"),
        (3, "b"), (3, "b"), (3, "c"),
        (4, "a"), (4, "b"), (4, "c"),          # total disagreement
    ]
    df = spark.createDataFrame(ratings, "item int, rating string")
    row = fleiss_kappa(df, "item", "rating").collect()[0]
    # reference numbers computed by hand (n_i = 3, per-item P_i =
    # (sum n_ij^2 - 3) / 6): P = [1, 1/3, 1/3, 0] -> p_bar = 5/12
    # marginals over 12 ratings: a=5, b=5, c=2 -> p_e = (25+25+4)/144
    p_bar = 5 / 12
    p_e = 54 / 144
    kappa = (p_bar - p_e) / (1 - p_e)
    assert row["n_items"] == 4 and row["n_ratings"] == 12
    assert abs(row["p_bar"] - p_bar) < 1e-6
    assert abs(row["p_e"] - p_e) < 1e-6
    assert abs(row["kappa"] - kappa) < 1e-6


def test_fleiss_kappa_excludes_single_rating_items(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "item int, rating string")
    row = fleiss_kappa(df, "item", "rating").collect()[0]
    # item 2 (one rating) excluded everywhere: marginals see only 'a'
    assert row["n_items"] == 1 and row["n_ratings"] == 2
    assert row["p_bar"] == 1.0 and row["p_e"] == 1.0
    assert row["kappa"] is None


def test_spearman_matches_scipy_formula(spark):
    # ties in both columns; reference via average-rank Pearson
    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 8.0, 9.0]
    ys = [2.0, 1.0, 4.0, 4.0, 6.0, 9.0, 8.0, 7.0]

    def avg_ranks(v):
        sv = sorted(range(len(v)), key=lambda i: v[i])
        rk = [0.0] * len(v)
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and v[sv[j]] == v[sv[i]]:
                j += 1
            r = (i + 1 + j) / 2.0
            for t in range(i, j):
                rk[sv[t]] = r
            i = j
        return rk

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    mx, my = sum(rx) / len(rx), sum(ry) / len(ry)
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    sx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    sy = math.sqrt(sum((b - my) ** 2 for b in ry))
    expected = cov / (sx * sy)

    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    row = spearman_corr(df, ["x", "y"]).collect()[0]
    assert row["col_a"] == "x" and row["col_b"] == "y"
    assert row["n_pairs"] == 8
    assert abs(row["rho"] - expected) < 1e-6


def test_spearman_monotone_is_one(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i), 1.0) for i in range(1, 30)],
        "x double, y double, c double")
    rows = {(r["col_a"], r["col_b"]): r
            for r in spearman_corr(df, ["x", "y", "c"]).collect()}
    assert abs(rows[("x", "y")]["rho"] - 1.0) < 1e-9  # monotone
    assert rows[("x", "c")]["rho"] is None            # constant column


def test_mad_outliers_flags_the_planted_spike(spark):
    rows = [("g1", float(v)) for v in [10, 11, 12, 10, 11, 12, 10, 500]]
    rows += [("g2", float(v)) for v in [5, 5, 5, 5]]  # MAD 0 -> null rz
    df = spark.createDataFrame(rows, "g string, v double")
    got = mad_outliers(df, "g", "v", exact=True).collect()
    flagged = [r for r in got if r["is_outlier"]]
    assert len(flagged) == 1 and flagged[0]["v"] == 500.0
    g2 = [r for r in got if r["g"] == "g2"]
    assert all(r["rz"] is None and not r["is_outlier"] for r in g2)


def test_krippendorff_alpha_matches_reference(spark):
    from collections import Counter, defaultdict

    from hipipe_spark.operators.evaluation import krippendorff_alpha

    ratings = [
        (1, "a"), (1, "a"), (1, "a"),
        (2, "a"), (2, "b"),
        (3, "b"), (3, "b"), (3, "c"), (3, "c"),
        (4, "a"),                       # single rating: excluded
        (5, "c"), (5, "c"),
    ]

    by_item = defaultdict(list)
    for i, c in ratings:
        by_item[i].append(c)
    by_item = {i: cs for i, cs in by_item.items() if len(cs) >= 2}
    n = sum(len(cs) for cs in by_item.values())
    do = 0.0
    for cs in by_item.values():
        m, cnt = len(cs), Counter(cs)
        do += (m * m - sum(v * v for v in cnt.values())) / (m - 1)
    do /= n
    allc = Counter(c for cs in by_item.values() for c in cs)
    de = (n * n - sum(v * v for v in allc.values())) / (n * (n - 1))
    expect = 1 - do / de

    df = spark.createDataFrame(ratings, "item int, rating string")
    row = krippendorff_alpha(df, "item", "rating").collect()[0]
    assert row["n_items"] == 4 and row["n_ratings"] == n
    assert abs(row["d_o"] - do) < 1e-6
    assert abs(row["d_e"] - de) < 1e-6
    assert abs(row["alpha"] - expect) < 1e-6


def test_krippendorff_alpha_perfect_and_degenerate(spark):
    from hipipe_spark.operators.evaluation import krippendorff_alpha

    perfect = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "item int, rating string")
    row = krippendorff_alpha(perfect, "item", "rating").collect()[0]
    assert row["alpha"] == 1.0
    one_cat = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "a")], "item int, rating string")
    row = krippendorff_alpha(one_cat, "item", "rating").collect()[0]
    assert row["d_e"] == 0.0 and row["alpha"] is None
