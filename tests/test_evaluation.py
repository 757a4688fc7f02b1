"""evaluation.py (auc_roc / cohens_kappa / preference_pairs),
temporal.rolling_slope, analytics.cooccurrence — each vs an
independent numpy/pandas reference."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from hipipe_spark.operators.analytics import cooccurrence
from hipipe_spark.operators.evaluation import (
    auc_roc, cohens_kappa, preference_pairs,
)
from hipipe_spark.operators.temporal import rolling_slope


# ------------------------------------------------------------- auc_roc
def _auc_ref(scores, labels):
    """Rank-based AUC with average ranks for ties (numpy only)."""
    s = np.asarray(scores, dtype=float)
    y = np.asarray(labels, dtype=int)
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=float)
    sv = s[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2 + 1  # average 1-based rank
        i = j + 1
    npos, nneg = int(y.sum()), int((1 - y).sum())
    u = ranks[y == 1].sum() - npos * (npos + 1) / 2
    return u / (npos * nneg)


def test_auc_matches_rank_formula(spark):
    rng = np.random.RandomState(7)
    scores = rng.randint(0, 40, size=500).astype(float)  # heavy ties
    labels = (scores + rng.normal(0, 12, size=500) > 20).astype(int)
    df = spark.createDataFrame(
        pd.DataFrame({"s": scores, "y": labels}))
    row = auc_roc(df, "s", "y").collect()[0]
    expect = _auc_ref(scores, labels)
    assert row["n"] == 500
    assert row["npos"] == int(labels.sum())
    assert abs(row["auc"] - expect) < 1e-6
    assert abs(row["gini"] - (2 * expect - 1)) < 1e-6


def test_auc_perfect_and_degenerate(spark):
    df = spark.createDataFrame(
        [(float(i), 1 if i >= 5 else 0) for i in range(10)], "s double, y int")
    assert auc_roc(df, "s", "y").collect()[0]["auc"] == 1.0
    # constant label: AUC undefined, NULL not a throw (ANSI mode)
    const = spark.createDataFrame([(1.0, 1), (2.0, 1)], "s double, y int")
    assert auc_roc(const, "s", "y").collect()[0]["auc"] is None


# -------------------------------------------------------- cohens_kappa
def _kappa_ref(a, b):
    a, b = pd.Series(a), pd.Series(b)
    n = len(a)
    po = float((a == b).mean())
    pa, pb = a.value_counts() / n, b.value_counts() / n
    pe = float(sum(pa.get(k, 0) * pb.get(k, 0)
                   for k in set(pa.index) | set(pb.index)))
    return po, pe, (po - pe) / (1 - pe)


def test_kappa_matches_reference(spark):
    rng = np.random.RandomState(3)
    a = rng.choice(["x", "y", "z"], size=400, p=[0.5, 0.3, 0.2])
    flip = rng.rand(400) < 0.25
    b = np.where(flip, rng.choice(["x", "y", "z"], size=400), a)
    df = spark.createDataFrame(pd.DataFrame({"a": a, "b": b}))
    row = cohens_kappa(df, "a", "b").collect()[0]
    po, pe, kappa = _kappa_ref(a, b)
    assert row["n"] == 400
    assert abs(row["po"] - po) < 1e-6
    assert abs(row["pe"] - pe) < 1e-6
    assert abs(row["kappa"] - kappa) < 1e-6


def test_kappa_disjoint_categories_still_counts_pe(spark):
    # raters share NO diagonal cell for 'y': pe must still include it
    df = spark.createDataFrame(
        [("x", "y")] * 3 + [("y", "x")] * 3 + [("x", "x")] * 2,
        "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    po, pe, kappa = _kappa_ref(
        ["x"] * 3 + ["y"] * 3 + ["x"] * 2,
        ["y"] * 3 + ["x"] * 3 + ["x"] * 2)
    assert abs(row["pe"] - pe) < 1e-6
    assert abs(row["kappa"] - kappa) < 1e-6


def test_kappa_constant_raters_null(spark):
    df = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row["po"] == 1.0 and row["pe"] == 1.0 and row["kappa"] is None


# ---------------------------------------------------- preference_pairs
def test_preference_pairs_best_vs_worst(spark):
    df = spark.createDataFrame(
        [("g1", i, float(i * 10)) for i in range(1, 6)]      # 5 cands
        + [("g2", 1, 5.0), ("g2", 2, 5.0)]                    # tie pair
        + [("g3", 9, 1.0)],                                   # singleton
        "grp string, cid long, sc double")
    out = {(r["grp"], r["pair_rank"]): r for r in
           preference_pairs(df, "grp", "cid", "sc", per_group=2).collect()}
    # g1: best=5(50) worst=1(10); 2nd best=4 vs 2nd worst=2
    assert out[("g1", 1)]["chosen_id"] == 5
    assert out[("g1", 1)]["rejected_id"] == 1
    assert out[("g1", 1)]["margin"] == 40.0
    assert out[("g1", 2)]["chosen_id"] == 4
    assert out[("g1", 2)]["rejected_id"] == 2
    # g2: tie -> deterministic ids, margin 0
    assert out[("g2", 1)]["margin"] == 0.0
    assert out[("g2", 1)]["chosen_id"] != out[("g2", 1)]["rejected_id"]
    # singleton emits nothing; g1 pair_rank 3 would cross the middle
    assert ("g3", 1) not in out
    assert len(out) == 3


def test_preference_pairs_min_margin_and_odd_group(spark):
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(1, 4)],  # 3 cands: 1,2,3
        "grp string, cid long, sc double")
    out = preference_pairs(df, "grp", "cid", "sc",
                           per_group=2).collect()
    # middle element (cid=2) can't pair with itself: only i=1 survives
    assert len(out) == 1 and out[0]["chosen_id"] == 3
    strict = preference_pairs(df, "grp", "cid", "sc",
                              per_group=1, min_margin=5.0).collect()
    assert strict == []  # margin 2.0 < 5.0


# ------------------------------------------------------- rolling_slope
def test_rolling_slope_matches_polyfit(spark, transcripts, transcripts_pdf):
    t = transcripts.withColumn("text_len", F.length("text").cast("double"))
    out = rolling_slope(t, "text_len", n=8, x="turn_idx").select(
        "conv_id", "turn_idx", "roll_slope").toPandas()
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype(float)
    pdf = pdf.sort_values(["conv_id", "ts", "turn_idx"])
    got = out.set_index(["conv_id", "turn_idx"])["roll_slope"]
    checked = 0
    for conv, g in list(pdf.groupby("conv_id"))[:20]:
        x = g["turn_idx"].to_numpy(dtype=float)
        y = g["text_len"].to_numpy()
        for i in range(len(g)):
            lo = max(0, i - 7)
            xv, yv = x[lo:i + 1], y[lo:i + 1]
            v = got.loc[(conv, int(x[i]))]
            if len(xv) < 2 or np.ptp(xv) == 0:
                assert v is None or np.isnan(v)
            else:
                expect = np.polyfit(xv, yv, 1)[0]
                assert abs(v - expect) < 1e-6, (conv, x[i])
            checked += 1
    assert checked > 100


def test_rolling_slope_null_y_skipped(spark):
    df = spark.createDataFrame(
        [("c", 0, "2024-01-01 00:00:00", 1.0),
         ("c", 1, "2024-01-01 00:01:00", None),
         ("c", 2, "2024-01-01 00:02:00", 5.0)],
        "conv_id string, turn_idx int, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = rolling_slope(df, "v", n=8).orderBy("turn_idx").collect()
    assert out[0]["roll_slope"] is None            # single point
    assert out[1]["roll_slope"] is None            # null y pair dropped
    assert abs(out[2]["roll_slope"] - 2.0) < 1e-9  # (0,1),(2,5)


# -------------------------------------------------------- cooccurrence
def test_cooccurrence_counts_and_lift(spark):
    rows = [("c1", "a"), ("c1", "b"), ("c1", "a"),   # dup (c1,a) collapses
            ("c2", "a"), ("c2", "b"), ("c2", "c"),
            ("c3", "a"), ("c4", "b"), ("c4", None), ("c4", "")]
    df = spark.createDataFrame(rows, "conv_id string, tool string")
    out = {(r["item_a"], r["item_b"]): r for r in
           cooccurrence(df, "conv_id", "tool").collect()}
    ab = out[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_ab"]) == (3, 3, 2)
    assert abs(ab["support"] - 2 / 4) < 1e-6
    assert abs(ab["conf_a_b"] - 2 / 3) < 1e-6
    assert abs(ab["lift"] - (2 * 4) / (3 * 3)) < 1e-6
    assert (out[("a", "c")]["n_ab"], out[("b", "c")]["n_ab"]) == (1, 1)
    assert len(out) == 3


def test_cooccurrence_min_group_count_prunes(spark):
    rows = [("c1", "a"), ("c1", "rare"), ("c2", "a"), ("c2", "b"),
            ("c3", "a"), ("c3", "b")]
    df = spark.createDataFrame(rows, "conv_id string, tool string")
    out = cooccurrence(df, "conv_id", "tool", min_group_count=2).collect()
    assert {(r["item_a"], r["item_b"]) for r in out} == {("a", "b")}
