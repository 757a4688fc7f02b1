"""Round-3c operators: interval_join, categorical_entropy, make_labels,
chunk_overlap, distributed PCA / covariance_matrix."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hipipe_spark.operators.decomposition import (
    apply_pca, covariance_matrix, fit_pca,
)
from hipipe_spark.operators.features import categorical_entropy, make_labels
from hipipe_spark.operators.joins import interval_join
from hipipe_spark.operators.packing import chunk_overlap


# ------------------------------------------------------------ fixtures
@pytest.fixture(scope="module")
def ev(spark):
    """60 events across 5 users, deterministic."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for e in range(60):
        u = e % 5
        rows.append((e, u, base + dt.timedelta(minutes=7 * e + u),
                     ["view", "click", "purchase"][(e * 7 + u) % 3],
                     float(e)))
    return spark.createDataFrame(
        rows, "event_id int, user_id int, ts timestamp, etype string, "
        "value double").cache()


@pytest.fixture(scope="module")
def intervals(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(5):
        for k in range(3):
            start = base + dt.timedelta(hours=2 * k + u)
            rows.append((u, 10 * u + k, start,
                         start + dt.timedelta(minutes=90)))
    return spark.createDataFrame(
        rows, "user_id int, iv_id int, win_start timestamp, "
        "win_end timestamp").cache()


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# --------------------------------------------------------- interval_join
@pytest.mark.parametrize("closed", ["left", "both"])
@pytest.mark.parametrize("slice_seconds", [600, 3600, 7200])
def test_interval_join_matches_predicate_join(ev, intervals, closed,
                                              slice_seconds):
    cols = ["event_id", "iv_id"]
    bucketed = interval_join(
        ev, intervals, time_col="ts", start_col="win_start",
        end_col="win_end", on="user_id", slice_seconds=slice_seconds,
        closed=closed)
    plain = interval_join(
        ev, intervals, time_col="ts", start_col="win_start",
        end_col="win_end", on="user_id", slice_seconds=None,
        closed=closed)
    got, want = _sorted_rows(bucketed, cols), _sorted_rows(plain, cols)
    assert got == want and len(got) > 0


def test_interval_join_left_keeps_unmatched(ev, intervals):
    tight = intervals.withColumn(
        "win_end", F.col("win_start") + F.expr("INTERVAL 1 MINUTE"))
    out = interval_join(
        ev, tight, time_col="ts", start_col="win_start",
        end_col="win_end", on="user_id", slice_seconds=3600, how="left")
    plain = interval_join(
        ev, tight, time_col="ts", start_col="win_start",
        end_col="win_end", on="user_id", slice_seconds=None, how="left")
    cols = ["event_id", "iv_id"]
    assert _sorted_rows(out, cols) == _sorted_rows(plain, cols)
    # every event appears (matched or with null interval cols)
    assert out.select("event_id").distinct().count() == ev.count()


def test_interval_join_no_keys(spark, ev, intervals):
    """Global (key-less) range join: slices alone carry the equi-join."""
    iv1 = intervals.filter(F.col("iv_id") == 0).drop("user_id")
    out = interval_join(ev, iv1, time_col="ts", start_col="win_start",
                        end_col="win_end", slice_seconds=1800)
    plain = interval_join(ev, iv1, time_col="ts", start_col="win_start",
                          end_col="win_end", slice_seconds=None)
    assert _sorted_rows(out, ["event_id"]) == _sorted_rows(plain, ["event_id"])


def test_interval_join_validation(ev, intervals):
    with pytest.raises(ValueError):
        interval_join(ev, intervals, time_col="ts", start_col="win_start",
                      end_col="win_end", how="full")
    with pytest.raises(ValueError):
        interval_join(ev, intervals, time_col="ts", start_col="win_start",
                      end_col="win_end", closed="right")
    with pytest.raises(ValueError):
        interval_join(ev, intervals, time_col="ts", start_col="win_start",
                      end_col="win_end", slice_seconds=0)


# --------------------------------------------------- categorical_entropy
def test_entropy_known_distribution(spark):
    rows = [("a", "x")] * 2 + [("a", "y")] * 2 + [("b", "x")] * 4
    df = spark.createDataFrame(rows, "k string, c string")
    out = {r["k"]: r.asDict() for r in
           categorical_entropy(df, "k", "c").collect()}
    assert out["a"]["n"] == 4 and out["a"]["n_cats"] == 2
    assert out["a"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert out["a"]["norm_entropy"] == pytest.approx(1.0, abs=1e-6)
    # single category: entropy 0, norm guarded to 0 (not 0/0)
    assert out["b"]["entropy"] == pytest.approx(0.0, abs=1e-6)
    assert out["b"]["norm_entropy"] == 0.0


def test_entropy_matches_numpy(ev):
    out = {r["user_id"]: r["entropy"] for r in
           categorical_entropy(ev, "user_id", "etype").collect()}
    pdf = ev.toPandas()
    for u, grp in pdf.groupby("user_id"):
        p = grp["etype"].value_counts(normalize=True).to_numpy()
        want = float(-(p * np.log(p)).sum())
        assert out[u] == pytest.approx(want, abs=1e-6)


# ---------------------------------------------------------- make_labels
def test_make_labels_reads_future(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [("c", i, base + dt.timedelta(seconds=s))
            for i, s in enumerate([0, 10, 2000, 2030])]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, "
                               "ts timestamp")
    out = {r["turn_idx"]: r.asDict() for r in
           make_labels(df, "conv_id", order_cols=("turn_idx",),
                       gap=1800.0).collect()}
    assert out[0]["label_next_gap"] == 10.0
    assert out[1]["label_next_gap"] == 1990.0
    assert out[1]["label_session_end"] is True  # 1990 > 1800
    assert out[2]["label_session_end"] is False
    assert out[3]["label_is_last"] is True
    assert out[3]["label_next_gap"] is None
    assert out[3]["label_session_end"] is True


def test_labels_never_leak_into_features(transcripts, profiles):
    from hipipe_spark.operators.flagship import featurize
    feat_cols = set(featurize(transcripts, profiles=profiles).columns)
    assert not any(c.startswith("label_") for c in feat_cols)


# -------------------------------------------------------- chunk_overlap
def _ref_chunks(toks, w, s):
    n = len(toks)
    if n == 0:
        return []
    last = s * max(0, math.ceil((n - w) / s))
    return [(ci, st, toks[st:st + w])
            for ci, st in enumerate(range(0, last + 1, s))]


@pytest.mark.parametrize("w,s", [(4, 2), (4, 4), (5, 1), (3, 3), (50, 30)])
def test_chunk_overlap_matches_reference(spark, w, s):
    docs = [("d%d" % i, [f"t{j}" for j in range(n)])
            for i, n in enumerate([0, 1, 3, 4, 5, 9, 10, 17, 100])]
    df = spark.createDataFrame(docs, "doc_id string, toks array<string>")
    out = chunk_overlap(df, "toks", window=w, stride=s)
    got = {(r["doc_id"], r["chunk_idx"]):
           (r["chunk_start"], list(r["chunk"]), r["chunk_len"])
           for r in out.collect()}
    want = {}
    for doc_id, toks in docs:
        for ci, st, chunk in _ref_chunks(toks, w, s):
            want[(doc_id, ci)] = (st, chunk, len(chunk))
    assert got == want


def test_chunk_overlap_covers_every_token(spark):
    df = spark.createDataFrame(
        [("d", [f"t{j}" for j in range(37)])],
        "doc_id string, toks array<string>")
    out = chunk_overlap(df, "toks", window=10, stride=7).collect()
    seen = set()
    for r in out:
        seen.update(range(r["chunk_start"], r["chunk_start"] + r["chunk_len"]))
    assert seen == set(range(37))
    # no chunk is a pure suffix of the previous one (no redundant tail)
    starts = sorted(r["chunk_start"] for r in out)
    assert starts == [0, 7, 14, 21, 28]  # ceil((37-10)/7)=4 → last 28


def test_chunk_overlap_validation(spark):
    df = spark.createDataFrame([("d", ["a"])],
                               "doc_id string, toks array<string>")
    with pytest.raises(ValueError):
        chunk_overlap(df, "toks", window=0)
    with pytest.raises(ValueError):
        chunk_overlap(df, "toks", window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_overlap(df, "toks", window=4, stride=0)


# ------------------------------------------------------------------ PCA
@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(300, 12)) @ rng.normal(size=(12, 12))
    return (spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id int, embedding array<double>").repartition(5).cache(), X)


def test_covariance_matrix_matches_numpy(emb):
    df, X = emb
    out = {(r["i"], r["j"]): r["cov"] for r in
           covariance_matrix(df, "embedding", dims=6).collect()}
    want = np.cov(X[:, :6], rowvar=False)
    assert len(out) == 21
    for (i, j), v in out.items():
        assert v == pytest.approx(want[i, j], abs=1e-5)


def test_fit_pca_matches_numpy(emb):
    df, X = emb
    model = fit_pca(df, "embedding", k=4)
    assert np.allclose(model["mean"], X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    want = evecs[:, order].T
    for r in range(4):
        m = np.argmax(np.abs(want[r]))
        if want[r, m] < 0:
            want[r] = -want[r]
    assert np.allclose(model["components"], want, atol=1e-8)
    assert np.allclose(model["explained_var"], evals[order], atol=1e-8)
    assert 0 < sum(model["explained_var_ratio"]) <= 1.0 + 1e-9


def test_apply_pca_matches_numpy(emb):
    df, X = emb
    model = fit_pca(df, "embedding", k=3)
    out = apply_pca(df, "embedding", model).orderBy("vec_id").collect()
    V = np.asarray(model["components"])
    want = (X - np.asarray(model["mean"])) @ V.T
    got = np.asarray([[r["pc0"], r["pc1"], r["pc2"]] for r in out])
    assert np.allclose(got, want, atol=1e-8)


def test_apply_pca_whitened_unit_variance(emb):
    df, X = emb
    model = fit_pca(df, "embedding", k=3)
    out = apply_pca(df, "embedding", model, whiten=True)\
        .orderBy("vec_id").collect()
    got = np.asarray([[r["pc0"], r["pc1"], r["pc2"]] for r in out])
    V = np.asarray(model["components"])
    want = ((X - np.asarray(model["mean"])) @ V.T
            / np.sqrt(np.asarray(model["explained_var"])))
    assert np.allclose(got, want, atol=1e-8)
    # whitened components have unit sample variance
    assert np.allclose(got.var(axis=0, ddof=1), 1.0, atol=1e-6)


def test_fit_pca_validation(emb):
    df, _ = emb
    with pytest.raises(ValueError):
        fit_pca(df, "embedding", k=0)
    with pytest.raises(ValueError):
        fit_pca(df, "embedding", k=13)
    with pytest.raises(ValueError):
        fit_pca(df.limit(0), "embedding", k=2)
