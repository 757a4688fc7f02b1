"""Deterministic sampling operators + dedup prepass equivalence."""

from pyspark.sql import functions as F

from hipipe_spark.operators.sampling import (
    bernoulli_sample, stratified_sample, weighted_mixture)


def test_stratified_exact_counts_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(200)], "k long, s string")
    out = stratified_sample(df, "s", "k", n_per_stratum=30, seed=7)
    counts = {r.s: r.n for r in
              out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 30, "b": 30}
    # identical result at different parallelism
    again = stratified_sample(df.repartition(13), "s", "k", 30, seed=7)
    assert sorted(r.k for r in out.collect()) == \
           sorted(r.k for r in again.collect())


def test_bernoulli_key_level_and_stable(spark):
    # all rows sharing a key are kept or dropped TOGETHER
    df = spark.createDataFrame(
        [(i, i // 3) for i in range(300)], "row_id long, key long")
    out = bernoulli_sample(df, "key", 0.4, seed=3).toPandas()
    per_key = out.groupby("key").size()
    assert (per_key == 3).all()
    # plausible fraction and exact reproducibility
    assert 0.25 < len(out) / 300 < 0.55
    again = bernoulli_sample(df.repartition(7), "key", 0.4, seed=3).toPandas()
    assert sorted(out.row_id) == sorted(again.row_id)


def test_weighted_mixture_tags_and_weights(spark):
    a = spark.range(1000).withColumnRenamed("id", "k")
    b = spark.range(1000, 2000).withColumnRenamed("id", "k")
    out = weighted_mixture([(a, 0.8), (b, 0.1)], key="k", seed=1).toPandas()
    n_a = (out.source == 0).sum()
    n_b = (out.source == 1).sum()
    assert 700 < n_a < 900 and 50 < n_b < 160
    # no shuffle: plan is filters + union only
    plan = weighted_mixture([(a, 0.8), (b, 0.1)], key="k", seed=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_prepass_equivalent_under_closure(spark):
    """MinHash pairs with the exact-dup prepass produce the SAME
    connected components as the naive all-pairs output — star edges are
    closure-equivalent (the dedup-correctness contract of the prepass)."""
    from hipipe_spark.operators.dedup import (
        dedup_clusters, minhash_lsh_pairs)

    docs = spark.createDataFrame(
        [(0, "aaa bbb ccc ddd eee"), (1, "aaa bbb ccc ddd eee"),
         (2, "aaa bbb ccc ddd eee"),            # 3-copy exact cluster
         (3, "aaa bbb ccc ddd fff"),            # near-dup of the cluster
         (4, "zzz yyy xxx www vvv"), (5, "zzz yyy xxx www vvv"),
         (6, "totally unrelated words here now")],
        "doc_id long, text string")
    kw = dict(shingle="word", shingle_k=1, n_hashes=32, bands=16,
              jaccard_threshold=0.5)
    for prepass in (True, False):
        pairs = minhash_lsh_pairs(docs, exact_prepass=prepass, **kw)
        comp = {r["doc_id"]: r["component"]
                for r in dedup_clusters(docs, pairs).collect()}
        assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}, prepass


def test_group_split_purity_and_determinism(transcripts):
    """Every conversation lands in exactly one split; fractions roughly
    match; assignment is identical at any parallelism and frozen under
    corpus growth (hash-stable)."""
    import pyspark.sql.functions as F

    from hipipe_spark.operators.sampling import group_split

    out = group_split(transcripts, "conv_id", seed=5)
    per_conv = (out.groupBy("conv_id")
                   .agg(F.countDistinct("split").alias("n"))
                   .toPandas())
    assert (per_conv["n"] == 1).all()  # no conv straddles splits

    convs = out.select("conv_id", "split").distinct().toPandas()
    frac_train = (convs["split"] == "train").mean()
    assert 0.75 < frac_train < 1.0  # 60 convs, 0.9 target

    a = group_split(transcripts.repartition(3), "conv_id", seed=5) \
        .select("conv_id", "split").distinct().toPandas() \
        .sort_values("conv_id").reset_index(drop=True)
    b = convs.sort_values("conv_id").reset_index(drop=True)
    assert a.equals(b)

    # growing the corpus must not reassign existing groups
    half = transcripts.filter(F.col("turn_idx") % 2 == 0)
    c = group_split(half, "conv_id", seed=5) \
        .select("conv_id", "split").distinct().toPandas()
    merged = c.merge(convs, on="conv_id", suffixes=("_half", "_full"))
    assert (merged["split_half"] == merged["split_full"]).all()


def test_group_split_weights_normalized(spark):
    from hipipe_spark.operators.sampling import group_split

    df = spark.range(1000).withColumnRenamed("id", "g")
    out = group_split(df, "g", splits=(("a", 2.0), ("b", 2.0)), seed=1)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"a", "b"}
    assert abs(counts["a"] - 500) < 100


def test_token_budget_sample_matches_reference(spark):
    import pandas as pd

    from hipipe_spark.functions.hashing import _M
    from hipipe_spark.operators.core import release_cached
    from hipipe_spark.operators.sampling import sample_to_token_budget

    docs = spark.range(200).selectExpr(
        "id AS doc_id", "CAST(id % 37 + 5 AS INT) AS n_tok")
    res = sample_to_token_budget(docs, "doc_id", "n_tok", budget=1000, seed=3)
    out = res.toPandas().sort_values("doc_id").reset_index(drop=True)
    release_cached(res)

    # independent reference: same LCG permutation, sequential prefix
    def h(k, seed=3):
        x = (k + seed) % _M
        for _ in range(2):
            x = (x * 1103515245 + 12345) % _M
        return x

    ref = pd.DataFrame({"doc_id": range(200)})
    ref["n_tok"] = ref["doc_id"] % 37 + 5
    ref["ord"] = ref["doc_id"].map(h) * _M + ref["doc_id"] % _M
    ref = ref.sort_values("ord")
    ref["cum"] = ref["n_tok"].cumsum()
    kept = ref[ref["cum"] <= 1000]

    assert sorted(out["doc_id"]) == sorted(kept["doc_id"])
    assert out["tok_cum"].max() == kept["cum"].max() <= 1000
    got_cum = out.merge(kept[["doc_id", "cum"]], on="doc_id")
    assert (got_cum["tok_cum"] == got_cum["cum"]).all()


def test_token_budget_sample_parallelism_invariant(spark):
    from hipipe_spark.operators.core import release_cached
    from hipipe_spark.operators.sampling import sample_to_token_budget

    docs = spark.range(500).selectExpr(
        "id AS doc_id", "CAST(id % 13 + 1 AS INT) AS n_tok")
    kept = {}
    for nparts in (1, 5, 32):
        res = sample_to_token_budget(docs, "doc_id", "n_tok",
                                     budget=700, seed=9,
                                     n_partitions=nparts)
        kept[nparts] = sorted(r["doc_id"] for r in res.collect())
        release_cached(res)
    assert kept[1] == kept[5] == kept[32] and len(kept[1]) > 0


def test_time_split(spark):
    import datetime as dt

    from hipipe_spark.operators.sampling import time_split

    cut = dt.datetime(2024, 1, 20)
    rows = [
        ("c1", cut - dt.timedelta(days=2)),    # train
        ("c2", cut - dt.timedelta(hours=12)),  # inside embargo -> purged
        ("c3", cut),                           # test (at cutoff)
        ("c4", cut + dt.timedelta(days=1)),    # test
        ("c5", cut - dt.timedelta(days=1)),    # exactly cutoff-embargo -> purged
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    out = {r["conv_id"]: r["split"]
           for r in time_split(df, "2024-01-20 00:00:00",
                               embargo_s=86400.0).collect()}
    assert out == {"c1": "train", "c2": "purged", "c3": "test",
                   "c4": "test", "c5": "purged"}

    # zero embargo: nothing purged
    out0 = {r["conv_id"]: r["split"]
            for r in time_split(df, "2024-01-20 00:00:00").collect()}
    assert "purged" not in out0.values()
