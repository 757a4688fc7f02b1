"""Dedup, similarity, text functions, splits, index mapper, CSV dialect,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hipipe_spark.functions.text import (
    lang_id, quality_score, token_count,
)
from hipipe_spark.operators.core import create, unpack
from hipipe_spark.operators.dedup import (
    embedding_near_pairs, exact_dedup, minhash_lsh_pairs,
    ngram_jaccard_pairs, simhash_near_pairs,
)
from hipipe_spark.operators.groups import (
    build_index_mapper, encode, fixed_groups, generate_groups,
)
from hipipe_spark.operators.similarity import brute_force_topk, lsh_topk


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),        # exact dup
    (2, "the quick brown fox leaps over the lazy dog"),        # near dup
    (3, "completely different content about spark engines"),
    (4, "spark engines about completely different content"),   # bag-dup of 3
    (5, "unrelated short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return create(spark, DOCS, schema="doc_id long, text string")


def test_exact_dedup(docs):
    kept = sorted(unpack(exact_dedup(docs, "text", "doc_id"), "doc_id"))
    assert kept == [0, 2, 3, 4, 5]  # 1 is the exact dup of 0
    canon = sorted(unpack(exact_dedup(docs, "text", "doc_id", canonical=True), "doc_id"))
    assert canon == [0, 2, 3, 5]  # canonical form also folds 4 into 3


def test_minhash_finds_near_dups(docs):
    pairs = minhash_lsh_pairs(docs, shingle="word", shingle_k=1,
                              n_hashes=32, bands=16,
                              jaccard_threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got       # exact dup always caught
    assert (0, 2) in got or (1, 2) in got  # near dup
    assert (3, 4) in got       # word-bag permutation
    assert all(not (a in (0, 1, 2) and b in (3, 4, 5)) for a, b in got)


def test_ngram_jaccard_exact_values(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, n=1, threshold=0.0).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(3, 4)] == 1.0
    # fox-docs share 7 of 9 distinct words (8 distinct each, 'jumps' vs 'leaps')
    assert abs(pairs[(0, 2)] - 7 / 9) < 1e-9


def test_simhash_pairs(docs):
    pairs = {(r.id_a, r.id_b) for r in
             simhash_near_pairs(docs, max_hamming=4).collect()}
    assert (0, 1) in pairs  # identical text → hamming 0


def test_embedding_near_and_topk(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(8)
    vecs = [(0, base.tolist()), (1, (base + 0.01 * rng.randn(8)).tolist()),
            (2, (-base).tolist()), (3, rng.randn(8).tolist())]
    df = create(spark, vecs, schema="vec_id long, embedding array<double>")
    bf = embedding_near_pairs(df, threshold=0.95, brute_force=True).collect()
    assert {(r.id_a, r.id_b) for r in bf} == {(0, 1)}
    lsh = embedding_near_pairs(df, threshold=0.95, n_planes=6).collect()
    assert {(r.id_a, r.id_b) for r in lsh} == {(0, 1)}

    topk = brute_force_topk(df, df.filter("vec_id = 0"), k=2)
    rows = sorted((r.rank, r.neighbor_id) for r in topk.collect())
    assert rows[0] == (1, 1)  # nearest neighbor of 0 is its perturbed copy

    # numpy (BLAS matmul) impl must agree with the JVM expression impl
    np_topk = brute_force_topk(df, df.filter("vec_id = 0"), k=2, impl="numpy")
    np_rows = sorted((r.rank, r.neighbor_id) for r in np_topk.collect())
    assert np_rows == rows
    jvm_cos = {r.neighbor_id: round(r.cosine, 9) for r in topk.collect()}
    np_cos = {r.neighbor_id: round(r.cosine, 9) for r in np_topk.collect()}
    assert jvm_cos == np_cos

    # LSH top-k finds the true nearest with multiprobe on this tiny set
    lshk = lsh_topk(df, df.filter("vec_id = 0"), k=1, n_planes=4)
    assert [r.neighbor_id for r in lshk.collect()] == [1]


def test_text_functions(spark):
    df = create(spark, [("the cat is on the mat",), ("el gato y la casa de que",),
                        ("",), ("!!! ??? ...",)],
                schema="text string")
    out = df.select(
        token_count(F.col("text")).alias("n"),
        lang_id(F.col("text")).alias("lang"),
        F.round(quality_score(F.col("text")), 3).alias("q"),
    ).collect()
    assert [r.n for r in out] == [6, 7, 0, 3]
    assert out[0].lang == "en"
    assert out[1].lang == "es"
    assert out[2].lang == "und"
    assert out[0].q > out[3].q  # prose scores above punctuation soup


def test_generate_groups_exact_counts(spark):
    # reference groups.hpp:43-48: size 10, ratio {2,2,6} → exactly 2,2,6
    df = spark.range(10).withColumnRenamed("id", "k")
    out = generate_groups(df, "k", [2, 2, 6], seed=1)
    counts = {r.group: r.n for r in out.groupBy("group").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 2, 1: 2, 2: 6}


def test_generate_groups_multi(spark):
    """reference groups.hpp:97-104 example: n clusterings over volatile
    [2,1] + fixed [2]; the fixed group label (2) is identical in every
    clustering, volatile rows re-split with exact counts per
    clustering, and clusterings actually differ."""
    from hipipe_spark.operators.groups import generate_groups_multi

    df = spark.range(40).withColumnRenamed("id", "k")
    out = generate_groups_multi(df, "k", n=3, volatile_ratio=[2, 1],
                                fixed_ratio=[2], seed=5).toPandas()
    gcols = ["group_0", "group_1", "group_2"]
    # fixed rows: label 2 in every clustering, same row set
    fixed_rows = out[out.group_0 == 2]
    assert (fixed_rows[gcols] == 2).all().all()
    # exact initial counts: ratio [2,1,2] over 40 → 16, 8, 16
    assert len(fixed_rows) == 16
    v = out[out.group_0 != 2]
    assert len(v) == 24
    for c in gcols:
        # volatile re-split [2,1] over 24 → exactly 16 / 8
        counts = v[c].value_counts().to_dict()
        assert counts == {0: 16, 1: 8}, (c, counts)
        assert (out[c] == 2).sum() == 16  # fixed set identical per col
    # clusterings are not all identical
    assert not (out["group_0"] == out["group_1"]).all() or \
           not (out["group_0"] == out["group_2"]).all()


def test_fixed_groups_stable(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    a = {r.k: r.group for r in fixed_groups(df, "k", 4, seed=9).collect()}
    b = {r.k: r.group for r in fixed_groups(df.repartition(13), "k", 4, seed=9).collect()}
    assert a == b


def test_index_mapper_roundtrip(spark):
    df = create(spark, [("b",), ("a",), ("c",), ("a",)], schema="v string")
    m = build_index_mapper(df, "v")
    assert {r["value"]: r["index"] for r in m.collect()} == {"a": 0, "b": 1, "c": 2}
    enc = encode(df, "v", m)
    assert sorted(unpack(enc, "v_idx")) == [0, 0, 1, 2]


def test_csv_dialect(spark, tmp_path):
    # reference csv.hpp:30-38: backslash-escaped quotes, trim unquoted
    p = tmp_path / "t.csv"
    p.write_text('Id, A ,"Quoted \\"column\\""\n 1 , a1 ,"x,\\"y\\""\n2,b2, z \n')
    from hipipe_spark.sources.csv import read_csv, typed
    df = read_csv(spark, str(p))
    assert df.columns == ["Id", "A", 'Quoted "column"']
    rows = df.orderBy("Id").collect()
    assert rows[0].A == "a1"
    assert rows[0]['Quoted "column"'] == 'x,"y"'
    assert rows[1]['Quoted "column"'] == "z"
    t = typed(df, {"Id": "int"})
    assert sorted(unpack(t, "Id")) == [1, 2]


def test_csv_write_roundtrip(spark, tmp_path):
    from hipipe_spark.sources.csv import read_csv, write_csv
    df = create(
        spark,
        [("1", 'needs, quoting'), ("2", 'has "quotes"'), ("3", "plain")],
        schema="id string, payload string",
    )
    out = str(tmp_path / "out_csv")
    write_csv(df, out)
    back = read_csv(spark, out)
    a = {r.id: r.payload for r in back.collect()}
    assert a == {"1": "needs, quoting", "2": 'has "quotes"', "3": "plain"}


def test_multimodal_plumbing(spark):
    from hipipe_spark.sources.multimodal import extract_features, gen_fake_media
    media = gen_fake_media(spark, n=12)
    feats = extract_features(media, frame_sample_ms=500).toPandas()
    assert len(feats) == 12
    assert (feats["n_bytes"] > 0).all()
    assert set(feats["kind"]) == {"image", "audio", "video"}
    assert (feats.loc[feats.kind == "video", "n_frames"] > 0).all()
    assert (feats.loc[feats.kind != "video", "n_frames"] == 0).all()
    with pytest.raises(NotImplementedError):
        extract_features(media, decoder="pil")


def test_connected_components_vs_union_find(spark):
    import random

    from hipipe_spark.operators.dedup import connected_components

    rng = random.Random(7)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    # python union-find oracle
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}
    # min-id canonicalization: find() roots are already component minima
    # because unions always point the larger root at the smaller one
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pdf = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(pdf, nodes, node_col="id").collect()}
    assert got == want


def test_ngram_containment_catches_quotes(spark):
    from hipipe_spark.operators.core import release_cached
    from hipipe_spark.operators.dedup import ngram_containment_pairs

    data = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "beta gamma delta"),          # fully contained in 0
        (2, "omega psi chi"),             # unrelated
        (3, "gamma delta omega"),         # partial overlap with 0 and 2
    ]
    df = create(spark, data, schema="doc_id long, text string")

    res = ngram_containment_pairs(df, threshold=0.9)
    got = {(r.id_a, r.id_b): (r.c_a_in_b, r.c_b_in_a) for r in res.collect()}
    release_cached(res)
    # jaccard(0,1) = 3/8 < 0.5 would MISS the quote; containment = 1.0
    assert got == {(0, 1): (3 / 8, 1.0)}

    res0 = ngram_containment_pairs(df, threshold=0.0)
    got0 = {(r.id_a, r.id_b): (r.c_a_in_b, r.c_b_in_a) for r in res0.collect()}
    release_cached(res0)
    assert got0[(0, 3)] == (2 / 8, 2 / 3)
    assert got0[(2, 3)] == (1 / 3, 1 / 3)
    assert (0, 2) not in got0  # no shared gram -> never a candidate


def test_dedup_clusters_keep_best(spark):
    """keep_by: canonical = best quality (desc), ties -> min id;
    asc mode inverts; singletons always keep."""
    from hipipe_spark.operators.dedup import dedup_clusters
    docs = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a a", 9.0), (3, "a b", 9.0),  # one cluster
         (7, "zzz", 1.0)],                                  # singleton
        "doc_id long, text string, q double")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long")
    best = {r.doc_id: r.keep
            for r in dedup_clusters(docs, pairs, keep_by="q").collect()}
    # q=9.0 tie between 2 and 3 -> min id 2 wins; singleton 7 keeps
    assert best == {1: False, 2: True, 3: False, 7: True}
    worst = {r.doc_id: r.keep
             for r in dedup_clusters(docs, pairs, keep_by="q",
                                     keep_order="asc").collect()}
    assert worst == {1: True, 2: False, 3: False, 7: True}
    minid = {r.doc_id: r.keep
             for r in dedup_clusters(docs, pairs).collect()}
    assert minid == {1: True, 2: False, 3: False, 7: True}
    with pytest.raises(ValueError):
        dedup_clusters(docs, pairs, keep_by="q", keep_order="sideways")
