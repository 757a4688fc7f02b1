"""Line-level boilerplate removal, deterministic corpus shuffle, and
temperature-based domain mixing — hand-checked miniatures plus the
parallelism-invariance property the north rule demands."""

import pytest
from pyspark.sql import functions as F

from hipipe_spark.functions.hashing import det_hash_i64
from hipipe_spark.operators.boilerplate import (
    line_doc_freq, lines_from_text, remove_frequent_lines,
)
from hipipe_spark.operators.ordering import deterministic_shuffle
from hipipe_spark.operators.sampling import temperature_mixture


def _docs(spark):
    return spark.createDataFrame(
        [(0, "cookie banner\nreal content A\nfooter"),
         (1, "cookie banner\nreal content B\nfooter"),
         (2, "cookie banner\nunique text here"),
         (3, "footer\nfooter\nonly boilerplate doc\ncookie banner"),
         (4, "")],
        "doc_id long, text string",
    ).withColumn("lines", lines_from_text("text"))


def test_line_doc_freq(spark):
    got = {r["line"]: r["df"] for r in line_doc_freq(_docs(spark)).collect()}
    assert got["cookie banner"] == 4
    # within-doc repeat (doc 3 has footer twice) counts ONCE per doc
    assert got["footer"] == 3
    assert got["real content A"] == 1


def test_remove_frequent_lines(spark):
    out = {r["doc_id"]: r for r in
           remove_frequent_lines(_docs(spark), min_docs=3).collect()}
    assert len(out) == 5                       # every doc survives
    assert out[0]["clean_lines"] == ["real content A"]
    assert out[1]["clean_lines"] == ["real content B"]
    assert out[2]["clean_lines"] == ["unique text here"]
    # doc 3: both footers and the banner go; order preserved
    assert out[3]["clean_lines"] == ["only boilerplate doc"]
    assert out[3]["n_lines"] == 4 and out[3]["n_removed"] == 3
    assert out[4]["clean_lines"] == [] and out[4]["n_lines"] == 0


def test_remove_frequent_lines_threshold(spark):
    # min_docs above every df: nothing removed
    out = remove_frequent_lines(_docs(spark), min_docs=5)
    assert out.agg(F.sum("n_removed")).first()[0] == 0
    with pytest.raises(ValueError):
        remove_frequent_lines(_docs(spark), min_docs=1)


def _ints(spark, n=400):
    return spark.range(n).withColumnRenamed("id", "k")


def test_shuffle_rank_is_permutation(spark):
    out = deterministic_shuffle(_ints(spark), "k", seed=1)
    ranks = sorted(r["shuffle_rank"] for r in out.collect())
    assert ranks == list(range(400))


def test_shuffle_rank_matches_global_sort_and_parallelism(spark):
    df = _ints(spark)
    # ground truth: single-partition global sort by the same hash
    truth = {r["k"]: r["rk"] for r in
             df.withColumn("__h", det_hash_i64(F.col("k"), 1))
             .coalesce(1)
             .withColumn("rk", F.row_number().over(
                 __import__("pyspark").sql.Window.orderBy("__h", "k")) - 1)
             .collect()}
    for n_parts in (3, 8):
        got = {r["k"]: r["shuffle_rank"] for r in
               deterministic_shuffle(df, "k", seed=1,
                                     n_partitions=n_parts).collect()}
        assert got == truth, n_parts


def test_shuffle_seed_changes_permutation(spark):
    df = _ints(spark, 100)
    a = {r["k"]: r["shuffle_rank"]
         for r in deterministic_shuffle(df, "k", seed=1).collect()}
    b = {r["k"]: r["shuffle_rank"]
         for r in deterministic_shuffle(df, "k", seed=2).collect()}
    assert a != b and sorted(a.values()) == sorted(b.values())


def _domains(spark):
    # big: 900 rows, small: 100 rows
    return (spark.range(1000)
            .select(F.col("id").alias("k"),
                    F.when(F.col("id") < 900, "big").otherwise("small")
                    .alias("dom")))


def test_temperature_alpha1_is_proportional(spark):
    # alpha=1: every domain gets the SAME rate target/total
    out = temperature_mixture(_domains(spark), "dom", "k",
                              alpha=1.0, target_rows=500, seed=3)
    n = {r["dom"]: r["n"] for r in
         out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    # Bernoulli(0.5) per row, deterministic hash: both near half
    assert 380 <= n["big"] <= 520 and 30 <= n["small"] <= 70


def test_temperature_alpha_flattens(spark):
    out = temperature_mixture(_domains(spark), "dom", "k",
                              alpha=0.3, target_rows=500, seed=3)
    n = {r["dom"]: r["n"] for r in
         out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    # alpha<1 upweights the small domain: its keep RATE must exceed
    # the big domain's
    assert n["small"] / 100 > n["big"] / 900
    # deterministic: second run identical
    out2 = temperature_mixture(_domains(spark), "dom", "k",
                               alpha=0.3, target_rows=500, seed=3)
    assert sorted(r["k"] for r in out.collect()) == \
        sorted(r["k"] for r in out2.collect())


def test_training_set_boilerplate_then_dedup(spark):
    """The CCNet stage ordering: pages differing ONLY in shared
    boilerplate collapse to exact duplicates once the boilerplate is
    stripped, so dedup removes one of them."""
    from hipipe_spark.operators.corpus import CorpusFilter, build_training_set

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu")
    docs = spark.createDataFrame(
        [(0, base + "\ncookie banner"),
         (1, base + "\ncookie banner more words here now ok"),
         (2, "cookie banner\n" + base),          # same content as 0
         (3, "totally different text " + base.upper().lower() + " tail")],
        "doc_id long, text string")
    evals = spark.createDataFrame([(900, "benchmark prompt unrelated")],
                                  "doc_id long, text string")
    flt = CorpusFilter(min_tokens=3, max_dup_2gram=1.0)
    plain = build_training_set(docs, evals, flt=flt, seq_len=8)
    assert sorted(r["doc_id"] for r in plain.select("doc_id").collect()) \
        == [0, 1, 2, 3]
    out = build_training_set(docs, evals, flt=flt, seq_len=8,
                             boilerplate_min_docs=3, shuffle_seed=5)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == [0, 1, 3]                     # 2 deduped against 0
    ranks = sorted(r["shuffle_rank"] for r in out.collect())
    assert ranks == [0, 1, 2]                   # dense global order


def test_temperature_rate_caps_at_one(spark):
    # target far above corpus size: rate clips to 1, everything kept
    out = temperature_mixture(_domains(spark), "dom", "k",
                              alpha=0.5, target_rows=10_000, seed=3)
    assert out.count() == 1000


def test_boilerplate_df_count_partially_aggregates(spark):
    """Hot-line safety: the doc-frequency count must partially
    aggregate map-side, so a line occurring in every document sends at
    most n_partitions rows — not n_docs — to its reducer."""
    df = _docs(spark)
    plan = remove_frequent_lines(df, min_docs=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan


def test_corpus_stages_resumable_parity(spark, tmp_path):
    """The staged corpus build matches build_training_set row-for-row
    and resumes from the dedup snapshot after a simulated crash."""
    import shutil

    from hipipe_spark.checkpoint import ResumablePipeline, SnapshotStore
    from hipipe_spark.operators.corpus import (
        CorpusFilter, build_training_set, corpus_stages,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    evals = docs.filter(F.col("doc_id") % 17 == 0) \
                .select(F.col("doc_id") + 100000, "text") \
                .toDF("doc_id", "text")
    flt = CorpusFilter(min_tokens=5)
    want = sorted(
        tuple(r) for r in
        build_training_set(docs, evals, flt=flt, seq_len=64,
                           boilerplate_min_docs=30, shuffle_seed=2)
        .collect())

    store = SnapshotStore(str(tmp_path / "snaps"))
    stages = corpus_stages(evals, flt=flt, seq_len=64,
                           boilerplate_min_docs=30, shuffle_seed=2)
    pipe = ResumablePipeline(store, stages, run_id="corpus")
    out1 = pipe.run(spark, docs)
    assert sorted(tuple(r) for r in out1.collect()) == want

    # crash before decontaminate: stages 0-1 resume from snapshots
    for i, name in ((2, "decontaminate"), (3, "pack")):
        shutil.rmtree(str(tmp_path / "snaps" / "corpus" / f"{i:02d}_{name}"))
    out2 = pipe.run(spark, docs)
    assert sorted(tuple(r) for r in out2.collect()) == want
