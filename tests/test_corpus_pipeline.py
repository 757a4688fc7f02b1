"""End-to-end training-corpus build: filter → dedup → decontaminate →
pack, checked against a hand-computable miniature corpus."""

from pyspark.sql import functions as F

from hipipe_spark.operators.corpus import CorpusFilter, build_training_set

SEQ = 8

LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"   # 10 toks
LONG_B = "one two three four five six seven eight nine ten eleven"    # 11 toks
REPEAT = "spam ham spam ham spam ham spam ham spam ham spam ham"      # dup-heavy
SHORT = "too short"
CONTAM = "the secret benchmark answer is forty two exactly here now"  # 10 toks


def _frames(spark):
    train = spark.createDataFrame(
        [(1, LONG_A), (2, LONG_B), (3, LONG_A),   # 3 dups 1
         (4, REPEAT), (5, SHORT), (6, CONTAM)],
        "doc_id int, text string")
    ev = spark.createDataFrame(
        [(100, "we know the secret benchmark answer is forty two")],
        "doc_id int, text string")
    return train, ev


def test_build_training_set_stages(spark):
    train, ev = _frames(spark)
    out = build_training_set(
        train, ev, flt=CorpusFilter(min_tokens=10, max_dup_2gram=0.3),
        contam_n=3, contam_min_hits=2, seq_len=SEQ,
    ).orderBy("doc_id").collect()
    # short doc (5) dropped by min_tokens; repeat doc (4) by dup-2gram;
    # dup doc (3) by exact dedup (min id 1 kept); contaminated doc (6)
    # shares >=2 distinct 3-grams with the eval doc -> anti-joined.
    assert [r["doc_id"] for r in out] == [1, 2]
    a, b = out
    assert a["n_tok"] == 10 and a["tok_offset"] == 0
    assert a["chunk_first"] == 0 and a["chunk_last"] == 1  # 10 > SEQ=8
    assert a["n_chunks"] == 2
    assert b["tok_offset"] == 10
    assert b["chunk_first"] == 1 and b["chunk_last"] == 2
    assert b["n_chunks"] == 2


def test_quality_keep_threshold_is_pure_filter(spark):
    """quality_keep must not change schema or row content."""
    from hipipe_spark.operators.corpus import quality_keep
    train, _ = _frames(spark)
    kept = quality_keep(train, flt=CorpusFilter(min_tokens=1,
                                                max_dup_2gram=1.0))
    assert kept.columns == train.columns
    assert kept.count() == train.count()


def test_build_training_set_near_dedup(spark):
    """near_dedup=True drops high-Jaccard variants, keeping min id."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    near = base + " phi"          # tiny suffix -> high char-shingle overlap
    other = "completely different words entirely here about nothing shared"
    train = spark.createDataFrame(
        [(1, base), (2, near), (3, other + " padded to ten tokens ok")],
        "doc_id int, text string")
    ev = spark.createDataFrame([(100, "irrelevant eval doc")],
                               "doc_id int, text string")
    out = build_training_set(
        train, ev, flt=CorpusFilter(min_tokens=5, max_dup_2gram=1.0),
        contam_n=3, contam_min_hits=2, seq_len=SEQ,
        near_dedup=True,
        minhash_kwargs={"jaccard_threshold": 0.5, "n_hashes": 64,
                        "bands": 32},
    ).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 3]


def test_source_report_shares(spark):
    from hipipe_spark.operators.corpus import source_report
    docs = spark.createDataFrame(
        [(1, "a b c", "en", "s1"), (2, "d e", "en", "s1"),
         (3, "f", "de", "s2"), (4, "", "de", "s2")],
        "doc_id long, text string, lang string, source string")
    out = {(r.source, r.lang): r.asDict()
           for r in source_report(docs).collect()}
    s1 = out[("s1", "en")]
    assert (s1["n_docs"], s1["n_tokens"], s1["n_chars"]) == (2, 5, 8)
    assert s1["doc_share"] == 0.5
    assert s1["token_share"] == round(5 / 6, 6)
    s2 = out[("s2", "de")]
    assert (s2["n_docs"], s2["n_tokens"]) == (2, 1)
    assert abs(sum(v["doc_share"] for v in out.values()) - 1.0) < 1e-9


def test_cap_per_group(spark):
    from hipipe_spark.operators.corpus import cap_per_group
    import pytest as _pt
    docs = spark.createDataFrame(
        [(i, "s1", float(i % 3)) for i in range(10)]
        + [(100, "s2", 9.0)],
        "doc_id long, source string, q double")
    kept = cap_per_group(docs, "source", cap=4, order_by="q")
    s1 = sorted(r.doc_id for r in kept.filter("source = 's1'").collect())
    # q desc: ids 2,5,8 have q=2.0; then q=1.0 ids 1,4,7 -> tie min id 1
    assert s1 == [1, 2, 5, 8]
    assert [r.doc_id for r in kept.filter("source = 's2'").collect()] == [100]
    # order_by=None: deterministic min-id cap
    s1_ids = sorted(r.doc_id for r in cap_per_group(docs, "source", cap=3)
                    .filter("source = 's1'").collect())
    assert s1_ids == [0, 1, 2]
    with _pt.raises(ValueError):
        cap_per_group(docs, "source", cap=0)
