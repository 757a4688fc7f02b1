"""Streaming quality filter + PII scrub: micro-batch output must equal
the batch operator on the union of all files."""

import pandas as pd

from hipipe_spark.operators.corpus import CorpusFilter
from hipipe_spark.streaming.quality_stream import quality_filter_stream

ROWS = [
    (1, "alpha beta gamma delta epsilon zeta"),                 # keeps
    (2, "spam ham " * 6),                                       # dup-heavy
    (3, "short"),                                               # too short
    (4, "contact carol@example.org for data access details ok"),  # scrubbed
    (5, "one two three four five six seven eight"),             # keeps
]
FLT = CorpusFilter(min_tokens=6, max_dup_2gram=0.3)


def test_stream_matches_batch(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    for i, chunk in enumerate((ROWS[:2], ROWS[2:])):
        pd.DataFrame(chunk, columns=["doc_id", "text"]).to_parquet(
            d / f"p{i}.parquet", index=False)

    batch_in = spark.read.schema("doc_id long, text string").parquet(str(d))
    expect = {r["doc_id"]: r["text"]
              for r in quality_filter_stream(batch_in, flt=FLT).collect()}

    src = (spark.readStream.schema("doc_id long, text string")
           .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (quality_filter_stream(src, flt=FLT)
         .writeStream.format("memory").queryName("qstream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["text"]
           for r in spark.sql("select * from qstream").collect()}

    assert got == expect
    assert set(got) == {1, 4, 5}
    assert got[4] == "contact <EMAIL> for data access details ok"


def test_corpus_ingest_stream_filters_then_dedups(spark, tmp_path):
    """Full streaming ingest: quality filter + scrub + watermarked
    dedup; a rejected doc never reaches dedup state, a duplicate of a
    kept doc is dropped even across micro-batches."""
    import datetime as dt

    from hipipe_spark.streaming.quality_stream import corpus_ingest_stream

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows1 = [(1, "alpha beta gamma delta epsilon zeta", base),
             (2, "short", base + dt.timedelta(seconds=5))]
    rows2 = [(3, "alpha beta gamma delta epsilon zeta",   # dup of 1
              base + dt.timedelta(seconds=10)),
             (4, "one two three four five six seven",
              base + dt.timedelta(seconds=15))]
    d = tmp_path / "in"
    d.mkdir()
    for i, chunk in enumerate((rows1, rows2)):
        pdf = pd.DataFrame(chunk, columns=["doc_id", "text", "ts"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(d / f"p{i}.parquet", index=False)

    src = (spark.readStream.schema("doc_id long, text string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (corpus_ingest_stream(src, flt=FLT, watermark="10 minutes")
         .writeStream.format("memory").queryName("ingest_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"] for r in
           spark.sql("select doc_id from ingest_stream").collect()}
    assert got == {1, 4}
