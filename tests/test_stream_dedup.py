"""Streaming exact-dedup: first-seen-wins across micro-batches, state
bounded by the watermark."""

import datetime as dt
import time

import pandas as pd

from hipipe_spark.streaming.dedup_stream import exact_dedup_stream


def test_stream_dedup_across_microbatches(spark, tmp_path):
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows1 = [(1, "alpha doc", base),
             (2, "beta doc", base + dt.timedelta(seconds=10)),
             (3, "alpha doc", base + dt.timedelta(seconds=20))]   # dup in-batch
    rows2 = [(4, "alpha doc", base + dt.timedelta(seconds=30)),   # dup cross-batch
             (5, "gamma doc", base + dt.timedelta(seconds=40))]
    d = tmp_path / "in"
    d.mkdir()
    cols = ["doc_id", "text", "ts"]

    def _write(rows, name):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark reads µs
        pdf.to_parquet(d / name, index=False)

    _write(rows1, "p0.parquet")
    time.sleep(0.01)
    _write(rows2, "p1.parquet")

    src = (spark.readStream
           .schema("doc_id long, text string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(str(d)))
    out = exact_dedup_stream(src, watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select doc_id, text from dedup_stream").toPandas()
    # one row per distinct text, first-seen doc kept
    assert sorted(got["text"]) == ["alpha doc", "beta doc", "gamma doc"]
    assert set(got["doc_id"]) == {1, 2, 5}
