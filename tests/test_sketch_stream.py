"""Streaming CMS ≡ batch cms_sketch per closed window; merged-sketch
point queries."""

import datetime as dt

import pandas as pd

from hipipe_spark.operators.sketches import cms_sketch
from hipipe_spark.streaming.sketch_stream import cms_point_query, cms_stream

BASE = dt.datetime(2026, 1, 1, 12, 0, 0)
D, W = 4, 16


def _mk_files(tmp_path, chunks):
    d = tmp_path / "in"
    d.mkdir()
    for i, chunk in enumerate(chunks):
        pdf = pd.DataFrame(chunk, columns=["item", "ts"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(d / f"p{i}.parquet", index=False)
    return d


def test_cms_stream_matches_batch_per_window(spark, tmp_path):
    w1 = [(v % 30, BASE + dt.timedelta(seconds=v % 500))
          for v in range(400)]
    w2 = [(v % 7, BASE + dt.timedelta(minutes=10, seconds=v % 500))
          for v in range(300)]
    sentinel = [(0, BASE + dt.timedelta(minutes=21))]
    d = _mk_files(tmp_path, (w1, w2, sentinel))

    src = (spark.readStream.schema("item long, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(str(d)))
    q = (cms_stream(src, "item", window="10 minutes",
                    watermark="0 seconds", depth=D, width=W)
         .writeStream.format("memory").queryName("cmss")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cmss").collect()
    by_win = {}
    for r in got:
        by_win.setdefault(r.window_start, {})[(r.d, r.bucket)] = r.cnt

    for rows, start in ((w1, BASE), (w2, BASE + dt.timedelta(minutes=10))):
        batch = spark.createDataFrame([(i,) for i, _ in rows],
                                      "item: long")
        want = {(r.d, r.bucket): r.cnt
                for r in cms_sketch(batch, "item", D, W).collect()}
        assert by_win[start] == want


def test_point_query_on_merged_windows(spark):
    import pyspark.sql.functions as F
    a = spark.createDataFrame([(i % 5,) for i in range(100)], "item: long")
    b = spark.createDataFrame([(i % 3,) for i in range(60)], "item: long")
    merged = (cms_sketch(a, "item", D, W)
              .unionByName(cms_sketch(b, "item", D, W))
              .groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt")))
    items = spark.createDataFrame([(0,), (4,), (99,)], "item: long")
    est = {r.item: r.cms_estimate
           for r in cms_point_query(merged, items, "item", D, W).collect()}
    assert est[0] >= 40          # 20 in a + 20 in b
    assert est[4] >= 20          # only in a
    assert est[99] >= 0          # unseen: 0 unless collisions


def test_point_query_unseen_item_zero_when_no_collision(spark):
    df = spark.createDataFrame([(1,)], "item: long")
    sk = cms_sketch(df, "item", D, 4096)
    items = spark.createDataFrame([(123456,)], "item: long")
    est = cms_point_query(sk, items, "item", D, 4096).collect()[0]
    assert est.cms_estimate == 0  # absent buckets count as zero
