"""Streaming SCD2 (streaming/scd_stream.py): closed intervals emitted
across micro-batches must equal the batch scd2 builder's closed rows."""

import time

import pandas as pd
import pytest

from hipipe_spark.operators.scd import scd2
from hipipe_spark.streaming.scd_stream import scd2_stream


def _mk_input(tmp_path):
    rows = []
    for conv, seq in (("a", ["x", "x", "y", None, None, "y", "y", "z"]),
                      ("b", ["m", "m", "m", "m", "n", "n", "m", "m"])):
        for i, attr in enumerate(seq):
            rows.append((conv, i, 1000.0 + i * 60.0, attr))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "attr"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    d = tmp_path / "scd_in"
    d.mkdir()
    pdf[pdf.turn_idx < 4].to_parquet(d / "part-000.parquet", index=False)
    time.sleep(0.01)
    pdf[pdf.turn_idx >= 4].to_parquet(d / "part-001.parquet", index=False)
    return str(d), pdf


@pytest.mark.parametrize("max_files", [1, 2])
def test_scd2_stream_matches_batch_closed_intervals(spark, tmp_path,
                                                    max_files):
    in_dir, pdf = _mk_input(tmp_path)
    src = (spark.readStream
           .schema("conv_id string, turn_idx int, ts double, attr string")
           .option("maxFilesPerTrigger", max_files).parquet(in_dir))
    out = scd2_stream(src, key="conv_id", ts_col="ts", attr_col="attr",
                      tiebreak="turn_idx")
    qname = f"scd_stream_{max_files}"
    q = (out.writeStream.format("memory").queryName(qname)
         .option("checkpointLocation", str(tmp_path / f"ckpt{max_files}"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"select * from {qname}").toPandas()
           .sort_values(["conv_id", "valid_from"]).reset_index(drop=True))

    batch = scd2(spark.createDataFrame(pdf), "conv_id", "ts", ["attr"],
                 tiebreak="turn_idx").toPandas()
    closed = (batch[batch.valid_to.notna()]
              [["conv_id", "attr", "valid_from", "valid_to"]]
              .sort_values(["conv_id", "valid_from"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["conv_id", "attr", "valid_from", "valid_to"]], closed,
        check_dtype=False)
    # conv a: x, y, NULL, y closed (z open); conv b: m, n closed (m open)
    assert len(got[got.conv_id == "a"]) == 4
    assert len(got[got.conv_id == "b"]) == 2
    # the null-attr version survives the collapse as its own interval
    a = got[got.conv_id == "a"].reset_index(drop=True)
    assert a["attr"].isna().sum() == 1
