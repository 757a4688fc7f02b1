"""applyInPandasWithState stateful streaming operator.

Cross-micro-batch keyed state: session ids / gaps / cumulative counts
must be identical to the batch Sessionize computation over the full
table, even when the stream delivers the data one file per trigger.
This is the fault-tolerant upgrade of hipipe's mutable-lambda stateful
transform idiom (/root/reference/test/core/stream/transform1.cpp:156-179).
"""

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hipipe_spark.streaming.session_stream import stateful_session_stream

GAP = 100.0


def _mk_input(tmp_path):
    """Two time-ordered chunks per conversation, one file each — the
    second file's first turns continue sessions opened in the first."""
    rows = []
    for conv in ["a", "b"]:
        base = 1000.0 if conv == "a" else 5000.0
        ts = base
        for i in range(12):
            ts += 250.0 if i % 4 == 3 else 10.0  # gap every 4th turn
            rows.append((conv, i, ts))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    d = tmp_path / "stream_in"
    d.mkdir()
    first = pdf[pdf.turn_idx < 6]
    second = pdf[pdf.turn_idx >= 6]
    first.to_parquet(d / "part-000.parquet", index=False)
    time.sleep(0.01)
    second.to_parquet(d / "part-001.parquet", index=False)
    return str(d), pdf


def _expected(pdf):
    out = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"])
        gaps = g["ts"].diff()
        sess = (gaps > GAP).cumsum()
        out.append(pd.DataFrame({
            "conv_id": conv, "turn_idx": g["turn_idx"], "ts": g["ts"],
            "session_id": sess.astype("int64"),
            "time_since_prev": gaps,
            "turns_seen": range(1, len(g) + 1),
        }))
    return pd.concat(out).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.mark.parametrize("max_files", [1, 2])
def test_stateful_session_stream_matches_batch(spark, tmp_path, max_files):
    in_dir, pdf = _mk_input(tmp_path)
    src = (spark.readStream.schema("conv_id string, turn_idx int, ts double")
           .option("maxFilesPerTrigger", max_files).parquet(in_dir))
    out = stateful_session_stream(src, gap_seconds=GAP)
    qname = f"stateful_sess_{max_files}"
    q = (out.writeStream.format("memory").queryName(qname)
         .option("checkpointLocation", str(tmp_path / f"ckpt{max_files}"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"select * from {qname}").toPandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    exp = _expected(pdf)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "session_id", "turns_seen"]].astype(
            {"session_id": "int64", "turns_seen": "int64"}),
        exp[["conv_id", "turn_idx", "session_id", "turns_seen"]].astype(
            {"session_id": "int64", "turns_seen": "int64"}))
    # gaps match (NaN on each conversation's first turn)
    assert ((got["time_since_prev"].fillna(-1) - exp["time_since_prev"].fillna(-1))
            .abs() < 1e-9).all()
