"""IcebergTable seam: snapshot commits, time travel, append semantics
over the SnapshotStore fallback (no Iceberg jars in this container —
the interface contract is what's pinned)."""

import pytest

from hipipe_spark.checkpoint import SnapshotStore
from hipipe_spark.sources.iceberg import (
    IcebergTable, _snap_ts, iceberg_available)


@pytest.fixture()
def table(spark, tmp_path):
    return IcebergTable(spark, "transcripts",
                        store=SnapshotStore(str(tmp_path)))


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"t{i}") for i in range(lo, hi)], "id long, text string")


def test_no_runtime_detected(spark):
    assert iceberg_available(spark) is False  # container has no jars
    with pytest.raises(ValueError):
        IcebergTable(spark, "t")  # fallback requires a store


def test_overwrite_append_read(spark, table):
    table.overwrite(_df(spark, 0, 5))
    assert table.read().count() == 5
    table.append(_df(spark, 5, 8))
    assert table.read().count() == 8
    assert {r.id for r in table.read().collect()} == set(range(8))


def test_time_travel_by_snapshot_and_timestamp(spark, table):
    s1 = table.overwrite(_df(spark, 0, 3))
    s2 = table.append(_df(spark, 3, 6))
    assert table.read(snapshot_id=s1).count() == 3
    assert table.read(snapshot_id=s2).count() == 6
    # as_of between the two commits resolves to the first snapshot
    mid = (_snap_ts(s1) + _snap_ts(s2)) / 2
    assert table.read(as_of=mid).count() == 3
    assert table.read(as_of=_snap_ts(s2) + 1).count() == 6
    with pytest.raises(FileNotFoundError):
        table.read(as_of=_snap_ts(s1) - 10)
    with pytest.raises(ValueError):
        table.read(snapshot_id=s1, as_of=mid)


def test_snapshot_log(spark, table):
    table.overwrite(_df(spark, 0, 2))
    table.append(_df(spark, 2, 3))
    log = table.snapshots()
    assert [m["op"] for m in log] == ["overwrite", "append"]
    assert [m["rows"] for m in log] == [2, 3]
    # ids are chronologically ordered (lexical == commit order)
    assert log[0]["snapshot"] < log[1]["snapshot"]


def test_append_to_empty_table(spark, table):
    table.append(_df(spark, 0, 4))
    assert table.read().count() == 4
