"""Streaming source: spark.readStream.format("bigtable") tails the cells
store by file arrival — completing the format triad (batch read, batch
write, stream read)."""

from __future__ import annotations

import pytest

from datafusion_bigtable_spark.sources import datasource as bt_ds
from datafusion_bigtable_spark.sources.datasource import BigtableStreamReader


@pytest.fixture(scope="module")
def registered(spark):
    bt_ds.register(spark)
    return spark


OPTS = {
    "column_family": "measurements",
    "columns": "pressure:int64,temperature:string",
    "table_partition_cols": "region,balloon_id,event_minute",
    "only_read_latest": "false",
}


def _write_initial(registered, cells_path, dest):
    src = registered.read.format("bigtable").options(path=cells_path, **OPTS).load()
    src.write.format("bigtable").options(path=dest, **OPTS).mode("append").save()
    return src


def test_stream_tails_file_arrivals(registered, cells_path, tmp_path):
    dest = str(tmp_path / "stream_store")
    src = _write_initial(registered, cells_path, dest)

    stream = registered.readStream.format("bigtable").options(path=dest, **OPTS).load()
    q = stream.writeStream.format("memory").queryName("t_bt_stream").outputMode("append").start()
    try:
        q.processAllAvailable()
        first = registered.table("t_bt_stream").count()
        assert first == 5  # the full initial store

        # new cells arrive via the batch writer → exactly the delta streams
        newer = src.filter("event_minute >= '2021-03-05-1203'").selectExpr(
            "region", "balloon_id", "event_minute",
            "_timestamp + INTERVAL 1 HOUR AS _timestamp", "pressure", "temperature",
        )
        newer.write.format("bigtable").options(path=dest, **OPTS).mode("append").save()
        q.processAllAvailable()
        rows = registered.table("t_bt_stream").collect()
        assert len(rows) == 7  # 5 + 2 appended, nothing reprocessed
        assert sum(1 for r in rows if r.event_minute == "2021-03-05-1204") == 2
    finally:
        q.stop()


def test_stream_replay_between_offsets(registered, cells_path, tmp_path):
    dest = str(tmp_path / "replay_store")
    _write_initial(registered, cells_path, dest)
    r = BigtableStreamReader(None, {"path": dest, **OPTS})
    start = r.initialOffset()
    rows, end = r.read(start)
    rows = list(rows)
    assert len(rows) == 5
    # deterministic replay of the same batch (checkpoint recovery path)
    assert sorted(list(r.readBetweenOffsets(start, end))) == sorted(rows)
    # nothing new → empty batch, stable offset
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == end


def test_stream_requires_unnest_mode(tmp_path):
    with pytest.raises(ValueError, match="only_read_latest=false"):
        BigtableStreamReader(None, {"path": str(tmp_path), **{**OPTS, "only_read_latest": "true"}})
