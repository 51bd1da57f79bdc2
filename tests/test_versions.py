"""Version-unnest cardinality tests — SURVEY §7 hard part 5.

With ``only_read_latest=False`` the output has one row per distinct
(row_key, ts), NOT per logical row: cells written at different timestamps
produce separate rows with NULL holes (reference src/execute_plan.rs:223-271
semantics, with our NULL-not-empty-bytes deviation)."""

from __future__ import annotations

import dataclasses
import datetime as dt

from datafusion_bigtable_spark.config import BigtableTableConfig, ColumnSpec
from datafusion_bigtable_spark.operators.pivot import latest_cells
from datafusion_bigtable_spark.sources.bigtable_table import BigtableTable
from datafusion_bigtable_spark.sources.cells import CELLS_SCHEMA

T0 = dt.datetime(2021, 1, 1, 0, 0, 0)
T1 = dt.datetime(2021, 1, 1, 0, 0, 1)
T2 = dt.datetime(2021, 1, 1, 0, 0, 2)


def _table(spark, tmp_path, only_read_latest):
    cells = [
        # key k1: pressure written at T0 and T1 (two versions), temp at T1 only
        ("k1", "f", "p", T0, (100).to_bytes(8, "big", signed=True)),
        ("k1", "f", "p", T1, (101).to_bytes(8, "big", signed=True)),
        ("k1", "f", "t", T1, b"a"),
        # key k2: both qualifiers at T2
        ("k2", "f", "p", T2, (200).to_bytes(8, "big", signed=True)),
        ("k2", "f", "t", T2, b"b"),
    ]
    path = str(tmp_path / f"cells_{only_read_latest}.parquet")
    spark.createDataFrame(cells, CELLS_SCHEMA).write.parquet(path)
    cfg = BigtableTableConfig(
        table="vtest",
        column_family="f",
        columns=(ColumnSpec("p", "int64"), ColumnSpec("t", "string")),
        table_partition_cols=("_row_key",),
        only_read_latest=only_read_latest,
        cells_path=path,
        allow_full_scan=True,
    )
    return BigtableTable(cfg)


def test_all_versions_unnest(spark, tmp_path):
    df = _table(spark, tmp_path, only_read_latest=False).to_df(spark)
    rows = {(r._row_key, r._timestamp): (r.p, r.t) for r in df.collect()}
    # rows = cells grouped by (key, ts): k1@T0 has only p, k1@T1 has both
    assert rows == {
        ("k1", T0): (100, None),
        ("k1", T1): (101, "a"),
        ("k2", T2): (200, "b"),
    }


def test_latest_only(spark, tmp_path):
    df = _table(spark, tmp_path, only_read_latest=True).to_df(spark)
    rows = {(r._row_key, r._timestamp): (r.p, r.t) for r in df.collect()}
    # CellsPerColumnLimitFilter(1): p@T0 dropped; survivors pivot by ts
    assert rows == {
        ("k1", T1): (101, "a"),
        ("k2", T2): (200, "b"),
    }


def test_latest_cells_multiple_versions(spark):
    cells = spark.createDataFrame(
        [
            ("k", "f", "q", T0, b"v0"),
            ("k", "f", "q", T1, b"v1"),
            ("k", "f", "q", T2, b"v2"),
        ],
        CELLS_SCHEMA,
    )
    two = latest_cells(cells, versions=2).collect()
    assert sorted(bytes(r.value) for r in two) == [b"v1", b"v2"]
