"""The canonical wide-column *cells* store.

Bigtable's data model — rows addressed by a byte-string row key, one column
family, qualifiers holding ``(timestamp, value_bytes)`` cells (reference
src/execute_plan.rs:195-211) — is exactly representable as a narrow
relational table::

    row_key: string, family: string, qualifier: string,
    ts: timestamp_ntz (µs), value: binary

A parquet layout of this table, sorted by ``row_key``, stands in for the
Bigtable service in this environment (the reference uses the Bigtable
emulator for its tests, Makefile:1-15).  Sorting by row key is what makes
the composer's KeyRanges prunable by parquet min/max statistics — the same
role Bigtable's physical key order plays for RowRanges.

At 100 TB the cells store would be written with
``df.repartitionByRange(N, "row_key").sortWithinPartitions("row_key",
"qualifier", "ts")`` so each of N files covers a disjoint key range and a
KeyRange scan touches only the overlapping files.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CELLS_SCHEMA = T.StructType(
    [
        T.StructField("row_key", T.StringType(), False),
        T.StructField("family", T.StringType(), False),
        T.StructField("qualifier", T.StringType(), False),
        T.StructField("ts", T.TimestampNTZType(), False),
        T.StructField("value", T.BinaryType(), True),
    ]
)

# Seed data from the reference's test harness (script/insert_rows.py:9-15,26-37):
# 5 logical rows x 2 qualifiers; `pressure` stored as 8-byte big-endian int64,
# `temperature` as UTF-8 bytes; explicit microsecond timestamps.
_WEATHER_BALLOON_ROWS = [
    ("us-west2#3698#2021-03-05-1200", 94558, "9.6", 1614945605100000),
    ("us-west2#3698#2021-03-05-1201", 94122, "9.7", 1614945665200000),
    ("us-west2#3698#2021-03-05-1202", 95992, "9.5", 1614945725300000),
    ("us-west2#3698#2021-03-05-1203", 96025, "9.5", 1614945785400000),
    ("us-west2#3698#2021-03-05-1204", 96021, "9.6", 1614945845500000),
]


def _us_to_naive_datetime(us: int) -> _dt.datetime:
    return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)


def weather_balloons_cells() -> list[tuple]:
    """The 10 seed cells as python tuples matching CELLS_SCHEMA."""
    out = []
    for row_key, pressure, temperature, ts_us in _WEATHER_BALLOON_ROWS:
        ts = _us_to_naive_datetime(ts_us)
        out.append((row_key, "measurements", "pressure", ts, pressure.to_bytes(8, "big", signed=True)))
        out.append((row_key, "measurements", "temperature", ts, temperature.encode("utf-8")))
    return out


def write_weather_balloons_fixture(path: str) -> str:
    """Write the seed cells as a row-key-sorted parquet file (pyarrow; no
    Spark needed so the composer unit tests stay JVM-free)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sorted(weather_balloons_cells())
    table = pa.table(
        {
            "row_key": [r[0] for r in rows],
            "family": [r[1] for r in rows],
            "qualifier": [r[2] for r in rows],
            "ts": pa.array([r[3] for r in rows], type=pa.timestamp("us")),
            "value": pa.array([r[4] for r in rows], type=pa.binary()),
        }
    )
    pq.write_table(table, path)
    return path


def read_cells(spark: SparkSession, path: str) -> DataFrame:
    """Load a cells-store parquet with the declared schema (never inferred —
    mirrors the reference's fixed schema stance, src/datasource.rs:65)."""
    return spark.read.schema(CELLS_SCHEMA).parquet(path)


def write_cells(cells: DataFrame, path: str, num_ranges: int = 32, mode: str = "overwrite") -> None:
    """Write a cells store in the layout the composer's pruning relies on:
    range-partitioned on ``row_key`` and sorted within each file by
    ``(row_key, qualifier, ts)``.

    Each output file then covers a disjoint key range, so a KeyRange scan
    touches only overlapping files (parquet min/max stats prune the rest),
    and the Python Data Source's full-scan path parallelizes per file.
    ``num_ranges`` ≈ cluster write parallelism; at 100 TB pick it so files
    land in the 128 MB–1 GB band.
    """
    (
        cells.repartitionByRange(num_ranges, "row_key")
        .sortWithinPartitions("row_key", "qualifier", "ts")
        .write.mode(mode)
        .parquet(path)
    )


def cells_from_long_df(
    df: DataFrame,
    *,
    row_key: str,
    qualifier: str,
    ts: str,
    value: str,
    family: str = "default",
) -> DataFrame:
    """Adapt any long/narrow DataFrame into the canonical cells shape."""
    return df.select(
        F.col(row_key).cast("string").alias("row_key"),
        F.lit(family).alias("family"),
        F.col(qualifier).cast("string").alias("qualifier"),
        F.col(ts).cast("timestamp_ntz").alias("ts"),
        F.col(value).cast("binary").alias("value"),
    )
