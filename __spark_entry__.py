"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``datafusion_bigtable_spark.queries`` (registry of
Spark implementation + DuckDB oracle pairs); this module stays a thin
adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_bigtable_spark import queries as _Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the engine's signature pipeline end-to-end: the wide-column cells
    store assembled into the reference's composite-key relational view
    (golden query src/datasource.rs:289-298: ``=`` + ``IN`` + ``BETWEEN``
    on key components), via the key-range composer + latest-version filter
    + cell→row pivot + big-endian decode.
    """
    import tempfile

    from datafusion_bigtable_spark import (
        Between,
        BigtableTable,
        BigtableTableConfig,
        ColumnSpec,
        Eq,
        In,
    )
    from datafusion_bigtable_spark.sources.cells import write_weather_balloons_fixture

    path = os.path.join(tempfile.gettempdir(), "dbs_weather_balloons_cells.parquet")
    write_weather_balloons_fixture(path)
    table = BigtableTable(
        BigtableTableConfig(
            table="weather_balloons",
            column_family="measurements",
            columns=(ColumnSpec("pressure", "int64"), ColumnSpec("temperature", "string")),
            table_partition_cols=("region", "balloon_id", "event_minute"),
            cells_path=path,
        )
    )
    df = table.to_df(
        spark,
        predicates=[
            Eq("region", "us-west2"),
            In("balloon_id", ("3698",)),
            Between("event_minute", "2021-03-05-1200", "2021-03-05-1204"),
        ],
    )
    return df.orderBy("_timestamp")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for ops whose
    semantics are not SQL-expressible → driver does a rows-only check)."""
    return _Q.oracle_sql()
