from __future__ import annotations

import os

import pytest

from datafusion_bigtable_spark.config import BigtableTableConfig, ColumnSpec
from datafusion_bigtable_spark.sources.cells import write_weather_balloons_fixture

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from datafusion_bigtable_spark.session import get_spark

    spark = get_spark("dbs-tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")))
    yield spark


@pytest.fixture(scope="session")
def cells_path(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("cells") / "weather_balloons_cells.parquet"
    return write_weather_balloons_fixture(str(path))


@pytest.fixture(scope="session")
def simple_config(cells_path) -> BigtableTableConfig:
    """test_simple_row_key setup (reference src/datasource.rs:179-192)."""
    return BigtableTableConfig(
        table="weather_balloons",
        column_family="measurements",
        columns=(ColumnSpec("pressure", "int64"), ColumnSpec("temperature", "string")),
        table_partition_cols=("_row_key",),
        only_read_latest=True,
        cells_path=cells_path,
        allow_full_scan=True,  # tiny golden fixture; default refusal pinned in test_datasource
    )


@pytest.fixture(scope="session")
def composite_config(cells_path) -> BigtableTableConfig:
    """test_composite_row_key setup (reference src/datasource.rs:245-262)."""
    return BigtableTableConfig(
        table="weather_balloons",
        column_family="measurements",
        columns=(ColumnSpec("pressure", "int64"), ColumnSpec("temperature", "string")),
        table_partition_cols=("region", "balloon_id", "event_minute"),
        only_read_latest=True,
        cells_path=cells_path,
        allow_full_scan=True,  # tiny golden fixture; default refusal pinned in test_datasource
    )


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
