from datafusion_bigtable_spark.sources.bigtable_table import BigtableTable
from datafusion_bigtable_spark.sources.cells import (
    CELLS_SCHEMA,
    compact_cells_store,
    read_cells,
    read_manifest,
    write_cells,
    write_manifest,
    write_weather_balloons_fixture,
)
from datafusion_bigtable_spark.sources.fake_bigtable import (
    InProcessBigtableService,
    service_from_parquet,
)

__all__ = [
    "BigtableTable",
    "CELLS_SCHEMA",
    "InProcessBigtableService",
    "compact_cells_store",
    "read_cells",
    "read_manifest",
    "service_from_parquet",
    "write_cells",
    "write_manifest",
    "write_weather_balloons_fixture",
]
