from datafusion_bigtable_spark.sources.bigtable_table import BigtableTable
from datafusion_bigtable_spark.sources.cells import CELLS_SCHEMA, read_cells, write_weather_balloons_fixture

__all__ = ["BigtableTable", "CELLS_SCHEMA", "read_cells", "write_weather_balloons_fixture"]
