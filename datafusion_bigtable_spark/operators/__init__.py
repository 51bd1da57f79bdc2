from datafusion_bigtable_spark.operators.decode import decode_int64_be, decode_utf8
from datafusion_bigtable_spark.operators.pivot import (
    compose_row_key,
    latest_cells,
    pivot_cells,
    split_row_key,
)

__all__ = [
    "decode_int64_be",
    "decode_utf8",
    "compose_row_key",
    "latest_cells",
    "pivot_cells",
    "split_row_key",
]
