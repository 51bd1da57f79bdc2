from datafusion_bigtable_spark.streaming.cells_stream import (
    run_events_stream_to_memory,
    streaming_hourly_agg,
    streaming_session_window,
)

__all__ = [
    "run_events_stream_to_memory",
    "streaming_hourly_agg",
    "streaming_session_window",
]
