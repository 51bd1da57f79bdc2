from datafusion_bigtable_spark.streaming.cells_stream import (
    run_events_stream_to_memory,
    scoped_stream_confs,
    streaming_attribution_join,
    streaming_distinct_pairs,
    streaming_distinct_pairs_watermarked,
    streaming_enriched_counts,
    streaming_hourly_agg,
    streaming_ingest_dedup,
    streaming_session_window,
    streaming_user_totals_stateful,
)

__all__ = [
    "run_events_stream_to_memory",
    "scoped_stream_confs",
    "streaming_attribution_join",
    "streaming_distinct_pairs",
    "streaming_distinct_pairs_watermarked",
    "streaming_enriched_counts",
    "streaming_hourly_agg",
    "streaming_ingest_dedup",
    "streaming_session_window",
    "streaming_user_totals_stateful",
]
