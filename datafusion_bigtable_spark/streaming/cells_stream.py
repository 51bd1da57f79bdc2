"""Structured Streaming over the event/cells model.

The reference has NO streaming (reads are one-shot gRPC,
src/execute_plan.rs:183) — this module is the §7 extension: the same
declarative surface, incrementalized.  A cells store written continuously
(Bigtable's actual write pattern) becomes a `readStream` source; windowed
aggregations with watermarks handle late cells; `session_window` gives the
stateful sessionization twin of the batch `events_sessionize` query.

Local tests drive a parquet-backed stream through a memory sink with
``processAllAvailable()`` — the same plan incrementalized over micro-
batches; on a cluster the source would be Kafka/files-on-arrival and the
sink a Delta/parquet table with checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# events.parquet stores ts as TIMESTAMP(NANOS); the streaming reader needs a
# declared schema, so declare ts as long (with nanosAsLong) and rebuild µs.
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The file stream source requires a *directory*; select just the events
    # table with a glob filter.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def streaming_hourly_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + sum(value).

    ``withWatermark`` bounds state: windows more than 2 h behind the max
    event time are finalized and dropped from the state store — the knob
    that keeps state size constant at 100 TB/day event rates.
    """
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def streaming_session_window(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Stateful sessionization via session_window — the streaming twin of
    the batch lag+cumsum sessionizer (queries.events_sessionize)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sess.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def run_events_stream_to_memory(
    spark: SparkSession,
    sf_dir: str,
    agg: str = "hourly",
    query_name: str = "dbs_stream_out",
) -> DataFrame:
    """Drive the streaming plan over the parquet events to completion and
    return the materialized result table (synchronous; test/driver path)."""
    events = read_events_stream(spark, sf_dir)
    plan = streaming_hourly_agg(events) if agg == "hourly" else streaming_session_window(events)
    q = (
        plan.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
