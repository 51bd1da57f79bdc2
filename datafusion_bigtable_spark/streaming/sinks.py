"""Streaming sinks: exactly-once-style ingest with inline dedup.

``foreachBatch`` is the Structured Streaming escape hatch for sinks that
need batch-only operations (merge, dedup-against-target, multi-table
writes).  This module provides the shape a training-data ingest pipeline
runs: each micro-batch is exact-deduplicated against itself AND against
everything already written, then appended to a parquet target —
idempotent per batch because the dedup key filters out re-deliveries.

At scale the target would be a transactional table (Delta/Iceberg MERGE);
on plain parquet we get the same semantics for an append-only keyed
stream: re-processing a batch adds no new rows because every key already
exists.  Atomicity across concurrent writers would need the table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def dedup_ingest_sink(target_path: str, key_col: str = "content_hash"):
    """Build a foreachBatch function: append only rows whose key is new.

    Dedup is two-level: within the micro-batch (first writer wins via
    min/row_number) and against the already-written target (left_anti).
    """

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window as W

        spark = batch.sparkSession
        w = W.partitionBy(key_col).orderBy(F.col(key_col))
        fresh = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # Only a genuinely-missing target means "first batch" — any other
        # read failure (corrupt footer, permissions) must propagate, else
        # the dedup-against-target silently turns off and the sink's
        # at-most-once-per-key contract breaks.
        import os

        if os.path.exists(target_path):
            existing = spark.read.parquet(target_path).select(key_col)
            fresh = fresh.join(existing, key_col, "left_anti")
        fresh.write.mode("append").parquet(target_path)

    return write_batch


def run_dedup_ingest(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    query_name: str = "dbs_dedup_ingest",
) -> DataFrame:
    """Stream the documents table (as if arriving continuously) through the
    dedup-ingest sink; returns the materialized target."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .withColumn("content_hash", F.md5("text"))
    )
    q = (
        stream.writeStream.foreachBatch(dedup_ingest_sink(target_path))
        .queryName(query_name)
        .option("checkpointLocation", target_path + "_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(target_path)
