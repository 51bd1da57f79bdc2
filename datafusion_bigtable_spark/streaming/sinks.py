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


def latest_wins_view(
    rows: DataFrame,
    key_cols: list,
    value_cols: list,
    ts_col: str = "_timestamp",
) -> DataFrame:
    """Continuously-maintained latest-version view of a version-unnested
    cell stream — the stateful operator the streaming source's contract
    defers to (sources/datasource.py BigtableStreamReader requires
    ``only_read_latest=false`` because a later file can carry a newer
    version of an already-emitted cell; latest-wins is therefore a
    downstream STATE problem, not a scan problem).

    Keyed by the row-key components; per qualifier column the state holds
    the newest non-null ``(value, ts)`` seen so far — a NULL hole in a
    newer version row does NOT erase an older value for that qualifier,
    matching the batch only-read-latest pivot exactly.  Each micro-batch
    emits the key's refreshed current row (update mode) plus ``_last_ts``
    (µs, the newest version contributing to it).

    State is O(|live keys| × |qualifiers|) — the same cardinality a
    Bigtable tablet's row index carries; idle-key eviction would use state
    timeouts at 100 TB ingest.
    """
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.functions import col

    schema = rows.schema
    out_schema = T.StructType(
        [schema[c] for c in key_cols]
        + [T.StructField(c, schema[c].dataType) for c in value_cols]
        + [T.StructField("_last_ts", T.LongType())]
    )
    state_schema = T.StructType(
        [T.StructField(f"v_{c}", schema[c].dataType) for c in value_cols]
        + [T.StructField(f"t_{c}", T.LongType()) for c in value_cols]
    )
    n_vals = len(value_cols)
    long_valued = {
        c for c in value_cols if isinstance(schema[c].dataType, T.LongType)
    }

    def _py(c, x):
        if x is None or (isinstance(x, float) and pd.isna(x)):
            return None
        if c in long_valued:
            return int(x)
        return x.item() if hasattr(x, "item") else x

    def update(key, pdfs, state):
        if state.exists:
            st = list(state.get)
            vals = {c: st[i] for i, c in enumerate(value_cols)}
            tss = {c: st[n_vals + i] for i, c in enumerate(value_cols)}
        else:
            vals = {c: None for c in value_cols}
            tss = {c: None for c in value_cols}
        pdf = pd.concat(list(pdfs)).sort_values(ts_col, kind="stable")
        ts_us = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
        for c in value_cols:
            nn = pdf[c].notna()
            if nn.any():
                t = int(ts_us[nn].iloc[-1])
                if tss[c] is None or t >= tss[c]:
                    vals[c] = _py(c, pdf[c][nn].iloc[-1])
                    tss[c] = t
        state.update(
            tuple(vals[c] for c in value_cols) + tuple(tss[c] for c in value_cols)
        )
        non_null_ts = [t for t in tss.values() if t is not None]
        if not non_null_ts:
            # A key's first-ever batch can be all-null in every value
            # column: state stays empty-ish, nothing to emit yet.
            return
        row = {k: v for k, v in zip(key_cols, key)}
        row.update({c: vals[c] for c in value_cols})
        row["_last_ts"] = max(non_null_ts)
        yield pd.DataFrame([row])

    return rows.select(*key_cols, ts_col, *value_cols).groupBy(
        *[col(c) for c in key_cols]
    ).applyInPandasWithState(update, out_schema, state_schema, "update", "NoTimeout")
