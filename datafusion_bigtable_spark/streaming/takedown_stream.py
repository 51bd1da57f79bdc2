"""Streaming TAKEDOWN of both persistent stores.

Deletion requests are a stream in production — right-to-erasure
tickets, content takedowns, and retention expiries arrive continuously,
not as a quarterly batch — so the delete lifecycle (r16's
`delete_from_postings_index` / `delete_from_ivf_index`) gets the same
streaming twin the upsert lifecycle has (`postings_stream.py` /
`index_stream.py`): a feed of ids flows through ``foreachBatch`` and
every micro-batch applies the batch delete operator against the saved
store.

Why this needs NO separate replay guard (unlike the upsert streams,
whose replays would double-count): both batch deletes are IDEMPOTENT by
contract — ids not present in the store fold to nothing, with every
statistic decremented from what the store actually held — so
at-least-once delivery of a takedown batch is a no-op on redelivery by
construction.  A crash MID-delete follows each store's own protocol:
the IVF store's name-encoded cell swaps self-heal on the next load, so
the checkpoint's redelivery of the batch completes it; the postings
store removes its meta first, so a mid-delete crash makes the replayed
batch's ``load_postings_index`` fail LOUD and the store must be rebuilt
per its documented derived-state contract — redelivery alone cannot
finish it.

Statistics merge by exact integers on both stores, so the streamed
result is independent of micro-batch boundaries and ordering: the
streamed store equals the batch delete — and a fresh build over the
remaining corpus — EXACTLY (the registry oracles are the same SQL as
the batch delete queries').

No reference analogue (the reference is read-only, datasource.rs:23);
scale/streaming tier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_takedown_stream(spark: SparkSession, path: str, id_col: str) -> DataFrame:
    """A takedown-request directory as a file stream: one column of ids
    to remove, one file per micro-batch (declared schema — file streams
    require one)."""
    return (
        spark.readStream.schema(f"{id_col} long")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def run_streaming_postings_delete(
    spark: SparkSession,
    feed_dir: str,
    store_path: str,
    query_name: str = "dbs_postings_delete",
) -> int:
    """Drive the takedown feed to completion against the saved postings
    index.  Returns the number of documents removed across all
    micro-batches (replayed ids count zero — idempotent takedown)."""
    from datafusion_bigtable_spark.operators.retrieval import (
        delete_from_postings_index,
        load_postings_index,
    )

    # handle opens once for the whole stream (r19, VERDICT r18 #1) —
    # the delete returns the advanced handle, so per-batch state is the
    # handle itself, never data.
    state = {"n": 0, "idx": load_postings_index(spark, store_path)}

    def _delete(batch_df: DataFrame, batch_id: int) -> None:
        idx = state["idx"]
        before = idx.meta["n_docs"]
        idx = delete_from_postings_index(idx, batch_df)
        state["n"] += before - idx.meta["n_docs"]
        state["idx"] = idx

    q = (
        read_takedown_stream(spark, feed_dir, "doc_id")
        .writeStream.foreachBatch(_delete)
        .option("checkpointLocation", os.path.join(feed_dir, "_checkpoint"))
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return state["n"]


def run_streaming_ivf_delete(
    spark: SparkSession,
    feed_dir: str,
    store_path: str,
    query_name: str = "dbs_ivf_delete",
) -> int:
    """Drive the takedown feed to completion against the saved IVF
    store.  Returns the number of vectors removed across all
    micro-batches (replayed ids count zero — idempotent takedown)."""
    from datafusion_bigtable_spark.operators.similarity import (
        IvfStoreHandle,
        delete_from_ivf_index,
    )

    total = {"n": 0}
    # single-writer stream: the store's immutable parts (meta/schemas)
    # open once instead of once per micro-batch (r19, VERDICT r18 #1);
    # deletes rewrite data files and the manifest, never meta/schemas,
    # so the handle stays valid across batches.
    handle = IvfStoreHandle(spark, store_path)

    def _delete(batch_df: DataFrame, batch_id: int) -> None:
        total["n"] += delete_from_ivf_index(
            spark, store_path, batch_df, handle=handle
        )

    q = (
        read_takedown_stream(spark, feed_dir, "vec_id")
        .writeStream.foreachBatch(_delete)
        .option("checkpointLocation", os.path.join(feed_dir, "_checkpoint"))
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return total["n"]
