"""Scan-width guard for shuffle-free plans.

The exchange-removal trap (VERDICT r9 + the r12 line_dedup measurement):
optimizing a corpus shuffle OUT of a plan also removes the parallelism
it accidentally provided.  A small-file scan yields few input splits —
the sf1 fixtures read as TWO partitions — and any expensive narrow work
downstream (explosions, per-char folds, Arrow maps) inherits them,
running on 2 of 32 cores.

``widen_if_narrow`` restores full-width execution with ONE narrow
exchange of RAW rows — strictly less data than any post-explosion
shuffle — and is a no-op when the scan is already at least as wide as
``spark.sql.shuffle.partitions`` (a real 100 TB table: thousands of
splits).  Measured: line_dedup 59.6 → 21.6 s at sf1 from this guard
alone after its rebuild shuffle was removed.

No reference analogue (the reference plans single-partition scans by
design, execute_plan.rs:84-86); scale tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def widen_if_narrow(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key_col`` to the session's shuffle
    width when its current partitioning is narrower; pass through
    untouched otherwise.

    ``df.rdd.getNumPartitions()`` converts the plan (no job runs) —
    cheap, and the only honest way to see the width Catalyst will
    schedule.  Keying the exchange on a real column (not round-robin)
    keeps downstream per-key aggregations combine-friendly.
    """
    if df.isStreaming:
        # no .rdd on a streaming frame; micro-batch width is the
        # source's concern (maxFilesPerTrigger etc.), not this guard's
        return df
    sp_conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    sp = int(sp_conf) if str(sp_conf).isdigit() else 32
    if df.rdd.getNumPartitions() < sp:
        return df.repartition(sp, F.col(key_col))
    return df


def _free_local_checkpoint(df: DataFrame) -> None:
    """Eagerly release a ``localCheckpoint()``'s storage blocks.

    ``DataFrame.unpersist()`` cannot reach them (the persist lives on the
    internal RDD behind the LogicalRDD plan, not in the cache manager), so
    go through the JVM plan.  Callers must be done with EVERY DataFrame
    derived from this checkpoint — the lineage is truncated, so freed
    blocks are unrecoverable.  Best-effort: on any failure the
    ContextCleaner's GC path still reclaims the blocks eventually.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
