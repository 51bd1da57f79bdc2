"""Changelog → temporal table (SCD2) compaction.

The reference's data model is a VERSIONED cell store — every mutation
keeps its timestamp (src/execute_plan.rs:223-271 unnests all versions) —
which is exactly a changelog.  The relational view warehouses call a
slowly-changing-dimension type-2 table ("what was this key's value during
[t1, t2)?") is derivable from it, and the reference leaves that derivation
entirely to the query layer.  This operator is that derivation, Spark-
first:

1. **Change detection**: drop rows whose value equals the key's previous
   value (null-safe) — consecutive duplicate versions collapse, only real
   transitions survive.
2. **Interval build**: each surviving row's validity ends where the key's
   next change begins (``lead``); the last change per key stays open
   (NULL ``valid_to``), the standard SCD2 open-interval convention.

Scale: both steps are window functions over the SAME partitioning
(key) and ordering (ts, tie), so Catalyst plans ONE shuffle and runs both
windows in a single stage — the whole operator is one pass over the
changelog regardless of size.  Skewed keys (one entity with millions of
versions) sort within their partition; no cross-key state exists.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def changelog_to_scd2(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    value: str,
    tie: Sequence[str] = (),
) -> DataFrame:
    """Compact a changelog into SCD2 validity intervals.

    Input: one row per observed version ``(key, ts, value, …)``.
    Output: one row per VALUE TRANSITION, with ``valid_from`` (= its ts)
    and ``valid_to`` (next transition's ts; NULL while current).  Rows
    repeating the key's previous value are dropped — re-asserting an
    unchanged value extends the existing interval instead of splitting it.

    ``tie`` breaks equal timestamps deterministically (pass a unique id
    when the source can emit two versions in the same microsecond);
    comparison against the previous value follows the same total order.
    """
    order = [F.col(ts).asc(), *(F.col(c).asc() for c in tie)]
    w = Window.partitionBy(key).orderBy(*order)
    changes = (
        df.withColumn("_prev", F.lag(value).over(w))
        .withColumn("_first", F.row_number().over(w) == 1)
        # null-safe inequality: a NULL value is a real state, transitions
        # to/from it must survive — eqNullSafe, not `!=`
        .filter(F.col("_first") | ~F.col(value).eqNullSafe(F.col("_prev")))
        .drop("_prev", "_first")
    )
    return (
        changes.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
    )
