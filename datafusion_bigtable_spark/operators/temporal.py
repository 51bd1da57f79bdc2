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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    right_tie: str,
    tolerance: int | None = None,
) -> DataFrame:
    """Distributed as-of join (pandas ``merge_asof`` at cluster scale):
    each left row picks up ``right_values`` from the LATEST right row of
    the same key with ``right_ts <= left_ts`` — ties on right_ts broken
    toward the greatest ``right_tie`` — or NULLs when no right row
    precedes it.

    Shape (the reason this form, not a range join, is the 100 TB as-of):
    UNION both sides tagged, ONE window over (key) ordered by
    (ts, side, tie) with ``last(value, ignorenulls=True)`` carrying the
    most recent right values forward, then keep the left rows.  One
    shuffle on the key, zero join blowup — a range/interval join
    materializes |left| × |overlapping right| candidate pairs first,
    which for "latest prior" semantics is all dominated work, while the
    window form is O(n log n) sort per partition and emits exactly
    |left| rows.  Right rows sort BEFORE left rows at an equal
    timestamp, so an order landing at the exact event instant is
    visible to that event ("on or before").

    ``left_ts``/``right_ts`` must be mutually comparable (pass epoch-µs
    longs when the sides carry different timestamp flavors — union
    coercion of ntz/ltz mixes is engine-dependent, integers are not).

    ``tolerance`` (pandas ``merge_asof(tolerance=...)``): when set, a
    match older than ``left_ts - tolerance`` is discarded — the row keeps
    NULLs, exactly as if no right row preceded it.  Implemented by
    carrying the matched right row's timestamp forward through the same
    window and null-gating the values row-locally: zero extra shuffles,
    the staleness bound every feature-store as-of ("join the freshest
    price, but never one older than an hour") needs.
    """
    rtypes = dict(zip(right.schema.names, [f.dataType for f in right.schema.fields]))
    ltypes = dict(zip(left.schema.names, [f.dataType for f in left.schema.fields]))
    lcols = list(left.columns)

    l_side = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_l"),
        F.lit(None).cast(rtypes[right_tie]).alias("_tie"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(f"_rv_{c}") for c in right_values],
    )
    r_side = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_l"),
        F.col(right_tie).alias("_tie"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"_rv_{c}") for c in right_values],
    )
    u = l_side.unionByName(r_side)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_l", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE carried struct per row (ADVICE r11 #3): the matched right ROW —
    # its timestamp and all its values — travels through a single
    # last(ignorenulls) window, so the freshness gate and the emitted
    # values always come from the same right row.  Independent per-column
    # lasts diverge from pandas merge_asof when a right value column is
    # NULL on the matched row: an older row's value would surface under
    # the newer row's gate.  The struct is non-null on every right row
    # (even one whose value fields are all NULL), exactly the row unit
    # merge_asof matches.
    u = u.withColumn(
        "_rrow",
        F.when(
            F.col("_is_l") == 0,
            F.struct(
                F.col("_t").alias("_rts"),
                *[F.col(f"_rv_{c}").alias(c) for c in right_values],
            ),
        ),
    )
    m = F.last("_rrow", ignorenulls=True).over(w)
    if tolerance is None:
        picked = [m.getField(c).alias(c) for c in right_values]
    else:
        fresh = m.isNotNull() & ((F.col("_t") - m.getField("_rts")) <= F.lit(tolerance))
        picked = [F.when(fresh, m.getField(c)).alias(c) for c in right_values]
    return (
        u.select(*lcols, F.col("_is_l"), *picked)
        .filter(F.col("_is_l") == 1)
        .drop("_is_l")
    )
