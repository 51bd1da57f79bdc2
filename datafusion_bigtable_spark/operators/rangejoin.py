"""Interval (range) joins that survive 100 TB.

The reference delegates all join execution to DataFusion and has no range
join (SURVEY.md §2 Tier B); Spark likewise has no dedicated interval-join
operator.  The naive plan for

    events e JOIN intervals i
      ON e.key = i.key AND i.start <= e.ts AND e.ts < i.end

is an equi-join on ``key`` followed by a per-key filter — which is a
CARTESIAN PRODUCT per key before the filter runs.  With a hot key carrying
10⁶ events × 10⁴ intervals that single task materializes 10¹⁰ pairs and
the stage never finishes.  The fix is the standard time-bucketing
decomposition (the same trick Flink's interval join and KDB's window join
use): quantize time into fixed-width buckets, explode each interval into
the buckets it overlaps, equi-join on ``(key, bucket)`` — which Catalyst
executes as a plain hash/sort-merge shuffle join whose per-task pair count
is bounded by bucket occupancy, not key cardinality — then re-apply the
exact range predicate as a cheap residual filter.

Correctness: an (event, interval) pair with ``start <= ts < end`` always
shares the bucket ``floor(ts / width)`` (the interval's explode covers
every bucket it overlaps), so bucketing loses no matches; the residual
filter removes the extra same-bucket pairs.  Choosing ``bucket_width``
close to the typical interval length keeps the explode factor ~2 and the
candidate inflation small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    *,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Join each event row to every interval row of the same ``key`` with
    ``start <= ts < end`` (end-exclusive, the standard interval contract).

    ``bucket`` is a SQL interval literal (e.g. ``'1 day'``, ``'6 hours'``)
    — set it near the TYPICAL interval length: the explode factor is
    ``len/bucket + 1`` per interval, candidate inflation is bounded by
    bucket occupancy.  Both sides shuffle ONCE on ``(key, bucket)``; no
    per-key cartesian ever materializes.

    Column-name collisions between the two inputs are the caller's to
    resolve (select/alias before the call), same as any DataFrame join.

    Timestamps bucket through ``unix_timestamp`` under the SESSION
    timezone; with TIMESTAMP_NTZ inputs, run under a fixed-offset session
    zone (the query layer pins UTC) — a DST-variable zone's fold hour can
    collapse two NTZ instants onto one epoch second and mis-bucket a
    boundary event.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    # integer bucket index: epoch seconds divided by the bucket width in
    # seconds (computed by adding the interval to the epoch — Spark has no
    # extract(epoch FROM interval))
    sec = F.unix_timestamp
    wsec = F.expr(f"unix_timestamp(TIMESTAMP_NTZ'1970-01-01 00:00:00' + INTERVAL {bucket})")

    ev = events.withColumn("_bkt", F.floor(sec(F.col(ts)) / wsec))
    # sequence() emits every bucket the interval [start, end) overlaps;
    # end-exclusive: an interval ending exactly on a bucket boundary does
    # not cover that bucket (sequence bounds are inclusive, so subtract
    # one second before flooring — empty intervals explode to nothing).
    iv = (
        intervals.withColumnRenamed(key, "_ikey")
        .withColumn(
            "_bkts",
            F.when(
                F.col(start) < F.col(end),
                F.sequence(
                    F.floor(sec(F.col(start)) / wsec),
                    F.floor((sec(F.col(end)) - 1) / wsec),
                ),
            ).otherwise(F.array().cast("array<bigint>")),
        )
        .withColumn("_ibkt", F.explode("_bkts"))
        .drop("_bkts")
    )
    # A matching (event, interval) pair shares exactly ONE exploded copy
    # (the event's own bucket), so the join introduces no duplicates and
    # left semantics hold directly.
    cond = (
        (ev[key] == iv["_ikey"])
        & (ev["_bkt"] == iv["_ibkt"])
        & (iv[start] <= ev[ts])
        & (ev[ts] < iv[end])
    )
    return ev.join(iv, cond, how).drop("_bkt", "_ibkt", "_ikey")
