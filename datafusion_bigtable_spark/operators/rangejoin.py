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

Correctness: bucketing runs entirely in integer MICROSECONDS — the native
resolution of both Spark timestamp flavors — so an (event, interval) pair
with ``start <= ts < end`` always shares the bucket ``floordiv(us(ts),
width_us)`` (the interval's explode covers ``floordiv(us(start), w) ..
floordiv(us(end) - 1, w)``), and bucketing loses no matches even when the
bounds carry sub-second fractions; the residual filter removes the extra
same-bucket pairs.  Choosing ``bucket_width`` close to the typical
interval length keeps the explode factor ~2 and the candidate inflation
small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

_EPOCH_NTZ = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def _micros(df: DataFrame, col: str) -> Column:
    """Exact integer microseconds for either timestamp flavor.

    TIMESTAMP (instant): ``unix_micros`` — absolute µs since epoch,
    timezone-independent by construction.  TIMESTAMP_NTZ (wall clock):
    ``timestampdiff(MICROSECOND, epoch_ntz, col)`` — pure wall-clock
    arithmetic, never routed through the session timezone (a cast to
    TIMESTAMP would be session-tz-dependent and non-monotone across DST
    folds).
    """
    dtype = df.schema[col].dataType
    if isinstance(dtype, TimestampNTZType):
        return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), F.col(col))
    if isinstance(dtype, TimestampType):
        return F.unix_micros(F.col(col))
    raise TypeError(
        f"column {col!r} must be TIMESTAMP or TIMESTAMP_NTZ, got {dtype.simpleString()}"
    )


def _floordiv(col: str, width_us: int) -> Column:
    """Floor division of a bigint column by a positive literal width.

    SQL ``DIV`` truncates toward zero; for pre-1970 timestamps (negative
    µs) that would round buckets UP and break the coverage invariant, so
    negatives take the adjusted branch.
    """
    return F.expr(
        f"CASE WHEN {col} >= 0 THEN {col} DIV {width_us} "
        f"ELSE -(((-{col}) + {width_us} - 1) DIV {width_us}) END"
    )


def _bucket_width_us(df: DataFrame, bucket: str) -> int:
    """Resolve a SQL interval literal to exact microseconds, driver-side.

    ``timestamp_micros(0) + INTERVAL …`` is instant arithmetic on the µs
    line — day-time intervals are stored as µs, so the result is exact and
    independent of the session timezone (the previous ``unix_timestamp``
    formulation truncated to whole seconds AND shrank under a non-UTC
    offset — ADVICE r5).  One-row local query; also validates the literal
    eagerly with Spark's own parse error.
    """
    row = df.sparkSession.sql(
        f"SELECT unix_micros(timestamp_micros(0) + INTERVAL {bucket})"
    ).head()
    width = row[0] if row is not None else None
    if width is None or width <= 0:
        raise ValueError(f"bucket width must be positive, got INTERVAL {bucket}")
    return int(width)


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

    All three time columns must share one timestamp flavor (all TIMESTAMP
    or all TIMESTAMP_NTZ): the two flavors live on different µs lines, so
    mixing them would bucket the two sides inconsistently (and the residual
    comparison would silently cast through the session timezone).

    Column-name collisions between the two inputs are the caller's to
    resolve (select/alias before the call), same as any DataFrame join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    flavors = {
        type(events.schema[ts].dataType),
        type(intervals.schema[start].dataType),
        type(intervals.schema[end].dataType),
    }
    if len(flavors) > 1:
        raise TypeError(
            f"mixed timestamp flavors across {ts!r}/{start!r}/{end!r}: "
            "cast all three to one of TIMESTAMP or TIMESTAMP_NTZ first"
        )
    wus = _bucket_width_us(events, bucket)

    ev = events.withColumn("_us", _micros(events, ts)).withColumn(
        "_bkt", _floordiv("_us", wus)
    )
    # sequence() emits every bucket the interval [start, end) overlaps;
    # end-exclusive: the top bucket is floordiv(end_us - 1, w), so an
    # interval ending exactly on a bucket boundary does not cover that
    # bucket — empty intervals explode to nothing.
    iv = (
        intervals.withColumnRenamed(key, "_ikey")
        .withColumn("_sus", _micros(intervals, start))
        .withColumn("_eus", _micros(intervals, end))
        .withColumn("_eus1", F.col("_eus") - F.lit(1))
        .withColumn(
            "_bkts",
            F.when(
                F.col("_sus") < F.col("_eus"),
                F.sequence(_floordiv("_sus", wus), _floordiv("_eus1", wus)),
            ).otherwise(F.array().cast("array<bigint>")),
        )
        .withColumn("_ibkt", F.explode("_bkts"))
        .drop("_bkts", "_sus", "_eus", "_eus1")
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
    return ev.join(iv, cond, how).drop("_us", "_bkt", "_ibkt", "_ikey")
