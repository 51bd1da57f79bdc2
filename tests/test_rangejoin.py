"""operators/rangejoin.py — bucketed interval join semantics.

The oracle gate (`interval_join_order_events`) verifies the aggregate over
testdata; these pin the operator contract itself: end-exclusivity, bucket-
boundary behavior, empty intervals, left-join semantics, and that the
bucket decomposition introduces no duplicate matches.
"""

from __future__ import annotations

import datetime as dt

import pytest

from datafusion_bigtable_spark.operators.rangejoin import interval_join_bucketed


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def frames(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.createDataFrame(
        [
            (1, _ts(0, 0), "a"),   # == interval start (inclusive)
            (1, _ts(5, 59, 59), "b"),
            (1, _ts(6, 0), "c"),   # == interval end (exclusive)
            (2, _ts(3, 0), "d"),   # right key, inside window of key 1 only
            (1, _ts(23, 0), "e"),  # no interval covers it
        ],
        "user_id long, ts timestamp_ntz, tag string",
    )
    intervals = spark.createDataFrame(
        [
            (1, 10, _ts(0), _ts(6)),    # [00:00, 06:00) — spans 7 hour-buckets
            (1, 11, _ts(5), _ts(7)),    # overlaps the first interval
            (2, 20, _ts(4), _ts(5)),    # covers nothing of key 2's events
            (1, 30, _ts(9), _ts(9)),    # empty (start == end) — matches nothing
        ],
        "user_id long, iv_id long, ws timestamp_ntz, we timestamp_ntz",
    )
    return events, intervals


def _pairs(df):
    return sorted((r.tag, r.iv_id) for r in df.collect())


def test_inner_matches_exactly_no_duplicates(frames):
    events, intervals = frames
    out = interval_join_bucketed(
        events, intervals, key="user_id", ts="ts", start="ws", end="we", bucket="1 hour"
    )
    # a: start-inclusive; b: matches BOTH overlapping intervals, once each;
    # c: end-exclusive (6:00 not in [0,6) but in [5,7)); d/e: no match
    assert _pairs(out) == [("a", 10), ("b", 10), ("b", 11), ("c", 11)]


def test_bucket_width_does_not_change_semantics(frames):
    events, intervals = frames
    fine = interval_join_bucketed(
        events, intervals, key="user_id", ts="ts", start="ws", end="we", bucket="17 minutes"
    )
    coarse = interval_join_bucketed(
        events, intervals, key="user_id", ts="ts", start="ws", end="we", bucket="2 days"
    )
    assert _pairs(fine) == _pairs(coarse)


def test_left_join_keeps_unmatched_events(frames):
    events, intervals = frames
    out = interval_join_bucketed(
        events, intervals, key="user_id", ts="ts", start="ws", end="we",
        bucket="1 hour", how="left",
    )
    rows = out.collect()
    unmatched = [r.tag for r in rows if r.iv_id is None]
    assert sorted(unmatched) == ["d", "e"]
    assert len(rows) == 4 + 2  # 4 matches + 2 null-extended


def test_rejects_unknown_join_type(frames):
    events, intervals = frames
    with pytest.raises(ValueError, match="inner.*left"):
        interval_join_bucketed(
            events, intervals, key="user_id", ts="ts", start="ws", end="we", how="outer"
        )


@pytest.fixture(scope="module")
def subsecond_frames(spark):
    """Sub-second interval bounds — ADVICE r5 high: second-granularity
    bucketing truncated the top bucket and silently dropped events landing
    in the interval's final fractional-second stretch."""
    us = dt.timedelta(microseconds=1)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    events = spark.createDataFrame(
        [
            (1, base + dt.timedelta(seconds=2, microseconds=499_999), "in_tail"),
            (1, base + dt.timedelta(seconds=2, microseconds=500_000), "at_end"),
            (1, base + dt.timedelta(microseconds=1), "early"),
            (1, base + dt.timedelta(seconds=2, microseconds=500_001), "late"),
        ],
        "user_id long, ts timestamp_ntz, tag string",
    )
    intervals = spark.createDataFrame(
        # [00:00:00.000001, 00:00:02.500000) — both bounds sub-second
        [(1, 10, base + us, base + dt.timedelta(seconds=2, microseconds=500_000))],
        "user_id long, iv_id long, ws timestamp_ntz, we timestamp_ntz",
    )
    return events, intervals


def test_subsecond_bounds_lose_no_matches(subsecond_frames):
    events, intervals = subsecond_frames
    out = interval_join_bucketed(
        events, intervals, key="user_id", ts="ts", start="ws", end="we",
        bucket="1 second",
    )
    # in_tail sits past the last whole-second boundary but before end —
    # the µs-exact top bucket must still cover it; end stays exclusive.
    assert _pairs(out) == [("early", 10), ("in_tail", 10)]


def test_session_timezone_does_not_change_results(spark, frames):
    """ADVICE r5 medium: bucket width and NTZ µs must both be computed
    timezone-independently — a fixed non-UTC offset used to shrink the
    width (empty join in the worst case)."""
    events, intervals = frames
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = _pairs(
            interval_join_bucketed(
                events, intervals, key="user_id", ts="ts", start="ws", end="we",
                bucket="1 hour",
            )
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert shifted == [("a", 10), ("b", 10), ("b", 11), ("c", 11)]


def test_rejects_mixed_timestamp_flavors(spark, frames):
    events, intervals = frames
    from pyspark.sql import functions as F

    tz_events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(TypeError, match="mixed timestamp flavors"):
        interval_join_bucketed(
            tz_events, intervals, key="user_id", ts="ts", start="ws", end="we"
        )


def test_rejects_nonpositive_bucket(frames):
    events, intervals = frames
    with pytest.raises(ValueError, match="positive"):
        interval_join_bucketed(
            events, intervals, key="user_id", ts="ts", start="ws", end="we",
            bucket="-1 hour",
        )
