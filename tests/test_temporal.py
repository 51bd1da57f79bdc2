"""operators/temporal.py — changelog→SCD2 compaction contract.

The oracle gate (`scd2_user_segments`) verifies against testdata; these
pin the operator semantics: consecutive-duplicate collapse, null-safe
transitions, open last interval, timestamp tie-breaking.
"""

from __future__ import annotations

import datetime as dt

import pytest

from datafusion_bigtable_spark.operators.temporal import changelog_to_scd2


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def log(spark):
    return spark.createDataFrame(
        [
            (1, _t(0), "a", 100),
            (1, _t(1), "a", 101),   # repeat — must collapse into the first
            (1, _t(2), "b", 102),
            (1, _t(3), None, 103),  # transition TO null is a real state
            (1, _t(4), None, 104),  # null repeat — collapses
            (1, _t(5), "b", 105),   # transition FROM null
            (2, _t(0), "x", 200),   # second key, single version
        ],
        "user_id long, ts timestamp_ntz, seg string, event_id long",
    )


def _rows(df):
    rows = [(r.user_id, r.valid_from, r.valid_to, r.seg) for r in df.collect()]
    # None valid_to (open interval) sorts last within its key
    return sorted(rows, key=lambda t: (t[0], t[1], t[2] is None, str(t[2]), str(t[3])))


def test_scd2_collapse_and_nullsafe_transitions(log):
    out = changelog_to_scd2(log, key="user_id", ts="ts", value="seg", tie=("event_id",))
    assert _rows(out) == [
        (1, _t(0), _t(2), "a"),      # repeat at _t(1) extended, not split
        (1, _t(2), _t(3), "b"),
        (1, _t(3), _t(5), None),     # null state survives with an interval
        (1, _t(5), None, "b"),       # open current interval
        (2, _t(0), None, "x"),
    ]


def test_scd2_intervals_tile_each_key(log):
    """valid_to of each interval == valid_from of the key's next one —
    the SCD2 invariant point-in-time lookups rely on."""
    out = changelog_to_scd2(log, key="user_id", ts="ts", value="seg", tie=("event_id",))
    by_key: dict = {}
    for r in sorted(out.collect(), key=lambda r: (r.user_id, r.valid_from)):
        by_key.setdefault(r.user_id, []).append(r)
    for rows in by_key.values():
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
        assert rows[-1].valid_to is None


def test_scd2_equal_ts_tiebreak(spark):
    """Two versions in the same microsecond order by the tie column; the
    transition sequence follows that total order deterministically."""
    df = spark.createDataFrame(
        [(1, _t(0), "a", 2), (1, _t(0), "b", 1)],
        "user_id long, ts timestamp_ntz, seg string, event_id long",
    )
    out = changelog_to_scd2(df, key="user_id", ts="ts", value="seg", tie=("event_id",))
    assert _rows(out) == [(1, _t(0), _t(0), "b"), (1, _t(0), None, "a")]
