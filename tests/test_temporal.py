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


def test_asof_join_semantics(spark):
    """asof_join (r11): latest on-or-before right row wins; an order at
    the exact event instant IS visible; ties at one timestamp break
    toward the greatest tie value; no prior right row → NULLs."""
    from datafusion_bigtable_spark.operators.temporal import asof_join

    ev = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 250), (3, 1, 300), (4, 2, 50)],
        "event_id long, user_id long, ts_us long",
    )
    orders = spark.createDataFrame(
        [
            (10, 1, 100, 5.0),   # at event 1's exact instant — visible to it
            (11, 1, 200, 7.0),   # tie pair at t=200 ...
            (12, 1, 200, 9.0),   # ... greatest orderkey (12) must win
            (13, 2, 60, 3.0),    # AFTER user 2's only event — invisible
        ],
        "o_orderkey long, o_custkey long, o_us long, o_totalprice double",
    )
    out = {
        r["event_id"]: (r["o_orderkey"], r["o_totalprice"])
        for r in asof_join(
            ev, orders,
            left_key="user_id", right_key="o_custkey",
            left_ts="ts_us", right_ts="o_us",
            right_values=("o_orderkey", "o_totalprice"), right_tie="o_orderkey",
        ).collect()
    }
    assert out[1] == (10, 5.0)      # on-or-before includes the instant
    assert out[2] == (12, 9.0)      # tie → greatest orderkey
    assert out[3] == (12, 9.0)      # still latest at t=300
    assert out[4] == (None, None)   # nothing precedes user 2's event


def test_asof_join_matches_bruteforce_reference(spark):
    """Property check on a deterministic pseudo-random instance: the
    window-form as-of equals the obvious per-event scan (latest
    on-or-before, ties toward greatest orderkey)."""
    import hashlib

    from datafusion_bigtable_spark.operators.temporal import asof_join

    def h(*xs):
        return int.from_bytes(
            hashlib.md5("|".join(map(str, xs)).encode()).digest()[:4], "big"
        )

    evs = [(i, h("k", i) % 5, h("t", i) % 97) for i in range(60)]
    orders = [(100 + j, h("ok", j) % 5, h("ot", j) % 97, float(j)) for j in range(40)]

    def expect(uid, ts):
        best = None
        for okey, ck, ot, tot in orders:
            if ck == uid and ot <= ts:
                cand = (ot, okey, tot)
                if best is None or cand[:2] > best[:2]:
                    best = cand
        return (best[1], best[2]) if best else (None, None)

    out = asof_join(
        spark.createDataFrame(evs, "event_id long, user_id long, ts_us long"),
        spark.createDataFrame(orders, "o_orderkey long, o_custkey long, o_us long, o_totalprice double"),
        left_key="user_id", right_key="o_custkey",
        left_ts="ts_us", right_ts="o_us",
        right_values=("o_orderkey", "o_totalprice"), right_tie="o_orderkey",
    ).collect()
    assert len(out) == 60
    for r in out:
        assert (r["o_orderkey"], r["o_totalprice"]) == expect(r["user_id"], r["ts_us"]), r


def test_asof_join_tolerance_gates_stale_matches(spark):
    """tolerance=: a match older than the bound reverts to NULLs, an
    in-window match (including exactly at the bound) survives, and rows
    with no prior match stay NULL as before."""
    from datafusion_bigtable_spark.operators.temporal import asof_join

    evs = spark.createDataFrame(
        [(1, 11, 100), (2, 11, 250), (3, 11, 1000), (4, 12, 50)],
        "event_id long, user_id long, ts_us long",
    )
    orders = spark.createDataFrame(
        [(900, 11, 90, 1.0), (901, 11, 200, 2.0)],
        "o_orderkey long, o_custkey long, o_us long, o_totalprice double",
    )
    out = {
        r["event_id"]: (r["o_orderkey"], r["o_totalprice"])
        for r in asof_join(
            evs, orders,
            left_key="user_id", right_key="o_custkey",
            left_ts="ts_us", right_ts="o_us",
            right_values=("o_orderkey", "o_totalprice"), right_tie="o_orderkey",
            tolerance=50,
        ).collect()
    }
    assert out[1] == (900, 1.0)   # age 10 ≤ 50
    assert out[2] == (901, 2.0)   # age exactly 50 — inclusive bound
    assert out[3] == (None, None)  # latest match is 800 stale — gated
    assert out[4] == (None, None)  # no prior match at all
    # and tolerance=None must be unchanged: event 3 keeps the stale match
    full = {
        r["event_id"]: r["o_orderkey"]
        for r in asof_join(
            evs, orders,
            left_key="user_id", right_key="o_custkey",
            left_ts="ts_us", right_ts="o_us",
            right_values=("o_orderkey", "o_totalprice"), right_tie="o_orderkey",
        ).collect()
    }
    assert full[3] == 901


def test_asof_join_null_valued_matched_row_is_row_semantic(spark):
    """ADVICE r11 #3: when the MATCHED (latest prior) right row carries a
    NULL value column, that NULL must be emitted — pandas merge_asof row
    semantics — never an older row's non-null value surfacing under the
    newer row's freshness gate.  Exercises both the tolerance gate and
    the ungated path."""
    from datafusion_bigtable_spark.operators.temporal import asof_join

    evs = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 200)], "event_id long, user_id long, ts_us long"
    )
    # right rows: ts=90 has a NON-NULL price; ts=95 (the match) has NULL
    orders = spark.createDataFrame(
        [(1, 90, 900, 1.0), (1, 95, 901, None)],
        "o_custkey long, o_us long, o_orderkey long, o_totalprice double",
    )
    for tol in (None, 1_000):
        out = {
            r["event_id"]: (r["o_orderkey"], r["o_totalprice"])
            for r in asof_join(
                evs, orders,
                left_key="user_id", right_key="o_custkey",
                left_ts="ts_us", right_ts="o_us",
                right_values=("o_orderkey", "o_totalprice"), right_tie="o_orderkey",
                tolerance=tol,
            ).collect()
        }
        # matched row is (901, NULL): the NULL rides along, 1.0 must NOT
        assert out[1] == (901, None), (tol, out)
        assert out[2] == (901, None), (tol, out)
    # pandas reference (merge_asof emits the matched row as a unit)
    import pandas as pd

    ref = pd.merge_asof(
        pd.DataFrame({"ts": [100, 200], "user_id": [1, 1], "event_id": [1, 2]}).sort_values("ts"),
        pd.DataFrame({"ts": [90, 95], "o_custkey": [1, 1], "o_orderkey": [900, 901],
                      "o_totalprice": [1.0, None]}).sort_values("ts"),
        on="ts", left_by="user_id", right_by="o_custkey",
    )
    assert list(ref["o_orderkey"]) == [901, 901]
    assert ref["o_totalprice"].isna().all()
