"""Real-SDK adapter (grpc_transport.RealSdkBigtableService).

Tier 1 runs WITHOUT the SDK: the request-dict → RowFilter translation is
exercised against a recording stub of ``google.cloud.bigtable.row_filters``
so the logic is pinned in-sandbox.  Tier 2 is the reference's actual CI
workflow (Makefile:1-15, .github/workflows/rust.yml:22-38 — cargo test
against a dockerized emulator): it runs ONLY when BIGTABLE_EMULATOR_HOST
is set and google-cloud-bigtable is installed, driving the golden
composite-key queries write-then-read through the live emulator.
"""

from __future__ import annotations

import os

import pytest

from datafusion_bigtable_spark.config import BigtableTableConfig, ColumnSpec
from datafusion_bigtable_spark.plans.composer import Between, Eq, In, KeyRange
from datafusion_bigtable_spark.sources.grpc_transport import (
    BIGTABLE_EMULATOR_ENV,
    RealSdkBigtableService,
    build_read_rows_request,
    real_sdk_service,
    sdk_row_filter,
)

CFG = BigtableTableConfig(
    table="weather_balloons",
    column_family="measurements",
    columns=(ColumnSpec("pressure", "int64"), ColumnSpec("temperature", "string")),
    table_partition_cols=("region", "balloon_id", "event_minute"),
    project="p1",
    instance="i1",
)


# --- tier 1: translation, no SDK needed --------------------------------------


class _Rec:
    """Recording stand-in for one row_filters class."""

    def __init__(self, *args, **kw):
        self.args = args
        self.kw = kw

    def __repr__(self):
        name = type(self).__name__
        return f"{name}({self.args!r}, {self.kw!r})"


class _StubRF:
    class RowFilterChain(_Rec):
        pass

    class RowFilterUnion(_Rec):
        pass

    class FamilyNameRegexFilter(_Rec):
        pass

    class CellsColumnLimitFilter(_Rec):
        pass

    class ColumnQualifierRegexFilter(_Rec):
        pass

    class ValueRegexFilter(_Rec):
        pass

    class TimestampRange(_Rec):
        pass

    class TimestampRangeFilter(_Rec):
        pass

    class ValueRangeFilter(_Rec):
        pass


def test_sdk_filter_translation_mirrors_request_grammar():
    req = build_read_rows_request(
        CFG,
        [KeyRange("a", "b")],
        projected_qualifiers=["pressure", "temperature"],
        as_of_us=1_000_000,
        value_preds=[("pressure", "ge", -5)],
        rows_limit=7,
    )
    tree = sdk_row_filter(req["filter"], _StubRF)
    assert isinstance(tree, _StubRF.RowFilterChain)
    parts = tree.kw["filters"]
    # family pin → as-of ts bound → cells-per-column 1 → qualifier regex →
    # one Interleave for the value predicate
    assert isinstance(parts[0], _StubRF.FamilyNameRegexFilter)
    assert parts[0].args == ("measurements",)
    assert isinstance(parts[1], _StubRF.TimestampRangeFilter)
    tr = parts[1].args[0]
    assert isinstance(tr, _StubRF.TimestampRange)
    assert tr.kw["start"] is None
    assert tr.kw["end"].timestamp() == pytest.approx(1.000001)  # +1µs exclusive
    assert isinstance(parts[2], _StubRF.CellsColumnLimitFilter)
    assert parts[2].args == (1,)
    assert isinstance(parts[3], _StubRF.ColumnQualifierRegexFilter)
    assert parts[3].args == (b"pressure|temperature",)
    assert isinstance(parts[4], _StubRF.RowFilterUnion)
    target, keep_rest = parts[4].kw["filters"]
    assert isinstance(target, _StubRF.RowFilterChain)
    qual_pin, vr = target.kw["filters"]
    assert qual_pin.args == (b"pressure",)
    # pressure >= -5 over big-endian two's complement splits on sign:
    # [enc(-5), FF*8] ∪ [00*8, 7F FF*7] — an inner union of two ranges
    assert isinstance(vr, _StubRF.RowFilterUnion)
    r1, r2 = vr.kw["filters"]
    assert r1.kw == {
        "start_value": (-5).to_bytes(8, "big", signed=True),
        "inclusive_start": True,
        "end_value": b"\xff" * 8,
        "inclusive_end": True,
    }
    assert r2.kw["start_value"] == b"\x00" * 8
    assert isinstance(keep_rest, _StubRF.ColumnQualifierRegexFilter)
    assert keep_rest.args == (b"temperature",)


def test_sdk_filter_open_bounds_translate_exclusive():
    node = {"value_range_filter": {"start_value_open": b"a", "end_value_closed": b"z"}}
    f = sdk_row_filter(node, _StubRF)
    assert f.kw == {
        "start_value": b"a",
        "inclusive_start": False,
        "end_value": b"z",
        "inclusive_end": True,
    }


class _StubRowSet:
    def __init__(self):
        self.ranges = []
        self.keys = []

    def add_row_range_from_keys(
        self, start_key=None, end_key=None, start_inclusive=True, end_inclusive=False
    ):
        self.ranges.append((start_key, end_key, start_inclusive, end_inclusive))

    def add_row_key(self, key):
        self.keys.append(key)


class _StubRSMod:
    RowSet = _StubRowSet


class _StubTable:
    def __init__(self):
        self.calls = []

    def read_rows(self, **kw):
        self.calls.append(kw)
        return iter(())


def test_sdk_range_translation_handles_all_four_bound_kinds(monkeypatch):
    """ADVICE r12 (medium): the DS endpoint scan emits start_key_open for
    split partitions and the wire client's mid-stream resume rewrites ranges
    to start_key_open — the adapter must mirror the fake's four-key range
    vocabulary (fake_bigtable._key_selected), not hardcode the closed keys."""
    svc = RealSdkBigtableService(CFG)
    tbl = _StubTable()
    monkeypatch.setattr(svc, "_modules", lambda: (None, _StubRF, _StubRSMod))
    monkeypatch.setattr(svc, "table", lambda: tbl)
    req = {
        "rows": {
            "row_ranges": [
                {"start_key_closed": b"a", "end_key_closed": b"b"},
                {"start_key_open": b"m", "end_key_open": b"z"},
                {"start_key_open": b"q"},  # resume rewrite: unbounded end
            ],
            "row_keys": [b"k1"],
        }
    }
    assert list(svc.read_rows(req)) == []
    (kw,) = tbl.calls
    rs = kw["row_set"]
    assert rs.ranges == [
        (b"a", b"b", True, True),
        (b"m", b"z", False, False),
        (b"q", None, False, False),
    ]
    assert rs.keys == [b"k1"]


def test_sdk_filter_unknown_kind_fails_loud():
    with pytest.raises(NotImplementedError, match="block_all"):
        sdk_row_filter({"block_all_filter": True}, _StubRF)


def test_real_service_gate_mentions_emulator_when_set(monkeypatch):
    try:
        import google.cloud.bigtable  # noqa: F401

        pytest.skip("SDK installed — gate does not apply")
    except ImportError:
        pass
    monkeypatch.setenv(BIGTABLE_EMULATOR_ENV, "localhost:8086")
    with pytest.raises(NotImplementedError, match="localhost:8086"):
        real_sdk_service(CFG)


# --- tier 2: the live emulator path (reference Makefile:1-15) ----------------

_HAS_SDK = True
try:  # pragma: no cover - environment-dependent
    import google.cloud.bigtable  # noqa: F401
except ImportError:
    _HAS_SDK = False

live = pytest.mark.skipif(
    not os.environ.get(BIGTABLE_EMULATOR_ENV) or not _HAS_SDK,
    reason=(
        f"set {BIGTABLE_EMULATOR_ENV} and install google-cloud-bigtable to "
        "run the golden queries against a live emulator"
    ),
)


@live
def test_golden_round_trip_against_emulator():  # pragma: no cover - needs emulator
    """Write the weather-balloons golden cells through MutateRows, read
    them back through the composed key ranges + full filter chain, and
    match the in-process fake byte-for-byte — the reference's
    emulator-validation workflow, on our engine."""
    from google.cloud import bigtable

    from datafusion_bigtable_spark.sources.cells import weather_balloons_cells, _naive_datetime_to_us
    from datafusion_bigtable_spark.sources.fake_bigtable import InProcessBigtableService
    from datafusion_bigtable_spark.sources.grpc_transport import fetch_cells, push_cells
    from datafusion_bigtable_spark.plans.keycodec import encode_predicates
    from datafusion_bigtable_spark.plans.composer import compose

    # admin bootstrap: fresh table + column family on the emulator
    client = bigtable.Client(project=CFG.project, admin=True)
    table = client.instance(CFG.instance).table(CFG.table)
    if table.exists():
        table.delete()
    table.create(column_families={CFG.column_family: None})

    cells = [
        (k, f, q, _naive_datetime_to_us(ts), v)
        for k, f, q, ts, v in weather_balloons_cells()
    ]
    svc = real_sdk_service(CFG)
    assert push_cells(CFG, cells, service=svc) == len({c[0] for c in cells})

    ranges = compose(
        encode_predicates(
            [Eq("region", "us-west2"), In("balloon_id", ("3698",)),
             Between("event_minute", "2021-03-05-1200", "2021-03-05-1202")],
            CFG.table_partition_cols, CFG.key_types,
        ),
        CFG.table_partition_cols,
        CFG.table_partition_separator,
    )
    got = sorted(fetch_cells(CFG, ranges, service=svc))
    fake = InProcessBigtableService(
        [(k, f, q, ts, v) for k, f, q, ts, v in cells], table_name=None
    )
    want = sorted(fetch_cells(CFG, ranges, service=fake))
    assert got == want and len(got) == 6  # 3 rows × 2 qualifiers
