"""Byte-level contract for sources/proto.py: the hand-written protobuf
codec must produce EXACTLY the wire bytes the public Bigtable v2 /
google.rpc protos define (goldens hand-assembled from the wire-format
spec: tag = (field<<3)|wire_type, LEB128 varints, length-delimited
submessages), and decode(encode(x)) must be the identity on every
request shape the engine's builders emit."""

from __future__ import annotations

import pytest

from datafusion_bigtable_spark.config import BigtableTableConfig, ColumnSpec
from datafusion_bigtable_spark.plans.composer import KeyRange
from datafusion_bigtable_spark.sources import proto
from datafusion_bigtable_spark.sources.grpc_transport import (
    build_mutate_rows_request,
    build_read_rows_request,
)

# --- primitives --------------------------------------------------------------


def test_varint_goldens():
    assert proto.encode_varint(0) == b"\x00"
    assert proto.encode_varint(1) == b"\x01"
    assert proto.encode_varint(127) == b"\x7f"
    assert proto.encode_varint(128) == b"\x80\x01"
    assert proto.encode_varint(300) == b"\xac\x02"  # the spec's worked example
    # negative int64: 64-bit two's complement, ten bytes
    assert proto.encode_varint(-1) == b"\xff" * 9 + b"\x01"
    for n in (0, 1, 127, 128, 300, 2**63 - 1, -1, -(2**63)):
        assert proto.decode_varint(proto.encode_varint(n), 0) == (n, len(proto.encode_varint(n)))


def test_varint_rejects_truncation_and_overlength():
    with pytest.raises(ValueError):
        proto.decode_varint(b"\x80", 0)
    with pytest.raises(ValueError):
        proto.decode_varint(b"\xff" * 11, 0)


# --- byte goldens ------------------------------------------------------------


def test_read_rows_request_golden_bytes():
    req = {
        "table_name": "t",
        "rows": {
            "row_keys": [b"k1"],
            "row_ranges": [{"start_key_closed": b"a", "end_key_open": b"b"}],
        },
        "filter": {
            "chain": {
                "filters": [
                    {"family_name_regex_filter": "cf"},
                    {"cells_per_column_limit_filter": 1},
                ]
            }
        },
        "rows_limit": 2,
    }
    rowset = b"\x0a\x02k1" + b"\x12\x06" + b"\x0a\x01a\x1a\x01b"
    chain = b"\x0a\x04\x2a\x02cf" + b"\x0a\x02\x60\x01"
    filt = b"\x0a\x0a" + chain
    want = (
        b"\x0a\x01t"          # table_name = 1 (LEN)
        + b"\x12\x0c" + rowset  # rows = 2
        + b"\x1a\x0c" + filt    # filter = 3
        + b"\x20\x02"           # rows_limit = 4 (VARINT)
    )
    assert proto.encode_read_rows_request(req) == want
    assert proto.decode_read_rows_request(want) == req


def test_cell_chunk_stream_golden_bytes():
    rows = [("rk", [("cf", "q", 7, b"v")])]
    chunk = (
        b"\x0a\x02rk"            # row_key = 1
        + b"\x12\x04\x0a\x02cf"  # family_name = 2 (StringValue wrapper)
        + b"\x1a\x03\x0a\x01q"   # qualifier = 3 (BytesValue wrapper)
        + b"\x20\x07"            # timestamp_micros = 4
        + b"\x32\x01v"           # value = 6
        + b"\x48\x01"            # commit_row = 9
    )
    want = b"\x0a" + bytes([len(chunk)]) + chunk
    assert proto.encode_read_rows_response(rows) == want
    asm = proto.CellChunkReassembler()
    assert list(asm.feed(want)) == [("rk", [("cf", "q", 7, b"v")])]
    asm.finish()


def test_status_golden_bytes():
    want = b"\x08\x05" + b"\x12\x0b" + b"KeyError: x"
    assert proto.encode_status(5, "KeyError: x") == want
    assert proto.decode_status(want) == {"code": 5, "message": "KeyError: x"}
    assert proto.encode_status(0) == b""  # OK is the empty message
    assert proto.decode_status(b"") == {"code": 0, "message": ""}


def test_sample_row_keys_golden_bytes():
    want = b"\x0a\x02rk" + b"\x10\x80\x02"  # row_key = 1; offset_bytes = 2 (=256)
    assert proto.encode_sample_row_keys_response({"row_key": "rk", "offset_bytes": 256}) == want
    assert proto.decode_sample_row_keys_response(want) == {"row_key": "rk", "offset_bytes": 256}


# --- chunk protocol semantics ------------------------------------------------


def test_chunk_carry_over_within_row():
    """family/qualifier encode only when they CHANGE within a row — the
    stream-compression half of the CellChunk contract — and the
    reassembler restores them."""
    rows = [("r", [("cf", "a", 2, b"x"), ("cf", "a", 1, b"y"), ("cf", "b", 9, b"z")])]
    buf = proto.encode_read_rows_response(rows)
    # qualifier wrapper (field 3, tag 0x1a) appears twice: for "a" and "b";
    # family wrapper (field 2 wrapping "cf") exactly once
    assert buf.count(b"\x12\x04\x0a\x02cf") == 1
    assert buf.count(b"\x1a\x03\x0a\x01a") == 1 and buf.count(b"\x1a\x03\x0a\x01b") == 1
    asm = proto.CellChunkReassembler()
    assert list(asm.feed(buf)) == rows
    asm.finish()


def test_encode_rejects_celless_row():
    """ADVICE r9: a row with no cells cannot be represented (no chunk ->
    no commit_row) — it must fail loud, never silently vanish from the
    stream as if filtered."""
    with pytest.raises(ValueError, match="no cells"):
        proto.encode_read_rows_response([("r1", [("cf", "a", 1, b"x")]), ("r2", [])])


def test_reassembler_rejects_mid_row_stream_end():
    rows = [("r", [("cf", "a", 1, b"x"), ("cf", "a", 2, b"y")])]
    buf = proto.encode_read_rows_response(rows)
    # drop the final chunk (the one carrying commit_row)
    chunks = [(f, v) for f, _, v in proto.iter_fields(buf)]
    truncated = b"".join(proto._f_bytes(1, v) for _, v in chunks[:-1])
    asm = proto.CellChunkReassembler()
    assert list(asm.feed(truncated)) == []
    with pytest.raises(ValueError, match="mid-row"):
        asm.finish()


def test_reassembler_rejects_unsupported_features():
    # value_size (split values) and reset_row must raise, not mis-assemble
    base = b"\x0a\x01r" + b"\x12\x04\x0a\x02cf" + b"\x1a\x03\x0a\x01q"
    split = proto._f_bytes(1, base + b"\x38\x05")  # value_size = 7
    with pytest.raises(ValueError, match="value_size"):
        list(proto.CellChunkReassembler().feed(split))
    reset = proto._f_bytes(1, base + b"\x40\x01")  # reset_row = 8
    with pytest.raises(ValueError, match="reset_row"):
        list(proto.CellChunkReassembler().feed(reset))


# --- round trips over the engine's real request shapes -----------------------

FAMILY = "measurements"


def _config(**kw) -> BigtableTableConfig:
    base = dict(
        table="weather_balloons",
        column_family=FAMILY,
        columns=(ColumnSpec("pressure", "int64"), ColumnSpec("temperature", "string")),
        table_partition_cols=("region", "balloon_id", "event_minute"),
        only_read_latest=True,
        allow_full_scan=True,
    )
    base.update(kw)
    return BigtableTableConfig(**base)


READ_SHAPES = [
    dict(ranges=[], preds=()),
    dict(ranges=[KeyRange("a#1#x", "a#1#y"), KeyRange("b#2#x", "b#2#y")], preds=()),
    dict(ranges=[], preds=(), proj=("pressure",)),
    # sign-split int64 bound: raw \x80... and \xff... bytes on the wire
    dict(ranges=[], preds=(("pressure", "ge", -3),)),
    dict(ranges=[], preds=(("pressure", "lt", 95000),)),
    dict(ranges=[], preds=(), rows_limit=2),
    dict(ranges=[], preds=(), as_of_us=1614945665200000),
    dict(
        ranges=[KeyRange("u#3#p", "u#3#q")],
        preds=(("pressure", "ge", 94122), ("temperature", "eq", "9.6")),
        proj=("pressure", "temperature"),
        rows_limit=3,
    ),
    dict(ranges=[], preds=(), ts_range=(0, 5_000_000)),
]


@pytest.mark.parametrize("i", range(len(READ_SHAPES)))
def test_read_rows_request_round_trip(i):
    s = READ_SHAPES[i]
    req = build_read_rows_request(
        _config(),
        s["ranges"],
        projected_qualifiers=s.get("proj"),
        as_of_us=s.get("as_of_us"),
        value_preds=s["preds"],
        rows_limit=s.get("rows_limit"),
        ts_range_us=s.get("ts_range"),
    )
    assert proto.decode_read_rows_request(proto.encode_read_rows_request(req)) == req


def test_mutate_rows_request_round_trip():
    req = build_mutate_rows_request(
        _config(table_partition_cols=("_row_key",)),
        [
            ("w1", [(FAMILY, "pressure", 1_000_000, (-7).to_bytes(8, "big", signed=True))]),
            ("w2", [(FAMILY, "temperature", 2_000_000, b"a"), (FAMILY, "pressure", 2_000_000, b"\x00" * 8)]),
        ],
    )
    assert proto.decode_mutate_rows_request(proto.encode_mutate_rows_request(req)) == req


def test_mutate_rows_response_round_trip():
    entries = [{"index": 0, "status": {"code": 0}}, {"index": 1, "status": {"code": 0}}]
    buf = proto.encode_mutate_rows_response(entries)
    assert proto.decode_mutate_rows_response(buf) == entries


def test_read_rows_response_round_trip_adversarial_bytes():
    import random

    rng = random.Random(11)
    rows = []
    for r in range(5):
        cells = [
            (
                FAMILY,
                f"q{c}",
                rng.randrange(2**40),
                bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40))),
            )
            for c in range(rng.randrange(1, 4))
        ]
        rows.append((f"row-µ-{r}", cells))
    asm = proto.CellChunkReassembler()
    out = []
    # rows split across several response messages, like the wire batches
    for i in range(0, len(rows), 2):
        out.extend(asm.feed(proto.encode_read_rows_response(rows[i : i + 2])))
    asm.finish()
    assert out == rows


# --- hypothesis: random RowFilter trees round-trip ---------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_leaf_filters = st.one_of(
    st.fixed_dictionaries({"family_name_regex_filter": st.text(max_size=12)}),
    st.fixed_dictionaries({"column_qualifier_regex_filter": st.binary(max_size=12)}),
    st.fixed_dictionaries({"value_regex_filter": st.binary(max_size=12)}),
    st.fixed_dictionaries({"cells_per_column_limit_filter": st.integers(1, 100)}),
    st.fixed_dictionaries({"row_key_regex_filter": st.binary(max_size=12)}),
    st.fixed_dictionaries({"pass_all_filter": st.just(True)}),
    st.fixed_dictionaries(
        {},
        optional={
            "start_timestamp_micros": st.integers(0, 2**40),
            "end_timestamp_micros": st.integers(0, 2**40),
        },
    ).filter(bool).map(lambda tr: {"timestamp_range_filter": tr}),
    st.fixed_dictionaries(
        {},
        optional={
            "start_value_closed": st.binary(max_size=9),
            "start_value_open": st.binary(max_size=9),
            "end_value_closed": st.binary(max_size=9),
            "end_value_open": st.binary(max_size=9),
        },
    ).filter(bool).map(lambda vr: {"value_range_filter": vr}),
)

_filter_trees = st.recursive(
    _leaf_filters,
    lambda kids: st.one_of(
        st.lists(kids, min_size=1, max_size=4).map(lambda fs: {"chain": {"filters": fs}}),
        st.lists(kids, min_size=1, max_size=4).map(lambda fs: {"interleave": {"filters": fs}}),
    ),
    max_leaves=12,
)


@settings(max_examples=300, deadline=None)
@given(flt=_filter_trees)
def test_row_filter_tree_round_trip(flt):
    assert proto.decode_row_filter(proto.encode_row_filter(flt)) == flt
