"""Protobuf wire-format codec for the Bigtable v2 messages this engine
speaks — stdlib only, no generated code.

The reference drives the real service through tonic-generated protobuf
stubs (reference Cargo.toml `bigtable_rs`; the read at
execute_plan.rs:168-183).  This container has neither ``grpcio`` nor
``protobuf``, so the encoding layer is written directly against the
protobuf WIRE FORMAT (varints + tagged fields + length-delimited
submessages) and the PUBLIC message definitions in
``googleapis/google/bigtable/v2/{bigtable,data}.proto`` and
``google/rpc/status.proto``.  Field numbers below are those protos';
byte-golden tests (tests/test_proto.py) pin the exact encodings.

Scope — exactly the engine's seam (sources/wire.py, grpc_transport.py):

- ``ReadRowsRequest``   (table_name=1, rows=2, filter=3, rows_limit=4,
                         app_profile_id=5)
- ``RowSet``            (row_keys=1, row_ranges=2) /
  ``RowRange``          (start_key_closed=1, start_key_open=2,
                         end_key_open=3, end_key_closed=4)
- ``RowFilter``         (chain=1, interleave=2, row_key_regex_filter=4,
                         family_name_regex_filter=5,
                         column_qualifier_regex_filter=6,
                         timestamp_range_filter=8, value_regex_filter=9,
                         cells_per_row_limit_filter=11,
                         cells_per_column_limit_filter=12,
                         strip_value_transformer=13, value_range_filter=15,
                         sink=16, pass_all_filter=17, block_all_filter=18)
- ``ReadRowsResponse``  (chunks=1) / ``CellChunk`` (row_key=1,
                         family_name=2 [StringValue], qualifier=3
                         [BytesValue], timestamp_micros=4, labels=5,
                         value=6, value_size=7, reset_row=8, commit_row=9)
- ``MutateRowsRequest`` (table_name=1, entries=2) with
  ``Entry`` (row_key=1, mutations=2), ``Mutation.set_cell=1``,
  ``SetCell`` (family_name=1, column_qualifier=2, timestamp_micros=3,
  value=4); ``MutateRowsResponse.Entry`` (index=1, status=2)
- ``SampleRowKeysRequest`` (table_name=1, app_profile_id=2) /
  ``SampleRowKeysResponse`` (row_key=1, offset_bytes=2)
- ``google.rpc.Status``  (code=1, message=2)

Dict mapping: every codec converts between bytes and the SAME request/
response dict shapes the rest of the engine already uses (the
grpc_transport.py builders and the fake service's yields), so the wire
layer swaps encodings without touching any consumer.

Presence semantics: keys that sit in proto oneofs (RowRange/ValueRange
bounds, CellChunk row_status) or behind wrapper types encode whenever the
dict carries them, even at their zero value; plain scalar fields that the
builders only emit when meaningful (rows_limit, timestamp bounds) encode
when the key is present — writing a zero varint is wire-legal and keeps
decode(encode(d)) == d, which the round-trip property tests rely on.

Deliberate deltas from the full protocol, all raise loudly rather than
mis-decode: CellChunk value splitting (value_size > 0), reset_row, and
labels are never emitted by this engine's server and are rejected by the
chunk reassembler; ``stride_bytes`` — the in-process fake's sample-density
test knob, not a service field — rides SampleRowKeysRequest as varint
field 1000, documented unknown-field territory a real server skips.
"""

from __future__ import annotations

from typing import Iterator

# -- primitive wire format ----------------------------------------------------

_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


def encode_varint(n: int) -> bytes:
    """Unsigned LEB128; negative int64 values go as their 64-bit two's
    complement (ten bytes), like protobuf's non-zigzag int64."""
    if n < 0:
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            if result >= 1 << 63:  # int64 two's complement
                result -= 1 << 64
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint longer than 10 bytes")


def _tag(field: int, wt: int) -> bytes:
    return encode_varint((field << 3) | wt)


def _f_varint(field: int, n: int) -> bytes:
    return _tag(field, _VARINT) + encode_varint(int(n))


def _f_bytes(field: int, payload: bytes) -> bytes:
    return _tag(field, _LEN) + encode_varint(len(payload)) + payload


def _f_str(field: int, s: str) -> bytes:
    return _f_bytes(field, s.encode("utf-8"))


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """(field, wire_type, value) triples; LEN fields yield bytes, varints
    yield ints.  Unknown wire types raise (nothing here emits them)."""
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        field, wt = key >> 3, key & 0x07
        if wt == _VARINT:
            val, pos = decode_varint(buf, pos)
        elif wt == _LEN:
            n, pos = decode_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError("truncated length-delimited field")
            val = buf[pos : pos + n]
            pos += n
        elif wt == _I64:
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wt == _I32:
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} for field {field}")
        yield field, wt, val


# -- RowSet / RowRange --------------------------------------------------------

_ROW_RANGE_FIELDS = {
    "start_key_closed": 1,
    "start_key_open": 2,
    "end_key_open": 3,
    "end_key_closed": 4,
}
_ROW_RANGE_NAMES = {v: k for k, v in _ROW_RANGE_FIELDS.items()}


def _enc_row_range(rr: dict) -> bytes:
    out = b""
    for key, field in _ROW_RANGE_FIELDS.items():
        if key in rr:
            out += _f_bytes(field, bytes(rr[key]))
    return out


def _dec_row_range(buf: bytes) -> dict:
    out: dict = {}
    for field, _, val in iter_fields(buf):
        name = _ROW_RANGE_NAMES.get(field)
        if name:
            out[name] = bytes(val)
    return out


def _enc_row_set(rows: dict) -> bytes:
    out = b""
    for rk in rows.get("row_keys", ()):
        out += _f_bytes(1, bytes(rk))
    for rr in rows.get("row_ranges", ()):
        out += _f_bytes(2, _enc_row_range(rr))
    return out


def _dec_row_set(buf: bytes) -> dict:
    out: dict = {"row_keys": [], "row_ranges": []}
    for field, _, val in iter_fields(buf):
        if field == 1:
            out["row_keys"].append(bytes(val))
        elif field == 2:
            out["row_ranges"].append(_dec_row_range(val))
    return out


# -- RowFilter ----------------------------------------------------------------


def _enc_timestamp_range(tr: dict) -> bytes:
    out = b""
    if "start_timestamp_micros" in tr:
        out += _f_varint(1, tr["start_timestamp_micros"])
    if "end_timestamp_micros" in tr:
        out += _f_varint(2, tr["end_timestamp_micros"])
    return out


def _dec_timestamp_range(buf: bytes) -> dict:
    out: dict = {}
    for field, _, val in iter_fields(buf):
        if field == 1:
            out["start_timestamp_micros"] = val
        elif field == 2:
            out["end_timestamp_micros"] = val
    return out


_VALUE_RANGE_FIELDS = {
    "start_value_closed": 1,
    "start_value_open": 2,
    "end_value_closed": 3,
    "end_value_open": 4,
}
_VALUE_RANGE_NAMES = {v: k for k, v in _VALUE_RANGE_FIELDS.items()}


def _enc_value_range(vr: dict) -> bytes:
    out = b""
    for key, field in _VALUE_RANGE_FIELDS.items():
        if key in vr:
            out += _f_bytes(field, bytes(vr[key]))
    return out


def _dec_value_range(buf: bytes) -> dict:
    out: dict = {}
    for field, _, val in iter_fields(buf):
        name = _VALUE_RANGE_NAMES.get(field)
        if name:
            out[name] = bytes(val)
    return out


def encode_row_filter(flt: dict) -> bytes:
    if len(flt) != 1:
        raise ValueError(f"RowFilter must set exactly one oneof key, got {sorted(flt)}")
    (key, val), = flt.items()
    if key in ("chain", "interleave"):
        field = 1 if key == "chain" else 2
        inner = b"".join(_f_bytes(1, encode_row_filter(f)) for f in val["filters"])
        return _f_bytes(field, inner)
    if key == "row_key_regex_filter":
        return _f_bytes(4, bytes(val))
    if key == "family_name_regex_filter":
        return _f_str(5, val)
    if key == "column_qualifier_regex_filter":
        return _f_bytes(6, bytes(val))
    if key == "timestamp_range_filter":
        return _f_bytes(8, _enc_timestamp_range(val))
    if key == "value_regex_filter":
        return _f_bytes(9, bytes(val))
    if key == "cells_per_row_limit_filter":
        return _f_varint(11, val)
    if key == "cells_per_column_limit_filter":
        return _f_varint(12, val)
    if key == "strip_value_transformer":
        return _f_varint(13, 1 if val else 0)
    if key == "value_range_filter":
        return _f_bytes(15, _enc_value_range(val))
    if key == "sink":
        return _f_varint(16, 1 if val else 0)
    if key == "pass_all_filter":
        return _f_varint(17, 1 if val else 0)
    if key == "block_all_filter":
        return _f_varint(18, 1 if val else 0)
    raise ValueError(f"unsupported RowFilter key {key!r}")


def decode_row_filter(buf: bytes) -> dict:
    for field, _, val in iter_fields(buf):
        if field in (1, 2):
            filters = [
                decode_row_filter(v)
                for f, _, v in iter_fields(val)
                if f == 1
            ]
            return {("chain" if field == 1 else "interleave"): {"filters": filters}}
        if field == 4:
            return {"row_key_regex_filter": bytes(val)}
        if field == 5:
            return {"family_name_regex_filter": val.decode("utf-8")}
        if field == 6:
            return {"column_qualifier_regex_filter": bytes(val)}
        if field == 8:
            return {"timestamp_range_filter": _dec_timestamp_range(val)}
        if field == 9:
            return {"value_regex_filter": bytes(val)}
        if field == 11:
            return {"cells_per_row_limit_filter": val}
        if field == 12:
            return {"cells_per_column_limit_filter": val}
        if field == 13:
            return {"strip_value_transformer": bool(val)}
        if field == 15:
            return {"value_range_filter": _dec_value_range(val)}
        if field == 16:
            return {"sink": bool(val)}
        if field == 17:
            return {"pass_all_filter": bool(val)}
        if field == 18:
            return {"block_all_filter": bool(val)}
        raise ValueError(f"unsupported RowFilter field {field}")
    raise ValueError("empty RowFilter")


# -- ReadRowsRequest ----------------------------------------------------------


def encode_read_rows_request(req: dict) -> bytes:
    out = b""
    if req.get("table_name"):
        out += _f_str(1, req["table_name"])
    if "rows" in req and req["rows"] is not None:
        out += _f_bytes(2, _enc_row_set(req["rows"]))
    if "filter" in req and req["filter"] is not None:
        out += _f_bytes(3, encode_row_filter(req["filter"]))
    if "rows_limit" in req and req["rows_limit"] is not None:
        out += _f_varint(4, req["rows_limit"])
    if req.get("app_profile_id"):
        out += _f_str(5, req["app_profile_id"])
    return out


def decode_read_rows_request(buf: bytes) -> dict:
    out: dict = {}
    for field, _, val in iter_fields(buf):
        if field == 1:
            out["table_name"] = val.decode("utf-8")
        elif field == 2:
            out["rows"] = _dec_row_set(val)
        elif field == 3:
            out["filter"] = decode_row_filter(val)
        elif field == 4:
            out["rows_limit"] = val
        elif field == 5:
            out["app_profile_id"] = val.decode("utf-8")
    return out


# -- ReadRowsResponse / CellChunk ---------------------------------------------


def encode_read_rows_response(rows: list[tuple[str, list]]) -> bytes:
    """One ReadRowsResponse for a batch of complete rows.

    Chunking mirrors the service's stream compression: row_key on a row's
    first chunk only; family_name/qualifier (wrapper-typed, so presence ==
    re-declaration) only when they change within the row; commit_row on
    the row's last chunk.
    """
    out = b""
    for row_key, cells in rows:
        if not cells:
            # ADVICE r9: a celless row would previously VANISH from the
            # stream (the chunk loop emits nothing, so no commit_row) —
            # an encoder bug upstream would read as "row filtered".
            # The protocol cannot represent an empty committed row; fail
            # loud at the boundary instead.
            raise ValueError(
                f"encode_read_rows_response: row {row_key!r} has no cells — "
                "a committed row must carry at least one chunk"
            )
        prev_fam = prev_qual = None
        for i, (family, qualifier, ts, value) in enumerate(cells):
            chunk = b""
            if i == 0:
                chunk += _f_bytes(1, row_key.encode("utf-8"))
            if family != prev_fam:
                chunk += _f_bytes(2, _f_str(1, family))  # StringValue wrapper
                prev_fam = family
                prev_qual = None  # family change re-declares the qualifier
            if qualifier != prev_qual:
                chunk += _f_bytes(3, _f_bytes(1, qualifier.encode("utf-8")))
                prev_qual = qualifier
            if ts:
                chunk += _f_varint(4, int(ts))
            if value:
                chunk += _f_bytes(6, bytes(value))
            if i == len(cells) - 1:
                chunk += _f_varint(9, 1)  # commit_row
            out += _f_bytes(1, chunk)
    return out


class CellChunkReassembler:
    """Stateful CellChunk → row reassembly (the client half of the chunk
    protocol).  Feed each ReadRowsResponse; complete rows come back as
    ``(row_key, [(family, qualifier, ts, value), ...])``.  Rejects the
    protocol features this engine's server never emits (split values,
    reset_row, labels) instead of silently mis-assembling them."""

    def __init__(self):
        self._row_key: str | None = None
        self._family: str | None = None
        self._qualifier: str | None = None
        self._cells: list = []

    def feed(self, response_buf: bytes) -> Iterator[tuple[str, list]]:
        for field, _, chunk_buf in iter_fields(response_buf):
            if field != 1:  # ignore last_scanned_row_key etc.
                continue
            ts = 0
            value = b""
            commit = False
            for f, _, v in iter_fields(chunk_buf):
                if f == 1:
                    key = bytes(v).decode("utf-8")
                    if self._row_key is not None and key != self._row_key:
                        raise ValueError("row_key changed before commit_row")
                    self._row_key = key
                elif f == 2:
                    self._family = _dec_wrapper_str(v)
                    self._qualifier = None
                elif f == 3:
                    self._qualifier = _dec_wrapper_bytes(v).decode("utf-8")
                elif f == 4:
                    ts = v
                elif f == 6:
                    value = bytes(v)
                elif f == 7 and v:
                    raise ValueError("split cell values (value_size) unsupported")
                elif f == 8 and v:
                    raise ValueError("reset_row unsupported")
                elif f == 9:
                    commit = bool(v)
                elif f == 5:
                    raise ValueError("cell labels unsupported")
            if self._row_key is None or self._family is None or self._qualifier is None:
                raise ValueError("chunk before row_key/family/qualifier declaration")
            self._cells.append((self._family, self._qualifier, ts, value))
            if commit:
                yield self._row_key, self._cells
                self._row_key, self._cells = None, []
                self._family = self._qualifier = None

    def finish(self) -> None:
        if self._row_key is not None:
            raise ValueError(f"stream ended mid-row {self._row_key!r}")


def _dec_wrapper_str(buf: bytes) -> str:
    for f, _, v in iter_fields(buf):
        if f == 1:
            return v.decode("utf-8")
    return ""


def _dec_wrapper_bytes(buf: bytes) -> bytes:
    for f, _, v in iter_fields(buf):
        if f == 1:
            return bytes(v)
    return b""


# -- MutateRows ---------------------------------------------------------------


def encode_mutate_rows_request(req: dict) -> bytes:
    out = b""
    if req.get("table_name"):
        out += _f_str(1, req["table_name"])
    for entry in req.get("entries", ()):
        rk = entry["row_key"]
        e = _f_bytes(1, rk if isinstance(rk, bytes) else str(rk).encode("utf-8"))
        for m in entry.get("mutations", ()):
            sc = m["set_cell"]
            qual = sc["column_qualifier"]
            body = (
                _f_str(1, sc["family_name"])
                + _f_bytes(2, qual if isinstance(qual, bytes) else str(qual).encode("utf-8"))
                + _f_varint(3, sc.get("timestamp_micros", 0))
                + _f_bytes(4, bytes(sc["value"]))
            )
            e += _f_bytes(2, _f_bytes(1, body))  # Mutation.set_cell = 1
        out += _f_bytes(2, e)
    return out


def decode_mutate_rows_request(buf: bytes) -> dict:
    out: dict = {"entries": []}
    for field, _, val in iter_fields(buf):
        if field == 1:
            out["table_name"] = val.decode("utf-8")
        elif field == 2:
            entry: dict = {"row_key": b"", "mutations": []}
            for f, _, v in iter_fields(val):
                if f == 1:
                    entry["row_key"] = bytes(v)
                elif f == 2:
                    for mf, _, mv in iter_fields(v):
                        if mf != 1:
                            raise ValueError(f"unsupported Mutation field {mf}")
                        sc: dict = {"timestamp_micros": 0, "value": b""}
                        for sf, _, sv in iter_fields(mv):
                            if sf == 1:
                                sc["family_name"] = sv.decode("utf-8")
                            elif sf == 2:
                                sc["column_qualifier"] = bytes(sv)
                            elif sf == 3:
                                sc["timestamp_micros"] = sv
                            elif sf == 4:
                                sc["value"] = bytes(sv)
                        entry["mutations"].append({"set_cell": sc})
            out["entries"].append(entry)
    return out


def encode_status(code: int, message: str = "") -> bytes:
    out = b""
    if code:
        out += _f_varint(1, code)
    if message:
        out += _f_str(2, message)
    return out


def decode_status(buf: bytes) -> dict:
    out = {"code": 0, "message": ""}
    for field, _, val in iter_fields(buf):
        if field == 1:
            out["code"] = val
        elif field == 2:
            out["message"] = val.decode("utf-8")
    return out


def encode_mutate_rows_response(entries: list[dict]) -> bytes:
    out = b""
    for e in entries:
        status = e.get("status") or {}
        body = _f_varint(1, e.get("index", 0)) + _f_bytes(
            2, encode_status(status.get("code", 0), status.get("message", ""))
        )
        out += _f_bytes(1, body)
    return out


def decode_mutate_rows_response(buf: bytes) -> list[dict]:
    out = []
    for field, _, val in iter_fields(buf):
        if field != 1:
            continue
        entry = {"index": 0, "status": {"code": 0}}
        for f, _, v in iter_fields(val):
            if f == 1:
                entry["index"] = v
            elif f == 2:
                st = decode_status(v)
                entry["status"] = (
                    {"code": st["code"], "message": st["message"]}
                    if st["message"]
                    else {"code": st["code"]}
                )
        out.append(entry)
    return out


# -- SampleRowKeys ------------------------------------------------------------

_STRIDE_EXT_FIELD = 1000  # test-only sample-density knob; see module doc


def encode_sample_row_keys_request(req: dict) -> bytes:
    out = b""
    if req.get("table_name"):
        out += _f_str(1, req["table_name"])
    if req.get("app_profile_id"):
        out += _f_str(2, req["app_profile_id"])
    if req.get("stride_bytes") is not None:
        out += _f_varint(_STRIDE_EXT_FIELD, req["stride_bytes"])
    return out


def decode_sample_row_keys_request(buf: bytes) -> dict:
    out: dict = {}
    for field, _, val in iter_fields(buf):
        if field == 1:
            out["table_name"] = val.decode("utf-8")
        elif field == 2:
            out["app_profile_id"] = val.decode("utf-8")
        elif field == _STRIDE_EXT_FIELD:
            out["stride_bytes"] = val
    return out


def encode_sample_row_keys_response(sample: dict) -> bytes:
    rk = sample["row_key"]
    out = _f_bytes(1, rk if isinstance(rk, bytes) else str(rk).encode("utf-8"))
    if sample.get("offset_bytes"):
        out += _f_varint(2, sample["offset_bytes"])
    return out


def decode_sample_row_keys_response(buf: bytes) -> dict:
    out = {"row_key": "", "offset_bytes": 0}
    for field, _, val in iter_fields(buf):
        if field == 1:
            out["row_key"] = val.decode("utf-8")
        elif field == 2:
            out["offset_bytes"] = val
    return out
