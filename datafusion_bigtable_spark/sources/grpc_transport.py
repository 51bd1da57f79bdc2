"""Real-Bigtable transport layer (gated) + wire-request shaping.

The reference issues one gRPC ``ReadRowsRequest`` per scan with a RowSet of
key ranges and a chained RowFilter (execute_plan.rs:168-183, built from
composer.rs:249-284).  This module reproduces that request shaping as pure
Python (unit-testable without any SDK), and gates the actual transport
behind an import-try: ``google-cloud-bigtable`` is not in this container,
so ``fetch_cells`` raises with a clear message unless the SDK is present.

Design: the request builder is the part with engine semantics (what gets
pushed to the server); the transport is a thin adapter that turns the
response cell stream into the canonical cells shape
(row_key, family, qualifier, ts, value) — after which every operator in
this package works identically over gRPC- or parquet-backed cells.

Quirk fixed vs the reference (SURVEY §2 A9): qualifier names are
re.escape()d before the regex alternation join, so a qualifier like
``a.b`` no longer over-matches ``axb``; and an all-key projection produces
NO qualifier filter instead of an empty regex that matches everything.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

from datafusion_bigtable_spark.config import BigtableTableConfig
from datafusion_bigtable_spark.plans.composer import KeyRange


def build_row_set(ranges: Sequence[KeyRange]) -> dict:
    """RowSet: closed key ranges; row_keys always empty like the reference
    (execute_plan.rs:172)."""
    return {
        "row_keys": [],
        "row_ranges": [
            {
                "start_key_closed": r.start.encode("utf-8"),
                "end_key_closed": r.end.encode("utf-8"),
            }
            for r in ranges
        ],
    }


def build_filter_chain(
    config: BigtableTableConfig,
    projected_qualifiers: Iterable[str] | None = None,
    value_range: tuple[bytes | None, bytes | None] | None = None,
    value_regex: bytes | None = None,
    as_of_us: int | None = None,
    ts_range_us: tuple[int | None, int | None] | None = None,
) -> list[dict]:
    """The reference's RowFilter chain (composer.rs:249-284):
    family pin → optional as-of timestamp bound → optional cells-per-column
    limit → qualifier regex → optional value range / value regex (the
    roadmap items README.md:46-49, here as the service's real
    ``value_range_filter`` — closed encoded-byte bounds — and
    ``value_regex_filter`` — RE2 over value bytes, unanchored).

    Chain ORDER carries the semantics: the as-of ``timestamp_range_filter``
    sits BEFORE the cells-per-column limit (bound-then-latest = the
    time-travel snapshot), while value filters are appended AFTER the
    limit — a value filter before it would change which version is
    "latest" (cell-level semantics, use only in version-unnest reads or
    when the caller re-filters).
    """
    chain: list[dict] = [{"family_name_regex_filter": config.column_family}]
    if as_of_us is not None:
        # Bigtable's end bound is EXCLUSIVE; +1 makes `ts <= as_of` inclusive
        chain.append({"timestamp_range_filter": {"end_timestamp_micros": as_of_us + 1}})
    if ts_range_us is not None:
        # Closed [lo, hi] cell-timestamp bound (the DS's version-unnest ts
        # pushdown over the wire).  Same placement discipline as as_of:
        # BEFORE any cells-per-column limit — callers gate this to unnest
        # reads where no limit exists, so bound-then-latest inversion
        # cannot arise.
        lo, hi = ts_range_us
        tr: dict = {}
        if lo is not None:
            tr["start_timestamp_micros"] = int(lo)
        if hi is not None:
            tr["end_timestamp_micros"] = int(hi) + 1
        if tr:
            chain.append({"timestamp_range_filter": tr})
    if config.only_read_latest:
        chain.append({"cells_per_column_limit_filter": 1})
    quals = list(projected_qualifiers) if projected_qualifiers is not None else list(config.qualifiers)
    if quals:  # empty projection → no filter, NOT match-everything regex
        pattern = "|".join(re.escape(q) for q in quals)
        chain.append({"column_qualifier_regex_filter": pattern.encode("utf-8")})
    if value_range is not None:
        lo, hi = value_range
        f: dict = {}
        if lo is not None:
            f["start_value_closed"] = lo
        if hi is not None:
            f["end_value_closed"] = hi
        chain.append({"value_range_filter": f})
    if value_regex is not None:
        chain.append({"value_regex_filter": value_regex})
    return chain


_INT64_NEG = (b"\x80" + b"\x00" * 7, b"\xff" * 8)  # two's-complement negatives
_INT64_POS = (b"\x00" * 8, b"\x7f" + b"\xff" * 7)


def encode_value_ranges(typ: str, op: str, value) -> list[dict]:
    """``value <op> literal`` as a UNION of service ValueRange payloads
    (closed/open byte bounds) over the ENCODED cell bytes.

    int64 cells are 8-byte big-endian two's complement: byte order is
    numeric order within one sign, but negatives sort ABOVE positives —
    so ordered predicates split into up to two sign intervals (the same
    decomposition the parquet path uses, datasource.py::_value_expr).
    String ranges are ASCII-gated: byte order equals code-point order only
    there (equality needs no order and takes any unicode)."""
    if typ in ("int64", "long"):
        enc = int(value).to_bytes(8, "big", signed=True)
        if op == "eq":
            return [{"start_value_closed": enc, "end_value_closed": enc}]
        lo_key = "start_value_closed" if op == "ge" else "start_value_open"
        hi_key = "end_value_closed" if op == "le" else "end_value_open"
        if op in ("ge", "gt"):
            if int(value) >= 0:
                return [{lo_key: enc, "end_value_closed": _INT64_POS[1]}]
            return [
                {lo_key: enc, "end_value_closed": _INT64_NEG[1]},
                {"start_value_closed": _INT64_POS[0], "end_value_closed": _INT64_POS[1]},
            ]
        if op in ("le", "lt"):
            if int(value) >= 0:
                return [
                    {"start_value_closed": _INT64_NEG[0], "end_value_closed": _INT64_NEG[1]},
                    {"start_value_closed": _INT64_POS[0], hi_key: enc},
                ]
            return [{"start_value_closed": _INT64_NEG[0], hi_key: enc}]
        raise ValueError(f"unsupported value op {op!r}")
    enc = value if isinstance(value, bytes) else str(value).encode("utf-8")
    if op == "eq":
        return [{"start_value_closed": enc, "end_value_closed": enc}]
    if not enc.isascii():
        raise ValueError(
            f"ordered value predicate on non-ASCII literal {value!r}: byte "
            "order diverges from code-point order — filter client-side"
        )
    key = {
        "ge": "start_value_closed",
        "gt": "start_value_open",
        "le": "end_value_closed",
        "lt": "end_value_open",
    }.get(op)
    if key is None:
        raise ValueError(f"unsupported value op {op!r}")
    return [{key: enc}]


def build_value_pred_filter(
    config: BigtableTableConfig,
    qualifier: str,
    op: str,
    value,
    projected_qualifiers: Iterable[str] | None = None,
) -> dict:
    """Per-qualifier value predicate as the service's real RowFilter idiom:
    ``Interleave(Chain(qualifier==q, ValueRange...), qualifier∈others)``.

    A bare ValueRangeFilter applies to EVERY cell in the row, so it would
    also drop other qualifiers' cells whose encoded bytes happen to fall
    outside the target column's bound (e.g. a string temperature tested
    against an int64 pressure range).  Scoping needs per-branch routing,
    and RE2 has no negative lookahead to express "not q" in one regex —
    the Interleave of a value-filtered target branch with a positive
    alternation of the OTHER projected qualifiers is the standard
    construction.  Branches are disjoint by qualifier, so the interleaved
    stream carries each cell at most once.

    Chain POSITION carries semantics exactly like build_filter_chain's
    value filters: append this AFTER the cells-per-column limit —
    latest-then-filter — never before it."""
    quals = list(projected_qualifiers) if projected_qualifiers is not None else list(config.qualifiers)
    if qualifier not in quals:
        raise ValueError(f"value predicate on unprojected qualifier {qualifier!r}")
    spec = {c.name: c.type for c in config.columns}
    ranges = encode_value_ranges(spec[qualifier], op, value)
    vr = (
        {"value_range_filter": ranges[0]}
        if len(ranges) == 1
        else {"interleave": {"filters": [{"value_range_filter": r} for r in ranges]}}
    )
    target = {
        "chain": {
            "filters": [
                {"column_qualifier_regex_filter": re.escape(qualifier).encode("utf-8")},
                vr,
            ]
        }
    }
    others = [q for q in quals if q != qualifier]
    if not others:
        return target
    keep_rest = {
        "column_qualifier_regex_filter": "|".join(re.escape(q) for q in others).encode("utf-8")
    }
    return {"interleave": {"filters": [target, keep_rest]}}


def build_read_rows_request(
    config: BigtableTableConfig,
    ranges: Sequence[KeyRange],
    projected_qualifiers: Iterable[str] | None = None,
    as_of_us: int | None = None,
    value_preds: Sequence[tuple[str, str, object]] = (),
    rows_limit: int | None = None,
    ts_range_us: tuple[int | None, int | None] | None = None,
) -> dict:
    """Full ReadRowsRequest shape (execute_plan.rs:168-181).  Optional
    ``value_preds`` — ``(qualifier, op, literal)`` triples — append one
    per-qualifier Interleave each (see build_value_pred_filter); chaining
    them ANDs the per-column conditions cell-wise (a cell of qualifier q
    passes every other qualifier's filter through its keep-rest branch).

    ``rows_limit`` is the service's real ``rows_limit`` field: the server
    stops after that many (post-filter, non-empty) ROWS in key order —
    Bigtable rows, not relational rows; under version-unnest one Bigtable
    row pivots to one output row per surviving timestamp, so callers gate
    it on latest-mode reads (see BigtableTable.to_df)."""
    chain = build_filter_chain(
        config, projected_qualifiers, as_of_us=as_of_us, ts_range_us=ts_range_us
    )
    for qual, op, val in value_preds:
        chain.append(build_value_pred_filter(config, qual, op, val, projected_qualifiers))
    request = {
        "table_name": _table_name(config),
        "rows": build_row_set(ranges),
        "filter": {"chain": {"filters": chain}},
    }
    if rows_limit is not None:
        if int(rows_limit) <= 0:
            raise ValueError(f"rows_limit must be positive, got {rows_limit!r}")
        request["rows_limit"] = int(rows_limit)
    return request


def _table_name(config: BigtableTableConfig) -> str:
    return f"projects/{config.project}/instances/{config.instance}/tables/{config.table}"


def build_mutate_rows_request(
    config: BigtableTableConfig,
    row_cells: Sequence[tuple[str, list[tuple[str, str, int, bytes]]]],
) -> dict:
    """MutateRowsRequest shape — the write-side mirror of
    ``build_read_rows_request`` (the reference's unshipped "writes to
    Bigtable" roadmap item, README.md:46-49): one entry per row, one
    SetCell mutation per cell, timestamps in microseconds, qualifiers and
    values as bytes.

    ``row_cells``: ``[(row_key, [(family, qualifier, ts_us, value), ...]),
    ...]`` — the same canonical tuples ``fetch_cells`` yields, grouped per
    row (the service applies each entry's mutations atomically per row,
    which is Bigtable's actual atomicity unit).
    """
    return {
        "table_name": _table_name(config),
        "entries": [
            {
                "row_key": row_key.encode("utf-8"),
                "mutations": [
                    {
                        "set_cell": {
                            "family_name": family,
                            "column_qualifier": qualifier.encode("utf-8"),
                            "timestamp_micros": int(ts_us),
                            "value": bytes(value),
                        }
                    }
                    for family, qualifier, ts_us, value in cells
                ],
            }
            for row_key, cells in row_cells
        ],
    }


def push_cells(
    config: BigtableTableConfig,
    cells: Iterable[tuple[str, str, str, int, bytes]],
    service=None,
    max_mutations: int = 100_000,
) -> int:
    """Write canonical cell tuples through MutateRows; returns the number
    of entries (rows) applied.

    Batching mirrors the real service limit: one request carries at most
    ``max_mutations`` SetCell mutations (the documented 100k cap), split
    on ROW boundaries so per-row atomicity is preserved.  Any non-OK entry
    status raises — the engine's writes are all-or-error, like the staged
    parquet commit.  ``service`` — any object with
    ``mutate_rows(request_dict)`` yielding per-entry ``{"index", "status":
    {"code"}}``; the in-process fake implements the server side.  Without
    a service this would be the real SDK transport (not in this
    container — same gate as fetch_cells).
    """
    if service is None:
        # Real transport (same adapter seam as fetch_cells) — emulator-
        # or credential-backed depending on BIGTABLE_EMULATOR_HOST.
        service = real_sdk_service(config)
    # group into per-row entries, preserving input order within a row
    grouped: dict[str, list] = {}
    for row_key, family, qualifier, ts, value in cells:
        grouped.setdefault(row_key, []).append((family, qualifier, int(ts), bytes(value)))

    applied = 0
    batch: list = []
    batch_mutations = 0
    def _flush():
        nonlocal applied, batch, batch_mutations
        if not batch:
            return
        request = build_mutate_rows_request(config, batch)
        for resp in service.mutate_rows(request):
            code = resp.get("status", {}).get("code", 0)
            if code != 0:
                raise RuntimeError(f"MutateRows entry {resp.get('index')} failed: {resp}")
            applied += 1
        batch, batch_mutations = [], 0

    for row_key, row_cells in grouped.items():
        if len(row_cells) > max_mutations:
            # a row can only split across requests by breaking per-row
            # atomicity; the real service rejects oversized requests, so
            # fail loudly instead of shipping one that works only against
            # the in-process fake (review finding)
            raise ValueError(
                f"row {row_key!r} carries {len(row_cells)} mutations, over the "
                f"per-request cap ({max_mutations}); split the row's cells "
                "across timestamps/qualifiers or raise max_mutations"
            )
        if batch and batch_mutations + len(row_cells) > max_mutations:
            _flush()
        batch.append((row_key, row_cells))
        batch_mutations += len(row_cells)
    _flush()
    return applied


def fetch_cells(
    config: BigtableTableConfig,
    ranges: Sequence[KeyRange],
    projected_qualifiers: Iterable[str] | None = None,
    service=None,
    as_of_us: int | None = None,
    value_preds: Sequence[tuple[str, str, object]] = (),
    rows_limit: int | None = None,
):
    """Issue the read and yield canonical cell tuples
    (row_key, family, qualifier, ts_micros, value_bytes).

    ``service`` — any object with ``read_rows(request_dict)`` yielding
    ``(row_key, [(family, qualifier, ts_us, value), ...])``; the in-process
    fake (sources/fake_bigtable.py) implements the server semantics the
    reference exercises against the emulator (execute_plan.rs:183-212).
    Without a service this is the real transport, gated on
    ``google-cloud-bigtable`` (not in this container).
    """
    if service is None:
        # Real transport: the SDK adapter implements the same seam, so the
        # FULL request (ranges + filter chain + rows_limit) is pushed —
        # the old inline path shipped only the RowSet.  Honors
        # BIGTABLE_EMULATOR_HOST (reference Makefile:15, rust.yml:11).
        service = real_sdk_service(config)
    request = build_read_rows_request(
        config, ranges, projected_qualifiers, as_of_us, value_preds, rows_limit
    )
    for row_key, cells in service.read_rows(request):
        for family, qualifier, ts, value in cells:
            yield (row_key, family, qualifier, ts, value)


# --- real-SDK service adapter (emulator-optional) ---------------------------

#: the reference's emulator switch (Makefile:15 `BIGTABLE_EMULATOR_HOST=
#: localhost:8086 cargo test`, .github/workflows/rust.yml:22-38) — the
#: google SDK reads it natively: when set, the client dials the emulator
#: with anonymous credentials over an insecure channel.
BIGTABLE_EMULATOR_ENV = "BIGTABLE_EMULATOR_HOST"


def _us_to_dt(us: int):
    import datetime as _dt

    return _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
        microseconds=int(us)
    )


def sdk_row_filter(node: dict, rf):
    """Translate one engine filter dict (the grammar build_filter_chain /
    build_value_pred_filter emit) into the SDK RowFilter tree.  ``rf`` is
    the ``google.cloud.bigtable.row_filters`` module (injected so the
    translation is unit-testable without the SDK installed)."""
    ((kind, payload),) = node.items()
    if kind == "chain":
        return rf.RowFilterChain(filters=[sdk_row_filter(f, rf) for f in payload["filters"]])
    if kind == "interleave":
        return rf.RowFilterUnion(filters=[sdk_row_filter(f, rf) for f in payload["filters"]])
    if kind == "family_name_regex_filter":
        return rf.FamilyNameRegexFilter(payload)
    if kind == "cells_per_column_limit_filter":
        return rf.CellsColumnLimitFilter(int(payload))
    if kind == "column_qualifier_regex_filter":
        return rf.ColumnQualifierRegexFilter(payload)
    if kind == "value_regex_filter":
        return rf.ValueRegexFilter(payload)
    if kind == "timestamp_range_filter":
        start = payload.get("start_timestamp_micros")
        end = payload.get("end_timestamp_micros")
        return rf.TimestampRangeFilter(
            rf.TimestampRange(
                start=_us_to_dt(start) if start is not None else None,
                end=_us_to_dt(end) if end is not None else None,
            )
        )
    if kind == "value_range_filter":
        kw = {}
        lo, lo_open = payload.get("start_value_closed"), payload.get("start_value_open")
        hi, hi_open = payload.get("end_value_closed"), payload.get("end_value_open")
        if lo is not None or lo_open is not None:
            kw["start_value"] = lo if lo is not None else lo_open
            kw["inclusive_start"] = lo_open is None
        if hi is not None or hi_open is not None:
            kw["end_value"] = hi if hi is not None else hi_open
            kw["inclusive_end"] = hi_open is None
        return rf.ValueRangeFilter(**kw)
    raise NotImplementedError(f"unsupported filter for SDK translation: {kind!r}")


class RealSdkBigtableService:
    """google-cloud-bigtable adapter for the SERVICE SEAM — the same
    ``read_rows``/``mutate_rows``/``sample_row_keys`` request-dict
    interface the in-process fake (sources/fake_bigtable.py) and the wire
    client (sources/wire.py) implement, so every consumer — BigtableTable,
    the DS endpoint scan, the wire bridge — runs unchanged against a real
    service or the emulator (reference Makefile:1-15 runs its whole suite
    that way).  The client is built lazily on first use;
    ``BIGTABLE_EMULATOR_HOST`` is honored by the SDK itself.

    Precision note: the service stores cell timestamps at millisecond
    granularity — µs-precision fixtures must stick to whole milliseconds
    to round-trip bit-identically.
    """

    def __init__(self, config: BigtableTableConfig, admin: bool = False):
        self.config = config
        self._admin = admin
        self._table = None

    def _modules(self):
        from google.cloud import bigtable  # type: ignore[import-not-found]
        from google.cloud.bigtable import row_filters  # type: ignore[import-not-found]
        from google.cloud.bigtable import row_set as row_set_mod  # type: ignore[import-not-found]

        return bigtable, row_filters, row_set_mod

    def table(self):  # pragma: no cover - needs SDK
        if self._table is None:
            bigtable, _, _ = self._modules()
            client = bigtable.Client(project=self.config.project, admin=self._admin)
            self._table = client.instance(self.config.instance).table(self.config.table)
        return self._table

    def read_rows(self, request: dict):  # pragma: no cover - needs SDK/emulator
        _, rf, rs_mod = self._modules()
        table = self.table()
        kwargs = {}
        rows = request.get("rows") or {}
        rset = rs_mod.RowSet()
        any_sel = False
        for rr in rows.get("row_ranges", ()):
            # Mirror the fake's four-key range vocabulary (fake_bigtable.py
            # _key_selected): the DS endpoint scan emits start_key_open for
            # split partitions and the wire client's mid-stream resume
            # rewrites ranges to start_key_open — hardcoding the closed keys
            # KeyErrors on any multi-partition or resumed read (ADVICE r12).
            start_c, start_o = rr.get("start_key_closed"), rr.get("start_key_open")
            end_c, end_o = rr.get("end_key_closed"), rr.get("end_key_open")
            rset.add_row_range_from_keys(
                start_key=start_c if start_o is None else start_o,
                end_key=end_c if end_o is None else end_o,
                start_inclusive=start_o is None,
                end_inclusive=end_c is not None,
            )
            any_sel = True
        for rk in rows.get("row_keys", ()):
            rset.add_row_key(rk)
            any_sel = True
        if any_sel:
            kwargs["row_set"] = rset
        if request.get("filter"):
            kwargs["filter_"] = sdk_row_filter(request["filter"], rf)
        if request.get("rows_limit"):
            kwargs["limit"] = int(request["rows_limit"])
        for row in table.read_rows(**kwargs):
            out = []
            for family, quals in row.cells.items():
                for qualifier, versions in quals.items():
                    for cell in versions:
                        out.append(
                            (
                                family,
                                qualifier.decode("utf-8"),
                                int(cell.timestamp.timestamp() * 1_000_000),
                                bytes(cell.value),
                            )
                        )
            yield (row.row_key.decode("utf-8"), out)

    def mutate_rows(self, request: dict):  # pragma: no cover - needs SDK/emulator
        table = self.table()
        sdk_rows = []
        for entry in request.get("entries", ()):
            rk = entry["row_key"]
            r = table.direct_row(rk if isinstance(rk, bytes) else rk.encode("utf-8"))
            for m in entry.get("mutations", ()):
                sc = m["set_cell"]
                qual = sc["column_qualifier"]
                r.set_cell(
                    sc["family_name"],
                    qual if isinstance(qual, bytes) else qual.encode("utf-8"),
                    bytes(sc["value"]),
                    timestamp=_us_to_dt(int(sc["timestamp_micros"])),
                )
            sdk_rows.append(r)
        for i, status in enumerate(table.mutate_rows(sdk_rows)):
            yield {"index": i, "status": {"code": int(getattr(status, "code", 0))}}

    def sample_row_keys(self, request: dict):  # pragma: no cover - needs SDK/emulator
        for s in self.table().sample_row_keys():
            yield {
                "row_key": s.row_key.decode("utf-8"),
                "offset_bytes": int(s.offset_bytes),
            }


def real_sdk_service(config: BigtableTableConfig, admin: bool = False) -> RealSdkBigtableService:
    """Build the real-SDK seam adapter, failing loud (with the emulator
    hint) when ``google-cloud-bigtable`` is absent."""
    import os

    try:
        import google.cloud.bigtable  # type: ignore[import-not-found]  # noqa: F401
    except ImportError as exc:
        emu = os.environ.get(BIGTABLE_EMULATOR_ENV)
        hint = (
            f" ({BIGTABLE_EMULATOR_ENV}={emu} is set — install the SDK to reach the emulator)"
            if emu
            else ""
        )
        raise NotImplementedError(
            "google-cloud-bigtable is not installed in this environment"
            + hint
            + "; use a parquet cells store (cells_path), the in-process fake, "
            "or the wire transport — the rest of the engine is transport-agnostic"
        ) from exc
    return RealSdkBigtableService(config, admin=admin)
