"""In-process Bigtable ReadRows service — the emulator stand-in.

The reference tests against the real Bigtable emulator (Makefile:1-15,
.github/workflows/rust.yml:22-38) and its read path issues one
``ReadRowsRequest`` per scan (execute_plan.rs:168-183).  The SDK is not in
this container, so the request-shaping half of the transport was
unit-tested but ``fetch_cells`` itself never executed.  This module closes
that gap: it implements the SERVER side of ReadRows — RowSet selection and
the RowFilter chain — over an in-memory cell store, consuming the exact
request dict ``build_read_rows_request`` produces.  ``fetch_cells(...,
service=InProcessBigtableService(cells))`` then exercises the full
transport path end-to-end in pytest.

Semantics implemented (the subset the engine emits, mirroring the
Bigtable service contract):

- RowSet: explicit ``row_keys`` plus closed ``row_ranges``
  (``start_key_closed``/``end_key_closed``), matched on UTF-8 bytes in
  Bigtable's lexicographic byte order.  Empty RowSet = full table.
- ``family_name_regex_filter`` / ``column_qualifier_regex_filter``:
  RE2-style full-string match (Bigtable anchors these implicitly).
- ``cells_per_column_limit_filter``: keep the N most recent versions per
  column (per row_key+family+qualifier), newest-first — exactly the
  latest-version semantics the reference pins with limit 1
  (composer.rs:257-263).
- ``chain``: filters applied in order, like the reference's Chain
  (execute_plan.rs:174-179).
- ``interleave``: union of branch outputs (r7 — carries the per-qualifier
  value-predicate idiom, grpc_transport.build_value_pred_filter), and
  ``value_range_filter`` honors open bounds alongside closed ones.

Rows stream back in key order; within a row, cells are ordered
(family, qualifier, ts DESC) as the service returns them.

The write side mirrors it: ``mutate_rows`` applies MutateRows requests
(SetCell mutations, per-row atomic, same-version replace) so the engine's
write-path encoding is pinned at the wire level exactly like ReadRows pins
the read path.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator, Sequence

#: canonical transport cell tuple: (row_key, family, qualifier, ts_us, value)
CellTuple = tuple[str, str, str, int, bytes]


class InProcessBigtableService:
    """A fake Bigtable service holding cells in memory and answering
    ReadRows requests with real RowSet + RowFilter semantics."""

    def __init__(self, cells: Iterable[CellTuple], table_name: str | None = None):
        self.table_name = table_name
        # key-ordered store: {row_key: [(family, qualifier, ts, value), ...]}
        self._rows: dict[str, list[tuple[str, str, int, bytes]]] = {}
        for row_key, family, qualifier, ts, value in cells:
            self._rows.setdefault(row_key, []).append((family, qualifier, ts, bytes(value)))

    # -- RowSet -----------------------------------------------------------
    @staticmethod
    def _key_selected(key_bytes: bytes, rows: dict) -> bool:
        explicit = rows.get("row_keys") or []
        ranges = rows.get("row_ranges") or []
        if not explicit and not ranges:
            return True  # empty RowSet = full table
        if key_bytes in explicit:
            return True
        for r in ranges:
            start_c = r.get("start_key_closed")
            start_o = r.get("start_key_open")
            end_c = r.get("end_key_closed")
            end_o = r.get("end_key_open")
            if (
                (start_c is None or key_bytes >= start_c)
                and (start_o is None or key_bytes > start_o)
                and (end_c is None or key_bytes <= end_c)
                and (end_o is None or key_bytes < end_o)
            ):
                return True
        return False

    # -- RowFilter --------------------------------------------------------
    @staticmethod
    def _apply_filter(flt: dict, cells: list[tuple[str, str, int, bytes]]):
        if "chain" in flt:
            for sub in flt["chain"]["filters"]:
                cells = InProcessBigtableService._apply_filter(sub, cells)
            return cells
        if "interleave" in flt:
            # Service semantics: the union of every branch's output, each
            # matching cell emitted once PER MATCHING BRANCH (duplicates
            # are real Bigtable behavior; the engine only ever constructs
            # qualifier-disjoint branches, so its streams stay
            # duplicate-free).  Output order is re-normalized by read_rows.
            out: list = []
            for sub in flt["interleave"]["filters"]:
                out.extend(InProcessBigtableService._apply_filter(sub, cells))
            return out
        if "family_name_regex_filter" in flt:
            pat = flt["family_name_regex_filter"]
            pat = pat.decode() if isinstance(pat, bytes) else pat
            rx = re.compile(pat)
            return [c for c in cells if rx.fullmatch(c[0])]
        if "column_qualifier_regex_filter" in flt:
            pat = flt["column_qualifier_regex_filter"]
            pat = pat.decode() if isinstance(pat, bytes) else pat
            rx = re.compile(pat)
            return [c for c in cells if rx.fullmatch(c[1])]
        if "timestamp_range_filter" in flt:
            tr = flt["timestamp_range_filter"]
            lo = tr.get("start_timestamp_micros")
            hi = tr.get("end_timestamp_micros")  # EXCLUSIVE, like the service
            return [
                c
                for c in cells
                if (lo is None or c[2] >= lo) and (hi is None or c[2] < hi)
            ]
        if "value_regex_filter" in flt:
            # RE2 semantics on the value BYTES, unanchored (Bigtable's
            # ValueRegexFilter contract — unlike the family/qualifier
            # regexes, which the service implicitly anchors)
            pat = flt["value_regex_filter"]
            rx = re.compile(pat if isinstance(pat, bytes) else pat.encode("utf-8"))
            return [c for c in cells if rx.search(c[3])]
        if "value_range_filter" in flt:
            vr = flt["value_range_filter"]
            lo_c, hi_c = vr.get("start_value_closed"), vr.get("end_value_closed")
            lo_o, hi_o = vr.get("start_value_open"), vr.get("end_value_open")
            return [
                c
                for c in cells
                if (lo_c is None or c[3] >= lo_c)
                and (hi_c is None or c[3] <= hi_c)
                and (lo_o is None or c[3] > lo_o)
                and (hi_o is None or c[3] < hi_o)
            ]
        if "cells_per_column_limit_filter" in flt:
            n = int(flt["cells_per_column_limit_filter"])
            out: list = []
            seen: dict = {}
            # newest-first within each column, like the service
            for c in sorted(cells, key=lambda c: (c[0], c[1], -c[2])):
                k = (c[0], c[1])
                seen[k] = seen.get(k, 0) + 1
                if seen[k] <= n:
                    out.append(c)
            return out
        raise NotImplementedError(f"unsupported RowFilter: {sorted(flt)}")

    # -- SampleRowKeys ----------------------------------------------------
    def sample_row_keys(self, request: dict) -> Iterator[dict]:
        """The service's SampleRowKeys RPC: approximately-equidistant row
        keys (real Bigtable returns tablet boundaries, one every few
        hundred MB) with cumulative ``offset_bytes``, ALWAYS including the
        last key — the contract range-sharding scan planners rely on.
        ``stride_bytes`` (default 16 KiB here; a test knob — real tablets
        are ~GB) controls sample density."""
        if self.table_name is not None and request.get("table_name") not in (None, self.table_name):
            raise KeyError(f"unknown table {request.get('table_name')!r}")
        stride = int(request.get("stride_bytes") or 16 * 1024)
        keys = sorted(self._rows)
        if not keys:
            return
        acc = 0
        next_mark = stride
        for i, rk in enumerate(keys):
            acc += sum(
                len(rk) + len(f) + len(q) + 8 + len(v) for f, q, _, v in self._rows[rk]
            )
            if acc >= next_mark or i == len(keys) - 1:
                yield {"row_key": rk, "offset_bytes": acc}
                while next_mark <= acc:
                    next_mark += stride

    # -- the write RPC ----------------------------------------------------
    def mutate_rows(self, request: dict) -> Iterator[dict]:
        """Apply a MutateRowsRequest (SetCell mutations only — the subset
        the engine's write path emits); yield one ``{"index", "status":
        {"code": 0}}`` per entry, in order, like the streaming response.

        Service semantics pinned here: each entry's mutations apply
        atomically per row (Bigtable's atomicity unit), and a SetCell at
        an existing ``(family, qualifier, timestamp)`` REPLACES that cell
        — the store never holds two values for one version coordinate.
        """
        if self.table_name is not None and request.get("table_name") not in (None, self.table_name):
            raise KeyError(f"unknown table {request.get('table_name')!r}")
        for i, entry in enumerate(request.get("entries", ())):
            row_key = entry["row_key"]
            row_key = row_key.decode("utf-8") if isinstance(row_key, bytes) else row_key
            staged = list(self._rows.get(row_key, ()))
            for m in entry.get("mutations", ()):
                if "set_cell" not in m:
                    raise NotImplementedError(f"unsupported mutation: {sorted(m)}")
                sc = m["set_cell"]
                qualifier = sc["column_qualifier"]
                qualifier = qualifier.decode("utf-8") if isinstance(qualifier, bytes) else qualifier
                cell = (sc["family_name"], qualifier, int(sc["timestamp_micros"]), bytes(sc["value"]))
                staged = [c for c in staged if (c[0], c[1], c[2]) != (cell[0], cell[1], cell[2])]
                staged.append(cell)
            self._rows[row_key] = staged  # all-or-nothing per entry
            yield {"index": i, "status": {"code": 0}}

    # -- the read RPC -----------------------------------------------------
    def read_rows(self, request: dict) -> Iterator[tuple[str, list[tuple[str, str, int, bytes]]]]:
        """Yield ``(row_key, [(family, qualifier, ts_us, value), ...])`` in
        key order for every selected, non-empty row."""
        if self.table_name is not None and request.get("table_name") not in (None, self.table_name):
            raise KeyError(f"unknown table {request.get('table_name')!r}")
        rows = request.get("rows") or {}
        flt = request.get("filter")
        # rows_limit: the service stops after N post-filter non-empty ROWS
        # in key order (the real field's contract — rows, never cells)
        limit = request.get("rows_limit")
        emitted = 0
        for row_key in sorted(self._rows):
            if not self._key_selected(row_key.encode("utf-8"), rows):
                continue
            cells = self._rows[row_key]
            if flt:
                cells = self._apply_filter(flt, cells)
            if cells:
                yield row_key, sorted(cells, key=lambda c: (c[0], c[1], -c[2]))
                emitted += 1
                if limit is not None and emitted >= limit:
                    return


def service_from_parquet(path: str, table_name: str | None = None) -> InProcessBigtableService:
    """Load a parquet cells store (sources/cells.py layout) into the fake
    service — lets any existing fixture stand in for a live table."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["row_key", "family", "qualifier", "ts", "value"])
    epoch_us = t.column("ts").cast("int64").to_pylist()
    return InProcessBigtableService(
        zip(
            t.column("row_key").to_pylist(),
            t.column("family").to_pylist(),
            t.column("qualifier").to_pylist(),
            epoch_us,
            t.column("value").to_pylist(),
        ),
        table_name=table_name,
    )
