"""The wire transport (sources/wire.py): every request crosses a real
localhost TCP socket and must behave exactly like the in-process service
it wraps — the sandbox-honest analogue of the reference's emulator-over-
gRPC validation (Makefile:1-15).

Tiers:
1. serialization round-trip on adversarial structures (bytes everywhere);
2. differential: representative request shapes (ranges, projection,
   as-of, sign-split value ranges, rows_limit) — wire stream must equal
   the in-process stream frame-for-frame;
3. the full Spark path: BigtableTable(service=WireBigtableClient) runs a
   golden query and matches the in-process result;
4. failure modes: remote errors surface as WireError, an abandoned stream
   does not poison the next call, concurrent clients don't interleave.
"""

from __future__ import annotations

import random
import threading

import pytest

from datafusion_bigtable_spark.config import BigtableTableConfig, ColumnSpec
from datafusion_bigtable_spark.plans.composer import Between, Eq, In, KeyRange
from datafusion_bigtable_spark.sources.bigtable_table import BigtableTable
from datafusion_bigtable_spark.sources.fake_bigtable import (
    InProcessBigtableService,
    service_from_parquet,
)
from datafusion_bigtable_spark.sources.grpc_transport import build_read_rows_request
from datafusion_bigtable_spark.sources import proto
from datafusion_bigtable_spark.sources.wire import (
    FLAG_DATA,
    WireBigtableClient,
    WireBigtableServer,
    WireError,
    dump_frame,
)

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


@pytest.fixture(scope="module")
def inproc(cells_path):
    return service_from_parquet(cells_path)


@pytest.fixture(scope="module")
def wire(inproc):
    with WireBigtableServer(inproc) as srv:
        yield WireBigtableClient(*srv.address)


# --- tier 1: serialization ---------------------------------------------------


def test_bytes_round_trip_everywhere():
    """Adversarial bytes (empty, NUL-bearing, full-range) in every
    byte-typed position of a request must survive the protobuf encoding
    exactly — row-range and value-range bounds are raw byte strings."""
    rng = random.Random(7)
    blobs = [bytes(rng.randrange(256) for _ in range(n)) for n in (0, 1, 8, 255)]
    req = {
        "table_name": "projects/p/instances/i/tables/\u00b5#\u2026",
        "rows": {
            "row_keys": [blobs[0], blobs[1]],
            "row_ranges": [{"start_key_closed": blobs[2], "end_key_open": blobs[3]}],
        },
        "filter": {"chain": {"filters": [
            {"value_regex_filter": blobs[3]},
            {"value_range_filter": {"start_value_closed": blobs[0], "end_value_open": blobs[2]}},
        ]}},
        "rows_limit": 2**62,
    }
    assert proto.decode_read_rows_request(proto.encode_read_rows_request(req)) == req
    # a frame survives its own framing
    import struct as _s

    payload = proto.encode_read_rows_request(req)
    frame = dump_frame(FLAG_DATA, payload)
    flag, n = _s.unpack(">BI", frame[:5])
    assert flag == FLAG_DATA and n == len(frame) - 5


# --- tier 2: differential against the in-process service --------------------


REQUEST_SHAPES = [
    # full scan, no filter beyond the family chain
    dict(ranges=[], preds=()),
    # one range
    dict(ranges=[KeyRange("us-west2#3698#2021-03-05-1200", "us-west2#3698#2021-03-05-1202")], preds=()),
    # projection pruning to one qualifier
    dict(ranges=[], preds=(), proj=("pressure",)),
    # sign-split value range (negative-to-positive int64 crosses the
    # byte-order split; the bounds are raw bytes on the wire)
    dict(ranges=[], preds=(("pressure", "ge", 94559),)),
    dict(ranges=[], preds=(("pressure", "lt", 95000),)),
    # rows_limit
    dict(ranges=[], preds=(), rows_limit=2),
    # as-of bound
    dict(ranges=[], preds=(), as_of_us=1614945665200000),
    # everything at once
    dict(
        ranges=[KeyRange("us-west2#3698#2021-03-05-1200", "us-west2#3698#2021-03-05-1204")],
        preds=(("pressure", "ge", 94122),),
        proj=("pressure", "temperature"),
        rows_limit=3,
    ),
]


@pytest.mark.parametrize("shape_idx", range(len(REQUEST_SHAPES)))
def test_wire_stream_equals_inprocess(inproc, wire, shape_idx):
    s = REQUEST_SHAPES[shape_idx]
    req = build_read_rows_request(
        _config(),
        s["ranges"],
        projected_qualifiers=s.get("proj"),
        as_of_us=s.get("as_of_us"),
        value_preds=s["preds"],
        rows_limit=s.get("rows_limit"),
    )
    expect = [(k, list(cells)) for k, cells in inproc.read_rows(req)]
    got = [(k, list(cells)) for k, cells in wire.read_rows(req)]
    assert got == expect


def test_wire_mutate_rows_round_trip(tmp_path, spark):
    """The WRITE path crosses the wire too: mutate through the socket,
    read back through the socket."""
    svc = InProcessBigtableService([], table_name=None)
    with WireBigtableServer(svc) as srv:
        client = WireBigtableClient(*srv.address)
        cfg = _config(table_partition_cols=("_row_key",))
        table = BigtableTable(cfg, service=client)
        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "_row_key": ["w1", "w2"],
                    "_timestamp": pd.to_datetime([1_000_000, 2_000_000], unit="us"),
                    "pressure": [-7, 2**40],
                    "temperature": ["a", "b"],
                }
            )
        )
        assert table.mutate(df) == 2
        out = table.to_df(spark, predicates=[In("_row_key", ("w1", "w2"))])
        rows = {r["_row_key"]: (r["pressure"], r["temperature"]) for r in out.collect()}
        assert rows == {"w1": (-7, "a"), "w2": (2**40, "b")}


# --- tier 3: the Spark path over the socket ----------------------------------


def test_golden_composite_over_wire(spark, wire, composite_config):
    import dataclasses

    cfg = dataclasses.replace(composite_config, cells_path=None)
    table = BigtableTable(cfg, service=wire)
    table.register(
        spark,
        name="weather_wire",
        predicates=[
            Eq("region", "us-west2"),
            In("balloon_id", ("3698",)),
            Between("event_minute", "2021-03-05-1200", "2021-03-05-1201"),
        ],
    )
    out = spark.sql(
        "SELECT region, balloon_id, event_minute, pressure, temperature "
        "FROM weather_wire WHERE region = 'us-west2' AND balloon_id IN ('3698') "
        "AND event_minute BETWEEN '2021-03-05-1200' AND '2021-03-05-1201' "
        "ORDER BY event_minute"
    )
    assert [tuple(r) for r in out.collect()] == [
        ("us-west2", "3698", "2021-03-05-1200", 94558, "9.6"),
        ("us-west2", "3698", "2021-03-05-1201", 94122, "9.7"),
    ]


# --- tier 4: failure modes ---------------------------------------------------


def test_remote_error_surfaces(inproc):
    svc = InProcessBigtableService([], table_name="projects/p/instances/i/tables/real")
    with WireBigtableServer(svc) as srv:
        client = WireBigtableClient(*srv.address)
        with pytest.raises(WireError) as err:
            list(client.read_rows({"table_name": "projects/p/instances/i/tables/wrong"}))
        assert err.value.remote_type == "KeyError"


def test_abandoned_stream_does_not_poison_next_call(inproc, wire):
    req = build_read_rows_request(_config(), [])
    gen = wire.read_rows(req)
    next(gen)  # consume one row, abandon the rest
    gen.close()
    expect = [(k, list(c)) for k, c in inproc.read_rows(req)]
    assert [(k, list(c)) for k, c in wire.read_rows(req)] == expect


def test_concurrent_clients_dont_interleave(inproc, wire):
    req = build_read_rows_request(_config(), [])
    expect = [(k, list(c)) for k, c in inproc.read_rows(req)]
    results: list = [None] * 8
    errors: list = []

    def hit(i):
        try:
            results[i] = [(k, list(c)) for k, c in wire.read_rows(req)]
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    assert all(r == expect for r in results)


def test_truncated_stream_raises_not_short_result():
    """A server dying mid-stream must raise, never return a silently short
    scan (the property the 4-byte frame contract exists for).  A raw
    socket stands in for the dying server: it answers with one valid row
    frame and closes WITHOUT the end frame."""
    import socket as _socket

    lst = _socket.socket()
    lst.bind(("127.0.0.1", 0))
    lst.listen(1)

    def dying_server():
        conn, _ = lst.accept()
        from datafusion_bigtable_spark.sources.wire import read_frame

        read_frame(conn)  # the HEADER frame
        read_frame(conn)  # the request DATA frame
        conn.sendall(
            dump_frame(
                FLAG_DATA,
                proto.encode_read_rows_response([("row1", [("f", "q", 1, b"v")])]),
            )
        )
        conn.close()  # no Status trailer: truncation

    t = threading.Thread(target=dying_server, daemon=True)
    t.start()
    # retries disabled: this pins the RAISE contract itself (the resume
    # path has its own test below)
    client = WireBigtableClient(*lst.getsockname(), max_stream_retries=0)
    with pytest.raises((ConnectionError, OSError)):
        list(client.read_rows(build_read_rows_request(_config(), [])))
    t.join(timeout=5)
    lst.close()


# --- tier 4b: session robustness (VERDICT r9 #9) -----------------------------


class _FlakyReadRows:
    """Delegates to a real service but kills the FIRST ReadRows stream
    after ``die_after`` rows (BrokenPipeError → the wire handler drops
    the connection without a trailer, exactly a mid-stream network cut).
    Records every request it sees so resumption can be asserted."""

    def __init__(self, inner, die_after: int):
        self._inner = inner
        self._die_after = die_after
        self.requests: list[dict] = []
        self.failed = False

    def read_rows(self, request):
        self.requests.append(request)
        first = not self.failed
        n = 0
        for row in self._inner.read_rows(request):
            yield row
            n += 1
            if first and n >= self._die_after:
                self.failed = True
                raise BrokenPipeError("simulated mid-stream cut")

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_stream_resume_recovers_mid_stream_disconnect(inproc, monkeypatch):
    """A stream cut mid-scan resumes strictly after the last delivered
    row: the final row set equals the uncut scan exactly — no duplicates,
    no holes — and the retry request's RowSet is trimmed, not a re-read
    from the top."""
    import datafusion_bigtable_spark.sources.wire as wire_mod

    monkeypatch.setattr(wire_mod, "BATCH_ROWS", 1)  # flush every row
    req = build_read_rows_request(_config(), [])
    expect = [(k, list(c)) for k, c in inproc.read_rows(req)]
    assert len(expect) >= 5, "fixture too small to exercise resumption"

    flaky = _FlakyReadRows(inproc, die_after=3)
    with WireBigtableServer(flaky) as srv:
        client = WireBigtableClient(*srv.address)
        got = [(k, list(c)) for k, c in client.read_rows(req)]
    assert got == expect
    assert flaky.failed and len(flaky.requests) == 2
    resumed = flaky.requests[1]["rows"]
    # 3 rows reached the client (BATCH_ROWS=1 flushes each) before the
    # cut; the resume starts open AFTER the 3rd row's key
    assert resumed["row_ranges"] == [{"start_key_open": expect[2][0].encode()}]


def test_connection_reuse_after_trailer(inproc, monkeypatch):
    """A call consumed to its trailer returns its socket to the pool and
    the next call reuses it — exactly one TCP connect across repeated
    clean calls (including a WireError call, which also ends at a frame
    boundary)."""
    import socket as _socket

    connects = []
    real = _socket.create_connection

    def counting(addr, *a, **kw):
        connects.append(addr)
        return real(addr, *a, **kw)

    monkeypatch.setattr(_socket, "create_connection", counting)
    req = build_read_rows_request(_config(), [])
    with WireBigtableServer(inproc) as srv:
        client = WireBigtableClient(*srv.address)
        first = [(k, list(c)) for k, c in client.read_rows(req)]
        assert len(client._idle) == 1
        for _ in range(3):
            assert [(k, list(c)) for k, c in client.read_rows(req)] == first
        assert len(connects) == 1, f"expected one connect, saw {len(connects)}"
        client.close()
        assert client._idle == []

    # a WireError arrives in a trailer — the stream ends at a frame
    # boundary, so that socket is reusable too (no reconnect per error)
    connects.clear()
    err_svc = InProcessBigtableService([], table_name="projects/p/instances/i/tables/real")
    with WireBigtableServer(err_svc) as srv:
        client = WireBigtableClient(*srv.address)
        for _ in range(3):
            with pytest.raises(WireError):
                list(client.read_rows({"table_name": "projects/p/instances/i/tables/wrong"}))
        assert len(connects) == 1, f"expected one connect, saw {len(connects)}"
        client.close()


def test_frame_timeout_raises(monkeypatch):
    """A server that accepts but never answers must fail within the
    explicit inactivity timeout, not hang for the transfer's lifetime."""
    import socket as _socket
    import time

    lst = _socket.socket()
    lst.bind(("127.0.0.1", 0))
    lst.listen(1)
    stop = threading.Event()

    def silent_server():
        conn, _ = lst.accept()
        stop.wait(5)
        conn.close()

    t = threading.Thread(target=silent_server, daemon=True)
    t.start()
    client = WireBigtableClient(*lst.getsockname(), timeout=0.3, max_stream_retries=0)
    t0 = time.monotonic()
    with pytest.raises((TimeoutError, ConnectionError, OSError)):
        list(client.read_rows(build_read_rows_request(_config(), [])))
    assert time.monotonic() - t0 < 5
    stop.set()
    t.join(timeout=5)
    lst.close()


def test_resume_request_rowset_algebra():
    """resume_read_rows_request unit pins: key filtering, range
    trimming/dropping, full-scan resumption, rows_limit decrement."""
    from datafusion_bigtable_spark.sources.wire import resume_read_rows_request

    base = {
        "table_name": "t",
        "rows": {
            "row_keys": [b"a", b"m", b"z"],
            "row_ranges": [
                {"start_key_closed": b"a", "end_key_open": b"f"},   # wholly before m: drop
                {"start_key_closed": b"b", "end_key_closed": b"m"}, # closed end == m: drop
                {"start_key_closed": b"k", "end_key_open": b"q"},   # straddles: trim start
                {"start_key_open": b"m", "end_key_closed": b"r"},   # starts AT m open: keep as-is
                {"start_key_closed": b"t"},                          # after m, no end: keep
            ],
        },
        "rows_limit": 10,
    }
    out = resume_read_rows_request(base, "m", 4)
    assert out["rows_limit"] == 6
    assert out["rows"]["row_keys"] == [b"z"]
    assert out["rows"]["row_ranges"] == [
        {"start_key_open": b"m", "end_key_open": b"q"},
        {"start_key_open": b"m", "end_key_closed": b"r"},
        {"start_key_closed": b"t"},
    ]
    # full scan → open-start range; nothing yielded → request unchanged
    assert resume_read_rows_request({"table_name": "t"}, "m", 0)["rows"] == {
        "row_keys": [],
        "row_ranges": [{"start_key_open": b"m"}],
    }
    assert resume_read_rows_request(base, None, 0) == base


# --- tier 5: hypothesis differential — random stores, random requests --------
# Reuses the service-property strategies (test_service_properties.py); the
# wire adds serialization + socket framing on top of the same algebra, so
# the contract is stream-equality with the in-process service it wraps.
# One shared server; the wrapped service is swapped per example (calls are
# sequential and each owns its connection, so the swap is race-free).

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

import test_service_properties as _sp  # noqa: E402


@pytest.fixture(scope="module")
def swap_server():
    svc_holder = InProcessBigtableService([])
    with WireBigtableServer(svc_holder) as srv:
        yield srv


@settings(max_examples=150, deadline=None)
@given(
    cells=_sp.cells_strategy,
    ranges=_sp.ranges_strategy,
    projection=_sp.projection_strategy,
    as_of=st.one_of(st.none(), st.integers(0, 4)),
    latest=st.booleans(),
    preds=_sp.preds_strategy,
    rows_limit=st.one_of(st.none(), st.integers(1, 3)),
)
def test_wire_equals_inprocess_for_random_requests(
    swap_server, cells, ranges, projection, as_of, latest, preds, rows_limit
):
    config = _sp._config(only_read_latest=latest)
    if projection is not None:
        for pq, _, _ in preds:
            if pq not in projection:
                projection = list(projection) + [pq]
    svc = InProcessBigtableService(cells)
    swap_server._tcp.service = svc
    client = WireBigtableClient(*swap_server.address)
    req = build_read_rows_request(
        config, ranges, projection, as_of, preds, rows_limit
    )
    expect = [(k, list(cs)) for k, cs in svc.read_rows(req)]
    assert [(k, list(cs)) for k, cs in client.read_rows(req)] == expect


@settings(max_examples=200, deadline=None)
@given(
    keys=st.lists(st.sampled_from([bytes([c]) for c in range(97, 107)]), max_size=4),
    ranges=st.lists(
        st.tuples(
            st.sampled_from(["start_key_closed", "start_key_open", None]),
            st.sampled_from([bytes([c]) for c in range(97, 107)]),
            st.sampled_from(["end_key_closed", "end_key_open", None]),
            st.sampled_from([bytes([c]) for c in range(97, 107)]),
        ),
        max_size=3,
    ),
    lk=st.sampled_from([bytes([c]) for c in range(97, 107)]),
)
def test_resume_request_covers_exactly_the_remainder(keys, ranges, lk):
    """Property: against a brute-force membership model over a small key
    universe, the resumed RowSet covers EXACTLY the original's keys
    strictly after last_key — no duplicates (re-covered keys), no holes
    (dropped keys)."""
    from datafusion_bigtable_spark.sources.wire import resume_read_rows_request

    universe = [bytes([c]) for c in range(96, 108)]  # spills past the sampled band

    def covered(rows):
        if not rows or (not rows.get("row_keys") and not rows.get("row_ranges")):
            return set(universe)
        out = {bytes(k) for k in rows.get("row_keys", ())}
        for rr in rows.get("row_ranges", ()):
            for k in universe:
                if "start_key_closed" in rr and k < bytes(rr["start_key_closed"]):
                    continue
                if "start_key_open" in rr and k <= bytes(rr["start_key_open"]):
                    continue
                if "end_key_closed" in rr and k > bytes(rr["end_key_closed"]):
                    continue
                if "end_key_open" in rr and k >= bytes(rr["end_key_open"]):
                    continue
                out.add(k)
        return out

    rs = {"row_keys": list(keys), "row_ranges": []}
    for skind, sk, ekind, ek in ranges:
        rr = {}
        if skind:
            rr[skind] = sk
        if ekind:
            rr[ekind] = ek
        rs["row_ranges"].append(rr)
    req = {"table_name": "t", "rows": rs}
    resumed = resume_read_rows_request(req, lk.decode(), 1)
    want = {k for k in covered(rs) if k > lk}
    got = set() if resumed is None else covered(resumed["rows"])
    assert got == want
    if resumed is None:
        assert want == set()  # None only when truly exhausted


def test_stale_pooled_socket_gets_free_reconnect(inproc):
    """ADVICE r10: a pooled socket the server closed while the client
    idled fails its first use having delivered ZERO frames — that is
    pool staleness, not a stream fault, and must not consume the
    stream-retry budget.  With retries fully disabled the scan must
    still complete via the free reconnect."""
    import socket as _socket

    req = build_read_rows_request(_config(), [])
    with WireBigtableServer(inproc) as srv:
        client = WireBigtableClient(*srv.address, max_stream_retries=0)
        expect = [(k, list(c)) for k, c in client.read_rows(req)]
        assert expect, "fixture scan returned nothing"

        # plant a dead socket in the pool: its peer is already closed,
        # exactly what a server-side idle-timeout leaves behind
        client.close()
        a, b = _socket.socketpair()
        b.close()
        client._idle.append(a)
        got = [(k, list(c)) for k, c in client.read_rows(req)]
        assert got == expect

        # sample_row_keys (read-only) gets the same free reconnect
        client.close()
        a, b = _socket.socketpair()
        b.close()
        client._idle.append(a)
        assert list(client.sample_row_keys({"table_name": req["table_name"]}))


def test_zero_frame_failure_on_fresh_socket_still_counts(inproc):
    """The free reconnect is for REUSED sockets only: a fresh connection
    that dies before any frame is a genuine fault and must consume the
    (here zero-sized) retry budget — otherwise a dead server would loop
    forever."""
    import socket as _socket

    lst = _socket.socket()
    lst.bind(("127.0.0.1", 0))
    lst.listen(2)
    accepted = []

    def dead_server():
        while True:
            try:
                conn, _ = lst.accept()
            except OSError:
                return
            accepted.append(1)
            conn.close()  # nothing delivered, ever

    t = threading.Thread(target=dead_server, daemon=True)
    t.start()
    client = WireBigtableClient(*lst.getsockname(), max_stream_retries=0)
    with pytest.raises((ConnectionError, OSError)):
        list(client.read_rows(build_read_rows_request(_config(), [])))
    assert len(accepted) == 1, "fresh-socket failure must not grant free retries"
    lst.close()


def test_stale_socket_plus_real_cut_within_budget(inproc, monkeypatch):
    """The combination ADVICE r10 names: one stale pooled socket AND one
    genuine mid-stream cut must succeed with max_stream_retries=1 — the
    stale socket rides the free reconnect, the cut consumes the one
    retry, and the rows come back exactly once."""
    import socket as _socket

    import datafusion_bigtable_spark.sources.wire as wire_mod

    monkeypatch.setattr(wire_mod, "BATCH_ROWS", 1)
    req = build_read_rows_request(_config(), [])
    expect = [(k, list(c)) for k, c in inproc.read_rows(req)]
    assert len(expect) >= 5

    flaky = _FlakyReadRows(inproc, die_after=3)
    with WireBigtableServer(flaky) as srv:
        client = WireBigtableClient(*srv.address, max_stream_retries=1)
        a, b = _socket.socketpair()
        b.close()
        client._idle.append(a)
        got = [(k, list(c)) for k, c in client.read_rows(req)]
    assert got == expect


# --- distributed MutateRows (VERDICT r11 #1) ----------------------------------


def test_mutate_is_executor_side_not_a_driver_funnel():
    """Plan contract: the write path must never funnel rows through the
    driver — r11's ``toLocalIterator`` loop encoded every cell on the
    driver before pushing, a bottleneck by construction at cluster scale.
    Pins the implementation to partition-side encode+push."""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(BigtableTable.mutate)))
    code_names = {
        n.attr for n in ast.walk(tree) if isinstance(n, ast.Attribute)
    } | {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
    assert "toLocalIterator" not in code_names
    assert "mapInArrow" in code_names
    # only the bounded per-partition count frame (≤ one row per task) may
    # collect — its receiver is the mapInArrow result, never the input df
    collects = [
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr == "collect"
    ]
    assert len(collects) == 1
    recv = collects[0].func.value
    assert isinstance(recv, ast.Call) and recv.func.attr == "mapInArrow"


def test_mutate_multi_partition_distributed(spark):
    """A many-partition frame writes through per-task connections and the
    union of all partitions lands — read-back equals input exactly."""
    import pandas as pd

    svc = InProcessBigtableService([], table_name=None)
    with WireBigtableServer(svc) as srv:
        client = WireBigtableClient(*srv.address)
        cfg = _config(table_partition_cols=("_row_key",))
        table = BigtableTable(cfg, service=client)
        n = 97
        pdf = pd.DataFrame(
            {
                "_row_key": [f"k{i:04d}" for i in range(n)],
                "_timestamp": pd.to_datetime([1_000_000 * (i + 1) for i in range(n)], unit="us"),
                "pressure": [i * 7 - 300 for i in range(n)],
                "temperature": [f"t{i}" for i in range(n)],
            }
        )
        df = spark.createDataFrame(pdf).repartition(8)
        assert df.rdd.getNumPartitions() == 8
        assert table.mutate(df) == n
        out = table.to_df(spark).orderBy("_row_key").collect()
        assert [(r["_row_key"], r["pressure"], r["temperature"]) for r in out] == [
            (f"k{i:04d}", i * 7 - 300, f"t{i}") for i in range(n)
        ]


def test_mutate_bridges_inprocess_service_without_driver_encode(spark):
    """A plain in-process service (no wire client) gets a job-lifetime
    bridge: encoding still happens executor-side, and the bridge is torn
    down after the job."""
    import pandas as pd

    svc = InProcessBigtableService([], table_name=None)
    cfg = _config(table_partition_cols=("_row_key",))
    table = BigtableTable(cfg, service=svc)
    pdf = pd.DataFrame(
        {
            "_row_key": ["a", "b", "c"],
            "_timestamp": pd.to_datetime([1, 2, 3], unit="ms"),
            "pressure": [1, 2, 3],
            "temperature": ["x", "y", "z"],
        }
    )
    assert table.mutate(spark.createDataFrame(pdf).repartition(2)) == 3
    got = {k: {(f, q) for f, q, _, _ in cells} for k, cells in svc._rows.items()}
    assert set(got) == {"a", "b", "c"}
    assert got["a"] == {(FAMILY, "pressure"), (FAMILY, "temperature")}


def test_bridge_bind_host_covers_local_and_cluster_branches():
    """VERDICT r13 #8 + ADVICE r13: the mutate() bridge's bind/advertise
    decision, pinned SDK-free for BOTH deployment branches.  Local masters
    bind loopback (executors are in-process threads); cluster masters bind
    and advertise exactly spark.driver.host; an unset driver host in
    non-local mode fails loud instead of silently binding 0.0.0.0 (the
    unauthenticated-bridge exposure the branch exists to avoid)."""
    from datafusion_bigtable_spark.sources.bigtable_table import _bridge_bind_host

    # local branch: every local[...] master variant pins loopback even
    # when a driver host is configured.
    for master in ("local", "local[32]", "local[*]", "local-cluster[2,1,1024]"):
        assert _bridge_bind_host(master, "10.1.2.3") == "127.0.0.1"
        assert _bridge_bind_host(master, None) == "127.0.0.1"
    # cluster branch: injected fake conf value is BOTH the bind interface
    # and the advertised address (single value by construction).
    for master in ("spark://mast:7077", "yarn", "k8s://https://api:6443"):
        assert _bridge_bind_host(master, "10.9.8.7") == "10.9.8.7"
        with pytest.raises(RuntimeError, match="spark.driver.host"):
            _bridge_bind_host(master, None)
        with pytest.raises(RuntimeError, match="spark.driver.host"):
            _bridge_bind_host(master, "")


def test_bridge_server_binds_the_advertised_interface():
    """The wire bridge binds the interface _bridge_bind_host returns and
    its .address (what executor tasks dial) reports that same interface —
    no advertise-what-you-didn't-bind split."""
    from datafusion_bigtable_spark.sources.bigtable_table import _bridge_bind_host
    from datafusion_bigtable_spark.sources.wire import WireBigtableServer

    host = _bridge_bind_host("local[32]", None)
    svc = InProcessBigtableService([], table_name=None)
    with WireBigtableServer(svc, host=host) as srv:
        bound_host, bound_port = srv.address
        assert bound_host == host == "127.0.0.1"
        assert bound_port > 0
