"""Request-shaping tests for the gated gRPC transport (pure Python)."""

import pytest

from datafusion_bigtable_spark.config import BigtableTableConfig, ColumnSpec
from datafusion_bigtable_spark.plans.composer import KeyRange
from datafusion_bigtable_spark.sources.grpc_transport import (
    build_filter_chain,
    build_read_rows_request,
    fetch_cells,
)

CFG = BigtableTableConfig(
    table="weather_balloons",
    column_family="measurements",
    columns=(ColumnSpec("pressure", "int64"), ColumnSpec("temp.c", "string")),
    table_partition_cols=("_row_key",),
    project="p1",
    instance="i1",
)


def test_request_shape():
    req = build_read_rows_request(CFG, [KeyRange("a", "a"), KeyRange("b", "c")])
    assert req["table_name"] == "projects/p1/instances/i1/tables/weather_balloons"
    assert req["rows"]["row_keys"] == []
    assert req["rows"]["row_ranges"] == [
        {"start_key_closed": b"a", "end_key_closed": b"a"},
        {"start_key_closed": b"b", "end_key_closed": b"c"},
    ]
    chain = req["filter"]["chain"]["filters"]
    assert chain[0] == {"family_name_regex_filter": "measurements"}
    assert chain[1] == {"cells_per_column_limit_filter": 1}


def test_qualifier_regex_is_escaped():
    # A9 quirk fixed: 'temp.c' must not over-match 'tempxc'
    import re

    chain = build_filter_chain(CFG)
    pattern = chain[-1]["column_qualifier_regex_filter"].decode()
    assert re.fullmatch(pattern, "temp.c")
    assert not re.fullmatch(pattern, "tempxc")
    assert re.fullmatch(pattern, "pressure")


def test_empty_projection_adds_no_qualifier_filter():
    # reference quirk: all-key projection produced an empty regex matching
    # everything (composer.rs:274-278); we emit no filter at all instead
    chain = build_filter_chain(CFG, projected_qualifiers=[])
    assert all("column_qualifier_regex_filter" not in f for f in chain)


def test_latest_filter_respects_config():
    import dataclasses

    cfg = dataclasses.replace(CFG, only_read_latest=False)
    chain = build_filter_chain(cfg)
    assert all("cells_per_column_limit_filter" not in f for f in chain)


def test_fetch_cells_gated_without_sdk():
    with pytest.raises(NotImplementedError, match="google-cloud-bigtable"):
        list(fetch_cells(CFG, [KeyRange("a", "b")]))


# --- MutateRows (write-side wire shaping) ----------------------------------


def test_mutate_rows_request_shape():
    from datafusion_bigtable_spark.sources.grpc_transport import build_mutate_rows_request

    req = build_mutate_rows_request(
        CFG,
        [
            ("k1", [("measurements", "pressure", 7, b"\x00" * 8)]),
            ("k2", [("measurements", "temp.c", 9, b"9.6")]),
        ],
    )
    assert req["table_name"] == "projects/p1/instances/i1/tables/weather_balloons"
    assert [e["row_key"] for e in req["entries"]] == [b"k1", b"k2"]
    assert req["entries"][0]["mutations"] == [
        {
            "set_cell": {
                "family_name": "measurements",
                "column_qualifier": b"pressure",
                "timestamp_micros": 7,
                "value": b"\x00" * 8,
            }
        }
    ]


class _RecordingService:
    def __init__(self):
        self.requests = []

    def mutate_rows(self, request):
        self.requests.append(request)
        for i, _ in enumerate(request["entries"]):
            yield {"index": i, "status": {"code": 0}}


def test_push_cells_batches_on_row_boundaries():
    from datafusion_bigtable_spark.sources.grpc_transport import push_cells

    svc = _RecordingService()
    cells = [(f"k{r}", "f", f"q{c}", 1, b"v") for r in range(3) for c in range(2)]
    # 2 mutations per row, cap 3 → each request fits exactly one row:
    # the split lands on ROW boundaries (per-row atomicity), never inside
    assert push_cells(CFG, cells, service=svc, max_mutations=3) == 3
    assert len(svc.requests) == 3
    assert all(
        sum(len(e["mutations"]) for e in r["entries"]) <= 3 for r in svc.requests
    )


def test_push_cells_gated_without_sdk():
    from datafusion_bigtable_spark.sources.grpc_transport import push_cells

    with pytest.raises(NotImplementedError, match="google-cloud-bigtable"):
        push_cells(CFG, [("k", "f", "q", 1, b"v")])


def test_push_cells_raises_on_entry_failure():
    from datafusion_bigtable_spark.sources.grpc_transport import push_cells

    class _Failing:
        def mutate_rows(self, request):
            yield {"index": 0, "status": {"code": 13, "message": "internal"}}

    with pytest.raises(RuntimeError, match="entry 0"):
        push_cells(CFG, [("k", "f", "q", 1, b"v")], service=_Failing())


# --- r7: per-qualifier value predicates through the request ---------------


def test_encode_value_ranges_int64_sign_split():
    """Ordered int64 predicates must decompose into the sign intervals of
    big-endian two's complement (negatives sort ABOVE positives in byte
    order).  Verified by brute force: a value passes some returned range
    iff the relational predicate holds."""
    from datafusion_bigtable_spark.sources.grpc_transport import encode_value_ranges

    def passes(enc, r):
        return (
            ("start_value_closed" not in r or enc >= r["start_value_closed"])
            and ("end_value_closed" not in r or enc <= r["end_value_closed"])
            and ("start_value_open" not in r or enc > r["start_value_open"])
            and ("end_value_open" not in r or enc < r["end_value_open"])
        )

    probe = [-(2**63), -(2**40), -3, -1, 0, 1, 7, 2**40, 2**63 - 1]
    ops = {"eq": lambda a, b: a == b, "ge": lambda a, b: a >= b,
           "gt": lambda a, b: a > b, "le": lambda a, b: a <= b,
           "lt": lambda a, b: a < b}
    for op, rel in ops.items():
        for lit in (-5, -1, 0, 3, 2**40):
            ranges = encode_value_ranges("int64", op, lit)
            for v in probe:
                enc = v.to_bytes(8, "big", signed=True)
                want = rel(v, lit)
                got = any(passes(enc, r) for r in ranges)
                assert got == want, (op, lit, v)


def test_encode_value_ranges_string_gates_non_ascii_order():
    from datafusion_bigtable_spark.sources.grpc_transport import encode_value_ranges

    assert encode_value_ranges("string", "eq", "héllo")  # equality: any unicode
    with pytest.raises(ValueError, match="non-ASCII"):
        encode_value_ranges("string", "ge", "héllo")


def test_build_value_pred_filter_interleave_shape():
    """The per-qualifier idiom: Interleave(Chain(qual==q, range), others) —
    RE2 has no negative lookahead, so the keep-rest branch is a positive
    alternation of the OTHER projected qualifiers."""
    from datafusion_bigtable_spark.sources.grpc_transport import build_value_pred_filter

    f = build_value_pred_filter(CFG, "pressure", "ge", 1000)
    branches = f["interleave"]["filters"]
    assert len(branches) == 2
    target = branches[0]["chain"]["filters"]
    assert target[0] == {"column_qualifier_regex_filter": b"pressure"}
    assert "value_range_filter" in target[1]
    assert branches[1] == {"column_qualifier_regex_filter": b"temp\\.c"}

    # single-qualifier projection → no keep-rest branch needed
    only = build_value_pred_filter(CFG, "pressure", "eq", 5, projected_qualifiers=["pressure"])
    assert "interleave" not in only and "chain" in only

    with pytest.raises(ValueError, match="unprojected"):
        build_value_pred_filter(CFG, "pressure", "eq", 5, projected_qualifiers=["temp.c"])


def test_value_preds_appended_after_limit():
    """Chain position is the latest-then-filter semantics gate: the value
    interleave must sit after cells_per_column_limit_filter."""
    req = build_read_rows_request(CFG, [], value_preds=[("pressure", "ge", 7)])
    chain = req["filter"]["chain"]["filters"]
    kinds = [next(iter(f)) for f in chain]
    assert kinds.index("cells_per_column_limit_filter") < kinds.index("interleave")


def test_rows_limit_in_request_shape():
    assert "rows_limit" not in build_read_rows_request(CFG, [])
    assert build_read_rows_request(CFG, [], rows_limit=10)["rows_limit"] == 10
    with pytest.raises(ValueError):
        build_read_rows_request(CFG, [], rows_limit=0)
    with pytest.raises(ValueError):
        build_read_rows_request(CFG, [], rows_limit=-3)
