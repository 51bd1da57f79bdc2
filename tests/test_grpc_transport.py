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
