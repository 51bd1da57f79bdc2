"""Property-based differential test of the live-transport seam.

For random cell stores and random scan shapes — key ranges, projection,
as-of bound, latest-version flag, per-qualifier value predicates — the
full request path (``build_read_rows_request`` → the in-process ReadRows
service's RowSet + RowFilter algebra → ``fetch_cells``) must agree
cell-for-cell, in order, with an independently written brute-force
evaluation of the engine's intended semantics.  The model below shares no
machinery with the implementation: no regexes, no Chain/Interleave walk,
no sign-split byte ranges — plain Python conditionals and numeric
comparison on decoded values.  A bug in either the request shaping
(grpc_transport.py) or the fake service's filter algebra
(fake_bigtable.py) cannot hide in the other, because the model derives
from the *predicate*, not the wire encoding.

Reference scope: this is the same contract the reference exercises against
the live emulator (execute_plan.rs:168-212 builds the request; the
emulator answers), extended over the value/timestamp pushdown the
reference lists as roadmap (README.md:46-49).  Pure Python — no JVM.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings, strategies as st

from datafusion_bigtable_spark.config import BigtableTableConfig, ColumnSpec
from datafusion_bigtable_spark.plans.composer import KeyRange
from datafusion_bigtable_spark.sources.fake_bigtable import InProcessBigtableService
from datafusion_bigtable_spark.sources.grpc_transport import fetch_cells

FAMILY = "measurements"
QUALS = ("pressure", "temperature", "humidity")  # declared columns
INT_QUAL = "pressure"
KEYS = ["a", "b#1", "b#2", "c", "d#x", "e"]
INTS = [-(2**63), -3, -1, 0, 1, 2, 2**63 - 1]


def _config(only_read_latest: bool) -> BigtableTableConfig:
    return BigtableTableConfig(
        table="prop",
        column_family=FAMILY,
        columns=tuple(
            ColumnSpec(q, "int64" if q == INT_QUAL else "string") for q in QUALS
        ),
        only_read_latest=only_read_latest,
        allow_full_scan=True,
    )


def _value_for(qualifier: str, draw_int: int, draw_str: str) -> bytes:
    if qualifier == INT_QUAL:
        return draw_int.to_bytes(8, "big", signed=True)
    return draw_str.encode("utf-8")


# one cell per (row_key, family, qualifier, ts) coordinate — the service's
# version-replace invariant; also removes latest-version tie ambiguity
cells_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from([FAMILY, "other_family"]),
        st.sampled_from(list(QUALS) + ["undeclared"]),
        st.integers(0, 4),  # ts_us
        st.sampled_from(INTS),
        st.sampled_from(["", "cold", "hot", "hot2", "~tilde", "mild"]),
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda c: (c[0], c[1], c[2], c[3]),
).map(
    lambda cs: [
        (rk, fam, q, ts, _value_for(q, i, s)) for rk, fam, q, ts, i, s in cs
    ]
)

ranges_strategy = st.lists(
    st.tuples(st.sampled_from(KEYS), st.sampled_from(KEYS)).map(
        lambda p: KeyRange(min(p), max(p))
    ),
    min_size=0,
    max_size=2,
)

# projection None = all declared; never empty (the engine always projects
# at least one qualifier column — an all-key projection adds no filter and
# is covered by unit tests)
projection_strategy = st.one_of(
    st.none(),
    st.lists(st.sampled_from(QUALS), min_size=1, max_size=3, unique=True),
)

int_pred = st.tuples(
    st.just(INT_QUAL),
    st.sampled_from(["eq", "ge", "gt", "le", "lt"]),
    st.sampled_from(INTS),
)
str_pred = st.tuples(
    st.just("temperature"),
    st.sampled_from(["eq", "ge", "gt", "le", "lt"]),
    st.sampled_from(["", "cold", "hot", "z"]),  # ASCII — ordered preds gate on it
)
preds_strategy = st.lists(st.one_of(int_pred, str_pred), min_size=0, max_size=2)


def _expected(cells, config, ranges, projection, as_of_us, value_preds, rows_limit=None):
    """Brute-force engine semantics.  Output mirrors fetch_cells: rows in
    key order; within a row cells ordered (family, qualifier, ts DESC);
    ``rows_limit`` truncates to the first N non-empty ROWS."""
    quals = list(projection) if projection is not None else [c.name for c in config.columns]
    spec = {c.name: c.type for c in config.columns}

    def pred_holds(q, value, pq, op, lit):
        if q != pq:
            # a cell of another qualifier rides the keep-rest branch iff
            # that branch exists (some OTHER projected qualifier) and
            # carries it
            return q in [x for x in quals if x != pq]
        if spec[pq] == "int64":
            actual, expect = int.from_bytes(value, "big", signed=True), int(lit)
        else:
            actual, expect = bytes(value), str(lit).encode("utf-8")
        return {
            "eq": actual == expect,
            "ge": actual >= expect,
            "gt": actual > expect,
            "le": actual <= expect,
            "lt": actual < expect,
        }[op]

    per_row = defaultdict(list)
    for rk, fam, q, ts, v in cells:
        per_row[rk].append((fam, q, ts, v))

    out = []
    rows_emitted = 0
    for rk in sorted(per_row):
        if rows_limit is not None and rows_emitted >= rows_limit:
            break
        if ranges and not any(r.start <= rk <= r.end for r in ranges):
            continue
        cs = [c for c in per_row[rk] if c[0] == config.column_family]
        if as_of_us is not None:
            cs = [c for c in cs if c[2] <= as_of_us]
        if config.only_read_latest:
            newest = {}
            for c in cs:
                k = (c[0], c[1])
                if k not in newest or c[2] > newest[k][2]:
                    newest[k] = c
            cs = list(newest.values())
        if quals:
            cs = [c for c in cs if c[1] in quals]
        for pq, op, lit in value_preds:
            cs = [c for c in cs if pred_holds(c[1], c[3], pq, op, lit)]
        if not cs:
            continue
        for fam, q, ts, v in sorted(cs, key=lambda c: (c[0], c[1], -c[2])):
            out.append((rk, fam, q, ts, v))
        rows_emitted += 1
    return out


@settings(max_examples=400, deadline=None)
@given(
    cells=cells_strategy,
    ranges=ranges_strategy,
    projection=projection_strategy,
    as_of=st.one_of(st.none(), st.integers(0, 4)),
    latest=st.booleans(),
    preds=preds_strategy,
    rows_limit=st.one_of(st.none(), st.integers(1, 3)),
)
def test_transport_matches_brute_force_model(
    cells, ranges, projection, as_of, latest, preds, rows_limit
):
    config = _config(only_read_latest=latest)
    # value predicates ride the projection's keep-rest alternation; the
    # builder rejects a predicate on an unprojected qualifier — mirror the
    # engine by projecting predicate columns (bigtable_table does the same)
    if projection is not None:
        for pq, _, _ in preds:
            if pq not in projection:
                projection = list(projection) + [pq]
    service = InProcessBigtableService(cells)
    got = list(
        fetch_cells(
            config,
            ranges,
            projected_qualifiers=projection,
            service=service,
            as_of_us=as_of,
            value_preds=preds,
            rows_limit=rows_limit,
        )
    )
    assert got == _expected(cells, config, ranges, projection, as_of, preds, rows_limit)


@settings(max_examples=150, deadline=None)
@given(cells=cells_strategy, ranges=ranges_strategy)
def test_rowset_only_scan_matches_model(cells, ranges):
    """No filters beyond the family pin + declared projection: the RowSet
    path alone (closed byte ranges, empty set = full table) against the
    model — isolates key-selection bugs from filter-algebra bugs."""
    config = _config(only_read_latest=False)
    service = InProcessBigtableService(cells)
    got = list(fetch_cells(config, ranges, service=service))
    assert got == _expected(cells, config, ranges, None, None, ())
