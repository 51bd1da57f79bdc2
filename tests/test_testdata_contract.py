"""Testdata schema contract.

Round-4 postmortem: the driver regenerated ``events.parquet`` with ``ts``
stored as TIMESTAMP(MICROS) while the streaming reader still assumed
TIMESTAMP(NANOS) — every event time silently shifted 1000x onto 1970-01-20
and two driver queries went red.  This module pins the physical schema of
every table the query registry reads, so the NEXT regeneration fails here,
loudly, at the right layer — instead of as a value-hash mismatch three
layers up.

Also pins that ``read_events_stream`` handles BOTH timestamp storage
flavors (native µs and legacy ns-as-long) by writing each flavor to a tmp
dir and asserting the streamed hourly agg equals the batch agg.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

# table -> {column: arrow type prefix}.  Prefix-match so timestamp[us] and
# timestamp[us, tz=UTC] both satisfy "timestamp["; exact otherwise.  Full
# column sets as generated 2026-08-13 (rounds 1-5) — a regeneration that
# renames, retypes, or drops a column the queries read must fail HERE.
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[",
    },
    "events": {
        "event_id": "int64",
        # THE r4 regression column: must be a true timestamp logical type
        # (any unit the reader's footer-sniff supports), never a bare int64.
        "ts": "timestamp[",
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {"vec_id": "int64", "embedding": "list<element: float", "label": "int32"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_contract(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.ParquetFile(path).schema_arrow
    fields = {f.name: str(f.type) for f in schema}
    for col, want in EXPECTED[table].items():
        assert col in fields, f"{table}: missing column {col}; has {sorted(fields)}"
        got = fields[col]
        assert got.startswith(want), f"{table}.{col}: expected {want}*, parquet stores {got}"


def _write_events_flavor(src_path: str, dest_dir: str, unit: str) -> str:
    """Rewrite the sf events table with ts stored as the given unit."""
    import pyarrow as pa

    os.makedirs(dest_dir, exist_ok=True)
    t = pq.read_table(src_path)
    ts = t.column("ts").cast(pa.timestamp(unit))
    t = t.set_column(t.schema.get_field_index("ts"), "ts", ts)
    pq.write_table(t, os.path.join(dest_dir, "events.parquet"))
    return dest_dir


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_stream_agg_matches_batch_for_both_ts_flavors(spark, sf_dir, tmp_path, unit):
    """The streaming reader must decode µs- AND ns-stored timestamps to the
    same event times; r4 proved that guessing the unit silently corrupts
    every window.  Batch read (Spark's vectorized reader handles both) is
    the oracle."""
    from pyspark.sql import functions as F

    from datafusion_bigtable_spark.streaming import run_events_stream_to_memory
    from datafusion_bigtable_spark.streaming.cells_stream import _events_ts_unit

    flavor_dir = _write_events_flavor(
        os.path.join(sf_dir, "events.parquet"), str(tmp_path / f"ev_{unit}"), unit
    )
    assert _events_ts_unit(flavor_dir) == unit

    out = run_events_stream_to_memory(
        spark, flavor_dir, agg="hourly", query_name=f"t_flavor_{unit}"
    )
    # Oracle: batch agg over the ORIGINAL µs table — both flavors encode the
    # exact same instants (µs→ns widening is lossless), so the correct
    # streamed result is flavor-independent by construction.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    batch = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want, f"{unit}: stream produced {len(got)} rows vs batch {len(want)}"
