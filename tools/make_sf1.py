"""Materialize an sf1-equivalent testdata directory (10× sf0.1) for the
local scale-fidelity run (VERDICT r7 #7).

The driver only ships sf{0.001,0.01,0.1}; the 100× question ("does any
query scale superlinearly?") needs at least one decade of local headroom,
so this script replicates sf0.1 ten times with KEY OFFSETS that preserve
every foreign-key relationship and distribution:

- ``region``/``nation``: fixed dimensions, copied as-is;
- ``customer``/``supplier``/``part``/``orders``/``lineitem``: replica i
  offsets each key space by i × its sf0.1 capacity (custkey +15000i,
  orderkey +150000i, partkey +20000i, suppkey +1000i), so joins fan out
  exactly as they do at sf0.1 — same selectivities, 10× rows;
- ``events``: event_id/user_id offset the same way (distinct users per
  replica keeps sessionization/retention per-user workloads honest);
- ``documents``: doc_id offset; TEXT is passed through a per-replica
  11-letter ``translate`` rotation (cycle 11 > 10 replicas, so no two
  replicas collide) — word/char structure, lengths, and within-replica
  duplicate structure are preserved while CROSS-replica texts share no
  shingles.  Without this, every doc would have 9 exact twins and the
  dedup family would measure a 100×-pairs corpus, not a 10×-rows one;
- ``embeddings``: vec_id offset; each replica applies a distinct cyclic
  DIMENSION shift (7i mod 64) — norms, within-replica geometry, and the
  label layout are exactly preserved, while cross-replica cosines decay
  to generic autocorrelation levels, so Σ|block|² grows ~10× like a real
  corpus rather than ~100×.

Output: $OUT (default /tmp/dbs_sf1) with the same one-file-per-table
parquet layout the driver uses.  Pure DuckDB; ~1 GiB, a few minutes.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
OUT = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/dbs_sf1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SF1_REPLICAS", "10"))

CAPS = {
    "custkey": 15_000,
    "orderkey": 150_000,
    "partkey": 20_000,
    "suppkey": 1_000,
    "event_id": 100_000,
    "doc_id": 5_000,
    "vec_id": 2_000,
}
ROT = "abcdefghijk"  # 11-cycle > REPLICAS: no two replicas share a text


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, (os.cpu_count() or 8) // 2)}")

    def write(table: str, select_for_replica) -> None:
        sql = " UNION ALL ".join(select_for_replica(i) for i in range(REPLICAS))
        con.execute(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    for dim in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{dim}.parquet')) "
            f"TO '{OUT}/{dim}.parquet' (FORMAT PARQUET)"
        )
        print(f"{dim}: copied", flush=True)

    write("customer", lambda i: f"""
        SELECT c_custkey + {i * CAPS['custkey']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet')""")

    write("supplier", lambda i: f"""
        SELECT s_suppkey + {i * CAPS['suppkey']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM read_parquet('{SRC}/supplier.parquet')""")

    write("part", lambda i: f"""
        SELECT p_partkey + {i * CAPS['partkey']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM read_parquet('{SRC}/part.parquet')""")

    write("orders", lambda i: f"""
        SELECT o_orderkey + {i * CAPS['orderkey']} AS o_orderkey,
               o_custkey + {i * CAPS['custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet')""")

    write("lineitem", lambda i: f"""
        SELECT l_orderkey + {i * CAPS['orderkey']} AS l_orderkey,
               l_partkey + {i * CAPS['partkey']} AS l_partkey,
               l_suppkey + {i * CAPS['suppkey']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet')""")

    # user_id capacity: derive from the data once
    u_cap = con.execute(
        f"SELECT MAX(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]
    write("events", lambda i: f"""
        SELECT event_id + {i * CAPS['event_id']} AS event_id, ts,
               user_id + {i * u_cap} AS user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet')""")

    def doc_sel(i: int) -> str:
        rot = ROT[i % len(ROT):] + ROT[: i % len(ROT)]
        return f"""
        SELECT doc_id + {i * CAPS['doc_id']} AS doc_id,
               translate(text, '{ROT}', '{rot}') AS text,
               lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet')"""

    write("documents", doc_sel)

    def emb_sel(i: int) -> str:
        shift = (7 * i) % 64
        return f"""
        SELECT vec_id + {i * CAPS['vec_id']} AS vec_id,
               CAST(list_transform(range(0, 64),
                    j -> embedding[1 + ((j + {shift}) % 64)]) AS FLOAT[]) AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet')"""

    write("embeddings", emb_sel)
    print(f"sf1-equivalent testdata written to {OUT}", flush=True)


if __name__ == "__main__":
    main()
