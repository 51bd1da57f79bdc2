"""Materialize an sf10-equivalent directory (100× sf0.1) for the
SECOND-decade scale probe of the relational/events tier.

Why a second decade: the sf0.1→sf1 record (tools/make_sf1.py +
tools/analyze_sf1.py) answers "is anything superlinear over one decade?";
a 1000-executor/100 TB judgment wants the SLOPE OF THE SLOPE — a plan
that is accidentally O(n·log n) or carries a hidden O(replicas²) join
fan-out shows a GROWING marginal ratio from decade to decade, which one
decade cannot reveal.

Source is the sf1 directory (tools/make_sf1.py output), replicated 10×
with key offsets of 10× the sf0.1 capacities — every foreign-key
relationship and per-key fan-out is preserved exactly, so joins and
aggregates scale as a real corpus would (10× keys, same selectivities).

Content tables need DIFFERENT tricks than decade 1 used.  sf1's
replication (11-cycle text rotation, 7i-mod-64 dimension shift) composes
ADDITIVELY with itself — replica (i of sf10, j of sf1) would carry
rotation i+j, so distinct (i, j) pairs collide (e.g. (1,2) and (2,1))
and cross-replica texts/embeddings would share shingles/geometry,
turning the dedup/ANN workloads into a pair-count structure no real
100× corpus has.  The second decade therefore transforms ORTHOGONAL
structure:

- ``documents``: a rotation over the DISJOINT letter range 'l'..'x'
  (13-cycle; decade 1 rotated 'a'..'k').  The two rotations commute and
  the composite map is distinct for every (i, j) pair (i mod 13 AND
  j mod 11 must both match for two texts to align), so within-replica
  duplicate structure is preserved exactly while cross-replica texts
  share no multi-word shingles — pair counts grow 10×, like a real
  corpus.
- ``embeddings``: a per-replica SIGN-FLIP mask (±1 per dimension,
  pairwise-distinct masks, mask 0 = identity).  Sign flips preserve
  norms and within-replica geometry bit-for-bit and commute with decade
  1's dimension shifts; vectors from different replicas differ in ~half
  their term signs, so cross-replica cosines decay to noise and
  Σ|block|² grows ~10×, not ~100×.

Run tools/probe_sf10.py for the measurement.

Output: $OUT (default /tmp/dbs_sf10), ~2.5 GiB, pure DuckDB.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF10_SRC", "/tmp/dbs_sf1")
OUT = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/dbs_sf10")
REPLICAS = 10

# 10× the sf0.1 capacities in tools/make_sf1.py::CAPS — the sf1 key
# spaces these offsets must clear.
CAPS = {
    "custkey": 150_000,
    "orderkey": 1_500_000,
    "partkey": 200_000,
    "suppkey": 10_000,
    "event_id": 1_000_000,
    "doc_id": 50_000,
    "vec_id": 20_000,
}

# decade-2 text rotation: letters DISJOINT from decade 1's 'abcdefghijk'
ROT2 = "lmnopqrstuvwx"  # 13-cycle > REPLICAS


def _sign_mask(i: int) -> list[int]:
    """±1 per dimension for replica ``i`` — deterministic (md5 of the
    replica tag, no RNG state), pairwise distinct by construction, and
    identity at i=0 so replica 0 passes sf1 through unchanged.  Any two
    masks differ in ~32 of 64 signs, so cross-replica dot products sum
    ~half-negated terms and cosines decay to noise."""
    import hashlib

    if i == 0:
        return [1] * 64
    digest = hashlib.md5(f"dbs-sf10-mask-{i}".encode()).digest()
    return [-1 if (digest[j // 8] >> (j % 8)) & 1 else 1 for j in range(64)]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, (os.cpu_count() or 8) // 2)}")

    def write(table: str, select_for_replica) -> None:
        sql = " UNION ALL ".join(select_for_replica(i) for i in range(REPLICAS))
        con.execute(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    for passthrough in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{passthrough}.parquet", f"{OUT}/{passthrough}.parquet")
        print(f"{passthrough}: copied from sf1", flush=True)

    def doc_sel(i: int) -> str:
        rot = ROT2[i % len(ROT2):] + ROT2[: i % len(ROT2)]
        return f"""
        SELECT doc_id + {i * CAPS['doc_id']} AS doc_id,
               translate(text, '{ROT2}', '{rot}') AS text,
               lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet')"""

    write("documents", doc_sel)

    def emb_sel(i: int) -> str:
        mask = _sign_mask(i)
        mask_sql = "[" + ", ".join(str(m) for m in mask) + "]"
        return f"""
        SELECT vec_id + {i * CAPS['vec_id']} AS vec_id,
               CAST(list_transform(range(0, 64),
                    j -> embedding[j + 1] * ({mask_sql})[j + 1]) AS FLOAT[]) AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet')"""

    write("embeddings", emb_sel)

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

    u_cap = con.execute(
        f"SELECT MAX(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]
    write("events", lambda i: f"""
        SELECT event_id + {i * CAPS['event_id']} AS event_id, ts,
               user_id + {i * u_cap} AS user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet')""")

    print(f"sf10-equivalent relational/events testdata written to {OUT}", flush=True)


if __name__ == "__main__":
    main()
