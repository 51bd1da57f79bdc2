"""operators/zorder.py — Morton interleave correctness + the layout
property it exists for: file-envelope pruning on EVERY clustered
dimension, measured against the single-sort-order baseline."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datafusion_bigtable_spark.operators.zorder import cluster_by_zvalue, zvalue


def _morton(vals, bits, n):
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * n + j)
    return z


def test_zvalue_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 1), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "a long, b long")
    # identity bounds: [0, 65535] with bits=16 keeps codes == values
    out = df.select(
        "a", "b",
        zvalue([(F.col("a"), 0, 65535), (F.col("b"), 0, 65535)], bits=16).alias("z"),
    ).collect()
    for r in out:
        assert r.z == _morton([r.a, r.b], 16, 2), (r.a, r.b)


def test_zvalue_rejects_bad_shapes(spark):
    with pytest.raises(ValueError, match="at least 2"):
        zvalue([(F.lit(1), 0, 1)])
    with pytest.raises(ValueError, match="overflows"):
        zvalue([(F.lit(1), 0, 1)] * 3, bits=21)


def _touched(df, col, lo, hi):
    """Partitions whose [min, max] envelope overlaps [lo, hi] — the
    file-skipping proxy (each partition = one written file)."""
    stats = df.groupBy(F.spark_partition_id().alias("p")).agg(
        F.min(col).alias("lo"), F.max(col).alias("hi")
    )
    rows = stats.collect()
    return sum(1 for r in rows if not (r.hi < lo or r.lo > hi)), len(rows)


def test_zorder_prunes_secondary_dimension(spark, sf_dir):
    """The whole point: a band predicate on the SECONDARY column must skip
    files under z-order (it skips nothing under primary-key order), while
    the primary column keeps meaningful — if degraded — pruning."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    lo1, hi1, lo2, hi2 = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    n = 16
    zdf = cluster_by_zvalue(li, [("l_orderkey", lo1, hi1), ("l_partkey", lo2, hi2)], n)
    kdf = li.repartitionByRange(n, "l_orderkey")

    w2 = (hi2 - lo2) // 20
    band = (lo2 + 10 * w2, lo2 + 11 * w2)  # ~5% band on the secondary dim
    z_touch, z_n = _touched(zdf, "l_partkey", *band)
    k_touch, k_n = _touched(kdf, "l_partkey", *band)
    assert k_touch == k_n, "baseline should have NO secondary-dim pruning"
    assert z_touch < k_touch, f"z-order did not prune: {z_touch}/{z_n}"

    w1 = (hi1 - lo1) // 20
    band1 = (lo1 + 10 * w1, lo1 + 11 * w1)
    zp, _ = _touched(zdf, "l_orderkey", *band1)
    # primary-dim pruning survives (degraded, not destroyed)
    assert zp < z_n


def test_zvalue_degenerate_bounds(spark):
    """A constant column (hi == lo) codes to 0 everywhere — z-order
    degrades gracefully to a sort on the remaining dimensions instead of
    dividing by zero."""
    df = spark.createDataFrame([(5, 1), (5, 2), (5, 3)], "a long, b long")
    out = df.select(
        zvalue([(F.col("a"), 5, 5), (F.col("b"), 1, 3)], bits=4).alias("z")
    ).collect()
    zs = sorted(r.z for r in out)
    assert zs == sorted(zs) and len(set(zs)) == 3  # b still separates
