"""Z-order (Morton) clustering — multi-dimensional layout for scans.

The reference prunes on ONE dimension: its composer turns row-key-prefix
predicates into RowRanges (src/datasource/composer.rs:13-300), and the
cells store's range-partitioned layout gives the same file-level pruning
for key scans.  A predicate on a NON-prefix component prunes nothing —
the classic single-sort-order limitation.  Z-ordering is the standard
answer (Delta/Iceberg OPTIMIZE ZORDER, HBase salting's smarter cousin):
interleave the bits of order-preserving fixed-width codes of two (or
more) columns and range-partition on the interleaved value, so each
file's min/max envelope is TIGHT IN EVERY clustered dimension and a
selective predicate on any of them skips most files.

The trade is explicit: clustering quality is shared between dimensions —
a band query on the secondary column drops from touching ALL files to a
minority of them, while the primary column's pruning degrades from
near-perfect to the same minority (measured at sf0.01, 16 partitions:
partkey band 16/16 → 9/16, orderkey band 2/16 → 9/16).  Cluster on the
2-3 columns queries actually filter by; more dims dilute all of them.

Everything is pure Catalyst integer arithmetic (shift/mod folds unrolled
at plan time) — the z-value computation fuses into the write's projection
and costs nothing measurable next to the repartition it feeds.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Order-preserving map of [lo, hi] onto [0, 2^bits): equal-width
    scaling keeps <= ordering, which is what makes per-file min/max
    envelopes meaningful for range predicates after interleaving."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    return F.least(
        F.lit(top).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((col.cast("double") - F.lit(float(lo))) * (top / (hi - lo))).cast("long"),
        ),
    )


def zvalue(cols: Sequence[tuple[Column, float, float]], bits: int = 16) -> Column:
    """Morton interleave of order-preserving ``bits``-wide codes.

    ``cols`` is ``[(column, lo, hi), ...]`` — bounds come from the writer
    (one cheap min/max aggregate, or static domain knowledge); values
    outside clamp to the edge code, which only loosens pruning for those
    rows, never correctness (pruning here is a LAYOUT property; readers
    still filter exactly).

    The unrolled shift/mask fold is ``bits × n_cols`` integer ops per row,
    all inside whole-stage codegen.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits * n > 62:
        raise ValueError(f"bits={bits} × {n} cols overflows a signed 64-bit z-value")
    codes = [_scaled(c, lo, hi, bits) for (c, lo, hi) in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, code in enumerate(codes):
            z = z + F.shiftleft(F.shiftright(code, i) % 2, i * n + j)
    return z


def cluster_by_zvalue(
    df: DataFrame,
    cols: Sequence[tuple[str, float, float]],
    n_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Range-partition + sort the frame by its z-value: write the result
    with one file per partition and every file's min/max envelope is tight
    in every clustered dimension.  ``cols`` is ``[(name, lo, hi), ...]``."""
    z = zvalue([(F.col(c), lo, hi) for (c, lo, hi) in cols], bits=bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
