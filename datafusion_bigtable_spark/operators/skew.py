"""Skew-mitigation utilities for hot keys at 100 TB.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) covers sort-merge joins automatically; these helpers cover the
cases AQE doesn't: skewed *aggregations* and broadcast-ineligible joins
against a skewed build side.

The salted aggregation is the canonical two-phase shape::

    partial = df.groupBy(key, salt % N).agg(partial_aggs)   # spreads a hot
    final   = partial.groupBy(key).agg(merge_aggs)          # key over N tasks

For algebraic aggregates (sum/count/min/max) the merge is exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a per-row hash — reproducible runs,
    unlike rand()-based salting (and safe under task retries)."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(*df.columns), F.lit(buckets)))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: str | Column,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-proof sum+count per key.

    Returns (keys..., sum_value, n).  Phase 1 aggregates (key, salt) —
    a key receiving 50% of all rows spreads over ``buckets`` reducers;
    phase 2 merges the ≤buckets partials per key, which is tiny.
    """
    val = F.col(value) if isinstance(value, str) else value
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(val).alias("_s"), F.count("*").alias("_n")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_s").alias("sum_value"), F.sum("_n").alias("n")
    )


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
) -> DataFrame:
    """Inner equi-join resilient to a hot key when `small` is too large to
    broadcast whole: salt the big side, replicate the small side across all
    salt values, join on (key, salt).  Row multiplicity is preserved.
    """
    b = with_salt(big, buckets)
    s = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return b.join(s, [key, "_salt"], "inner").drop("_salt")
