"""Deterministic content-hash sampling and splits.

Training-data pipelines need *reproducible* samples and train/val splits —
rows must land in the same bucket on every run, on any engine, regardless
of partitioning or row order.  Seeded ``df.sample`` can't promise that
(implementation-specific RNG streams); hashing a key column can.

Mechanism: bucket = first 8 hex digits of md5(seed || key) as an integer,
uniform over [0, 2^32) — portable (md5 everywhere), and each (seed, key)
pair is an independent draw, so different seeds give independent samples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: Column, buckets: int, seed: str = "") -> Column:
    """Deterministic uniform bucket in [0, buckets) from md5(seed||key)."""
    h = F.md5(F.concat(F.lit(seed), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets).cast("int")


def hash_sample(df: DataFrame, key: str | Column, fraction: float, seed: str = "s0") -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash — same rows every run."""
    key_col = F.col(key) if isinstance(key, str) else key
    n = 10_000
    return df.filter(hash_bucket(key_col, n, seed) < int(fraction * n))


def train_val_split(
    df: DataFrame, key: str | Column, val_fraction: float = 0.1, seed: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible split keyed on content hash."""
    key_col = F.col(key) if isinstance(key, str) else key
    n = 10_000
    cut = int(val_fraction * n)
    b = hash_bucket(key_col, n, seed)
    return df.filter(b >= cut), df.filter(b < cut)
