"""Distributed order statistics.

Spark's exact ``percentile`` aggregate materializes EVERY value in one
aggregation buffer — measured 4× slower than necessary at sf0.1 and an
OOM at 100 TB (the buffer is per-group, and an ungrouped percentile is
one group).  For tail quantiles (p ≤ a few %, or ≥ 96-ish %) the scalable
exact plan is an ORDER STATISTIC: `orderBy(col).limit(k)` compiles to
TakeOrderedAndProject — a bounded per-partition top-k heap + driver merge
— so the cluster never holds more than k values anywhere.  Interpolation
between the two neighboring order statistics reproduces the standard
linear-interpolation definition (Spark `percentile` ≡ DuckDB
`quantile_cont`) bit-for-bit.

Cost honesty: k ≈ p·n (or (1−p)·n from the top), so this is for TAIL
quantiles — a median would heap half the data.  Mid quantiles at scale
use approx_percentile; the clip-plan shape downstream is identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def exact_percentile(df: DataFrame, col: str, p: float, n: int | None = None) -> float:
    """Exact linear-interpolated quantile of a numeric column, computed as
    an order statistic (see module doc).  Nulls are ignored, matching
    Spark ``percentile`` / DuckDB ``quantile_cont`` (ascending orderBy
    puts nulls FIRST in Spark, so counting them would shift the
    quantile or interpolate against None).  ``n`` (the NON-NULL row
    count) can be passed to avoid a recount when the caller already has
    it."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    df = df.filter(F.col(col).isNotNull())
    if n is None:
        n = df.count()
    if n == 0:
        raise ValueError("exact_percentile of an empty or all-null column")
    pos = p * (n - 1)
    k = math.floor(pos)
    frac = pos - k
    if p <= 0.5:
        rows = df.select(col).orderBy(F.col(col).asc()).limit(k + 2).collect()
        v1 = rows[k][0]
        v2 = rows[k + 1][0] if k + 1 < len(rows) else v1
    else:
        # from the top: ascending v[k] is descending d[n-1-k]
        m = n - 1 - k
        rows = df.select(col).orderBy(F.col(col).desc()).limit(m + 1).collect()
        v1 = rows[m][0]
        v2 = rows[m - 1][0] if m >= 1 else v1
    return v1 + (v2 - v1) * frac
