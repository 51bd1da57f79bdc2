"""Bloom-filter shingle membership — constant-size-broadcast
decontamination (Bloom 1970; the standard at-scale screen before an
exact join, e.g. CCNet/Dolma-style pipeline contamination checks).

No reference analogue (the reference is a key-range connector,
src/composer.rs); LLM-pipeline tier.

Why a second decontamination path next to ``dedup.decontaminate``:
the exact version broadcasts the benchmark's DISTINCT SHINGLE STRINGS —
fine while the eval set is small, but the broadcast grows with both
benchmark size and shingle length.  The Bloom variant broadcasts only
the SET-BIT POSITIONS of an ``m``-bit filter: at most ``m`` ints
(~2 MB at the default m=2^18) no matter how large the benchmark or how
long its shingles.  At 100 TB corpus scale the corpus-side plan is
identical (one narrow probe explode, one broadcast hash join, two
aggregations); only the broadcast payload changes from unbounded to
fixed-size.  The price is a tunable false-positive rate — which is the
point: Bloom screening never misses true contamination (no false
negatives, pinned in tests), so it is a safe OVER-approximation used
to cheaply pre-filter before (or instead of) the exact join.

Hash portability: positions are derived from md5('bf<i>|' || shingle)
(first 8 hex digits → uniform int mod m), the module convention
(operators/dedup.py:23-25) DuckDB reproduces verbatim — so membership,
INCLUDING each false positive, is bit-identical across engines and the
oracle hash-checks the whole output, not just the guarantees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_M = 1 << 18
DEFAULT_K_HASHES = 3


def bloom_position(key: Column, i: int, m: int = DEFAULT_M) -> Column:
    """Probe position ``i`` for ``key``: md5('bf<i>|'||key)[:8] as int, mod m."""
    h = F.md5(F.concat(F.lit(f"bf{i}|"), key))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m).cast("int")


def _probe_array(key: Column, m: int, k_hashes: int) -> Column:
    return F.array(*[bloom_position(key, i, m) for i in range(k_hashes)])


def build_bloom_positions(
    keys: DataFrame,
    key_col: str = "shingle",
    m: int = DEFAULT_M,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """DISTINCT set-bit positions (``pos`` int) for a key set — the
    whole filter, bounded at ``m`` rows regardless of key count or key
    length.  Small enough to broadcast by construction."""
    probes = _probe_array(F.col(key_col), m, k_hashes)
    return keys.select(F.explode(probes).alias("pos")).distinct()


def bloom_membership(
    candidates: DataFrame,
    bits: DataFrame,
    key_col: str = "shingle",
    m: int = DEFAULT_M,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """``candidates`` plus boolean ``in_bloom``: true iff ALL
    ``k_hashes`` probe positions of ``key_col`` are set in ``bits``.

    Plan shape: posexplode the k probes (narrow, ×k row fan-out), one
    BROADCAST hash join against the bounded bit set, then re-group on
    the candidate row.  Membership is decided by COUNT(DISTINCT probe
    index among hits) == k_hashes (ADVICE r11 #2): a candidate row
    duplicated d times contributes d rows per probe, but the distinct
    index count is unaffected, so duplicates get the CORRECT membership
    (they still collapse to one output row — membership is a function
    of the key, so the collapse loses no information).  Probe collisions
    within one key (two i landing on the same pos) also stay correct:
    both indexes hit iff the shared position is set."""
    other = [c for c in candidates.columns if c != key_col]
    probes = candidates.select(
        *other,
        key_col,
        F.posexplode(_probe_array(F.col(key_col), m, k_hashes)).alias("_i", "pos"),
    )
    return (
        probes.join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left")
        .groupBy(*other, key_col)
        .agg(
            (
                F.count_distinct(F.when(F.col("_hit").isNotNull(), F.col("_i")))
                == k_hashes
            ).alias("in_bloom")
        )
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    m: int = DEFAULT_M,
    k_hashes: int = DEFAULT_K_HASHES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-screened decontamination: per corpus doc, the fraction of
    its word ``k``-gram shingles whose Bloom probes ALL hit the filter
    built from the benchmark's shingles.

    Output: (id, n_shingles, n_hit, bloom_overlap rounded 4, flagged) —
    same doc universe as ``dedup.decontaminate`` (docs with < k words
    carry no shingles and are absent).  ``bloom_overlap`` ≥ the exact
    overlap per doc and ``flagged`` ⊇ the exact ``contaminated`` set at
    equal threshold (no false negatives — pinned in tests/test_bloom.py);
    the gap is the filter's false-positive rate, ~(fill_ratio)^k_hashes.
    """
    from datafusion_bigtable_spark.operators.dedup import shingles

    c_sh = shingles(corpus, k=k, text_col=text_col, id_col=id_col)
    b_sh = shingles(benchmark, k=k, text_col=text_col, id_col=id_col).select("shingle").distinct()
    bits = build_bloom_positions(b_sh, m=m, k_hashes=k_hashes)
    mem = bloom_membership(c_sh, bits, m=m, k_hashes=k_hashes)
    scored = mem.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.col("in_bloom").cast("int")).alias("n_hit"),
    )
    frac = F.col("n_hit") / F.col("n_shingles")
    return scored.select(
        "id",
        "n_shingles",
        F.col("n_hit").cast("long").alias("n_hit"),
        F.round(frac, 4).alias("bloom_overlap"),
        (frac >= F.lit(threshold)).alias("flagged"),
    )
