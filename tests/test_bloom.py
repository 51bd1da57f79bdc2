"""Bloom-filter decontamination guarantees (operators/bloom.py).

The contract worth pinning is the one the docstring sells: the Bloom
screen is a strict OVER-approximation of the exact shingle join — zero
false negatives at any filter size, false positives only — so it is
always safe to use as the cheap pre-filter before (or instead of) the
exact broadcast join at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_bigtable_spark.operators.bloom import (
    bloom_membership,
    build_bloom_positions,
    decontaminate_bloom,
)
from datafusion_bigtable_spark.operators.dedup import decontaminate, shingles


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "a completely different document about distributed query engines and shuffles"),
        (3, "the quick brown fox jumps over the lazy dog every single day"),
        (4, "spark catalyst optimizer pushes filters below the parquet scan boundary"),
        (5, "short doc"),  # < k words: no shingles, absent from both outputs
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )


def test_positions_bounded_and_in_range(spark, bench_docs):
    m = 64
    bits = build_bloom_positions(
        shingles(bench_docs).select("shingle").distinct(), m=m, k_hashes=3
    ).collect()
    assert 0 < len(bits) <= m
    assert all(0 <= r.pos < m for r in bits)


def test_members_always_hit(spark, bench_docs):
    # Every key that built the filter must test positive — at ANY m.
    for m in (16, 64, 1 << 18):
        keys = shingles(bench_docs).select("shingle").distinct()
        bits = build_bloom_positions(keys, m=m, k_hashes=3)
        mem = bloom_membership(keys, bits, m=m, k_hashes=3)
        assert mem.filter(~F.col("in_bloom")).count() == 0


def test_tiny_filter_shows_false_positives_never_negatives(spark, corpus, bench_docs):
    # m=16 with 3 hashes saturates the filter: non-member shingles collide
    # into set bits (false positives exist) but membership stays complete.
    m = 16
    b_keys = shingles(bench_docs).select("shingle").distinct()
    bits = build_bloom_positions(b_keys, m=m, k_hashes=3)
    c_keys = shingles(corpus).select("shingle").distinct()
    mem = bloom_membership(c_keys, bits, m=m, k_hashes=3)
    truth = c_keys.join(b_keys.withColumn("_t", F.lit(True)), "shingle", "left")
    joined = mem.join(truth, "shingle")
    # no false negatives:
    assert joined.filter(F.col("_t").isNotNull() & ~F.col("in_bloom")).count() == 0
    # the over-approximation is real at this size:
    assert joined.filter(F.col("_t").isNull() & F.col("in_bloom")).count() > 0


def test_flagged_superset_and_overlap_dominates_exact(spark, corpus, bench_docs):
    exact = decontaminate(corpus, bench_docs, k=3, threshold=0.5).select(
        "id", F.col("n_shingles").alias("e_n"), "overlap", "contaminated"
    )
    for m in (16, 65536):
        bloom = decontaminate_bloom(corpus, bench_docs, k=3, threshold=0.5, m=m, k_hashes=3)
        j = bloom.join(exact, "id", "full").collect()
        assert j, "joined comparison must be non-empty"
        for r in j:
            # identical doc universe (docs with < k words absent from both)
            assert r.n_shingles is not None and r.e_n is not None and r.n_shingles == r.e_n
            # per-doc domination: bloom_overlap >= exact overlap
            assert r.bloom_overlap >= r.overlap
            # flagged ⊇ contaminated at equal threshold
            if r.contaminated:
                assert r.flagged


def test_registered_query_matches_oracle(spark, sf_dir):
    # test_oracle.py parametrizes the full registry too; this direct copy
    # keeps the bloom contract self-contained when run as a single file.
    from datafusion_bigtable_spark.queries import REGISTRY
    from tests.oracle_harness import compare, duck_connection

    spec = REGISTRY["decontaminate_bloom"]
    compare(spec.fn(spark, sf_dir), duck_connection(sf_dir), spec.sql)


def test_bloom_no_false_negatives_property(spark):
    """Hypothesis sweep of the zero-false-negative guarantee: random key
    sets and filter sizes, every member must test positive."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    @settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        keys=st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=12), min_size=1, max_size=12, unique=True),
        m=st.sampled_from([8, 64, 1024]),
        k_hashes=st.integers(min_value=1, max_value=4),
    )
    def run(keys, m, k_hashes):
        kdf = spark.createDataFrame([(k,) for k in keys], "shingle string")
        bits = build_bloom_positions(kdf, m=m, k_hashes=k_hashes)
        mem = bloom_membership(kdf, bits, m=m, k_hashes=k_hashes)
        assert mem.filter(~F.col("in_bloom")).count() == 0

    run()


def test_membership_correct_for_duplicate_candidates(spark):
    """ADVICE r11 #2: a duplicated candidate row must report the SAME
    membership as a single copy (the old count(_hit)==k collapsed d
    copies into one row with count d*k and answered false)."""
    from datafusion_bigtable_spark.operators.bloom import (
        bloom_membership,
        build_bloom_positions,
    )

    keys = spark.createDataFrame([("alpha",), ("beta",)], "shingle string")
    bits = build_bloom_positions(keys)
    dup = spark.createDataFrame(
        [("alpha",), ("alpha",), ("alpha",), ("gamma",), ("gamma",)],
        "shingle string",
    )
    got = {r["shingle"]: r["in_bloom"] for r in bloom_membership(dup, bits).collect()}
    assert got["alpha"] is True
    # gamma may be a false positive by construction, but must equal the
    # single-copy answer
    single = {
        r["shingle"]: r["in_bloom"]
        for r in bloom_membership(
            spark.createDataFrame([("gamma",)], "shingle string"), bits
        ).collect()
    }
    assert got["gamma"] == single["gamma"]
