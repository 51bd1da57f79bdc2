"""Absolute ANN quality gate: recall@10 of each approximate index against
brute-force ground truth at sf0.1 (2000 × 64-dim vectors, 21 queries).

The synthetic embeddings are near-uniform (no planted cluster structure),
which is the HARD regime for ANN — cosine scores concentrate, so pruning
candidates costs real recall.  Floors below are set ~0.05 under the
measured values (deterministic fixtures + deterministic training seeds →
stable numbers); the trade-off table lives in COVERAGE.md §ANN.

Measured (2026-08-13): IVF(16 cells, trained) nprobe 1/2/4/8 =
.219/.352/.533/.767; PQ(trained, 16 cents) m 8/16/32 = .148/.357/.605;
IVF×PQ defaults = .119; LSH defaults = .119.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_bigtable_spark.operators import similarity as S

SF01 = "/root/testdata/sf0.1"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF01}/embeddings.parquet")


@pytest.fixture(scope="module")
def pred():
    return F.col("vec_id") % 97 == 0


@pytest.fixture(scope="module")
def truth(emb, pred):
    out: dict[int, set[int]] = {}
    for r in S.topk_bruteforce(emb, pred, k=K).collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(out) >= 20
    return out


def _recall(df, truth) -> float:
    got: dict[int, set[int]] = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sum(len(got.get(q, set()) & t) / len(t) for q, t in truth.items()) / len(truth)


def test_ivf_recall_floor_and_nprobe_dial(emb, pred, truth):
    cb = S.train_ivf_codebook(emb, n_cells=16, iters=3)
    with S.build_ivf_index(emb, n_cells=16, nprobe=8, codebook=cb) as idx:
        r1 = _recall(S.topk_ivf(emb, pred, n_cells=16, k=K, nprobe=1, index=idx), truth)
        r4 = _recall(S.topk_ivf(emb, pred, n_cells=16, k=K, nprobe=4, index=idx), truth)
        r8 = _recall(S.topk_ivf(emb, pred, n_cells=16, k=K, nprobe=8, index=idx), truth)
    assert r1 >= 0.15, f"ivf nprobe=1 recall@10 {r1:.3f} — raise nprobe (or retrain codebook: more iters/cells)"
    assert r4 >= 0.45, f"ivf nprobe=4 recall@10 {r4:.3f} — raise nprobe (or retrain codebook: more iters/cells)"
    assert r8 >= 0.70, f"ivf nprobe=8 recall@10 {r8:.3f} — raise nprobe (or retrain codebook: more iters/cells)"
    # the dial must actually dial: probing more cells buys recall
    assert r1 < r4 < r8


def test_pq_recall_floor_and_m_dial(emb, pred, truth):
    r8 = _recall(
        S.topk_pq(emb, pred, k=K, m=8, codebooks=S.train_pq_codebooks(emb, m=8, iters=3)),
        truth,
    )
    r32 = _recall(
        S.topk_pq(emb, pred, k=K, m=32, codebooks=S.train_pq_codebooks(emb, m=32, iters=3)),
        truth,
    )
    assert r8 >= 0.10, f"pq m=8 recall@10 {r8:.3f} — raise m (more subspaces) or training iters"
    assert r32 >= 0.50, f"pq m=32 recall@10 {r32:.3f} — raise m (more subspaces) or training iters"
    # finer subspaces (shorter sub-vectors) must improve ADC fidelity
    assert r32 > r8


def test_ivfpq_composes_without_collapse(emb, pred, truth):
    # Both approximations multiply on this clusterless corpus, so the floor
    # is intentionally modest — the gate catches a BROKEN composition
    # (recall ~1/corpus → ~0.005), not a weak one.
    r = _recall(S.topk_ivfpq(emb, pred, k=K), truth)
    assert r >= 0.08, f"ivfpq recall@10 {r:.3f} — raise nprobe/m; compounding approximations, see COVERAGE.md §ANN"


def test_filtered_topk_prefilter_semantics(spark):
    """corpus_pred (r11): neighbors come ONLY from the filtered set, the
    query side still draws from the full frame, and the top-k is exact
    within the filtered set — including when the global (unfiltered)
    top-1 fails the filter."""
    from datafusion_bigtable_spark.operators.similarity import topk_bruteforce

    rows = [
        # query vector (id 0) points along +x
        (0, [1.0, 0.0], 0),
        # global best match, but label 9 — must NOT appear
        (1, [1.0, 0.01], 9),
        # filtered candidates, decreasing alignment
        (2, [1.0, 0.2], 3),
        (3, [1.0, 0.9], 3),
        (4, [-1.0, 0.0], 3),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = topk_bruteforce(
        e, F.col("vec_id") == 0, k=2, corpus_pred=F.col("label") == 3
    ).collect()
    assert [(r["neighbor_id"], r["rk"]) for r in sorted(got, key=lambda r: r["rk"])] == [
        (2, 1),
        (3, 2),
    ]


def test_bruteforce_corpus_widening_is_size_gated(spark, monkeypatch):
    """r19: the corpus-side widen pays an exchange only past the byte gate
    (a sub-split corpus scores within one task's time; measured at sf10 a
    2-row-group file pinned the cosine CPU to 2 tasks).  Pin BOTH sides of
    the gate on one fixture, and that the widened run returns the identical
    ranking — repartitioning must be placement-only for a deterministic
    (score DESC, neighbor_id ASC) window."""
    import datafusion_bigtable_spark.operators.similarity as S

    rows = [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(64)]
    # parquet-backed like production: a Python-local frame is a LogicalRDD
    # whose Catalyst size estimate is the unknown-stats maximum, which
    # would trivially pass any byte gate
    path = "/tmp/dbs_test_widen_gate.parquet"
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    e = spark.read.parquet(path)
    assert e.rdd.getNumPartitions() == 1, "fixture must be a narrow scan"
    pred = F.col("vec_id") < 2

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning(neighbor_id")

    base = S.topk_bruteforce(e, pred, k=3)
    assert n_exchanges(base) == 0, "tiny corpus must not pay the widening exchange"

    monkeypatch.setattr(S, "_BRUTE_WIDEN_MIN_BYTES", 1)
    widened = S.topk_bruteforce(e, pred, k=3)
    assert n_exchanges(widened) == 1, "gate lowered: corpus side must widen"

    key = lambda r: (r["query_id"], r["rk"])
    assert sorted(map(tuple, base.collect()), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, widened.collect()), key=lambda t: (t[0], t[3])
    )
