"""Sparse TF-IDF retrieval (operators/retrieval.py): pruning bound,
candidate contract, self-exclusion, weight math, and the plan shape
(broadcast query side — the index must never reshuffle for the match)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datafusion_bigtable_spark.operators.retrieval import sparse_topk, tfidf_postings


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "apple banana cherry"),
        (1, "apple banana durian"),
        (2, "apple cherry elderberry"),
        (3, "fig grape honeydew"),
        (4, "fig grape apple"),
        (5, "kiwi lemon mango"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stop_posting_pruning_bounds_df(spark, corpus):
    # 'apple' appears in 4/6 docs > 0.5·N → pruned; 'fig' in 2/6 → kept
    terms = {r.term for r in tfidf_postings(corpus, max_df_frac=0.5).collect()}
    assert "apple" not in terms
    assert "fig" in terms and "banana" in terms


def test_weights_are_tf_ln_n_over_df(spark, corpus):
    w = {
        (r.doc_id, r.term): r.wt
        for r in tfidf_postings(corpus, max_df_frac=1.0).collect()
    }
    assert w[(0, "banana")] == pytest.approx(1 * math.log(6 / 2))
    assert w[(3, "fig")] == pytest.approx(1 * math.log(6 / 2))
    assert w[(0, "apple")] == pytest.approx(1 * math.log(6 / 4))


def test_topk_excludes_self_and_requires_term_overlap(spark, corpus):
    out = sparse_topk(corpus, F.col("doc_id") == 0, k=10, max_df_frac=1.0).collect()
    assert all(r.query_id == 0 for r in out)
    assert all(r.neighbor_id != 0 for r in out)
    # doc 5 shares no term with doc 0 → never generated as a candidate
    assert 5 not in {r.neighbor_id for r in out}
    # doc 1 (apple+banana overlap) outranks doc 4 (apple only)
    ranks = {r.neighbor_id: r.rk for r in out}
    assert ranks[1] < ranks[4]


def test_rank_is_dense_from_one_and_score_sorted(spark, corpus):
    out = sparse_topk(corpus, F.col("doc_id").isin(0, 3), k=2, max_df_frac=1.0).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_query_side_broadcasts_index_never_reshuffles(spark, corpus):
    """The candidate join must be a BroadcastHashJoin from the EXPLICIT
    hint on the query side — a shuffle join here re-exchanges the whole
    index per query batch, the 100 TB killer this operator exists to
    avoid.  Auto-broadcast is disabled for the check so a tiny fixture
    cannot mask a dropped hint (at real scale nothing auto-broadcasts)."""
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = sparse_topk(
            corpus, F.col("doc_id") == 0, k=3, max_df_frac=1.0
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
