"""Second-decade scale probe: run a fixed relational/events query set at
sf10 (tools/make_sf10.py output) and print per-query timings next to the
committed sf0.1 and sf1 records, with BOTH decades' marginal ratios.

The verdict this produces: a query whose decade-2 marginal ratio
(sf10/sf1) is materially above its decade-1 ratio (sf1/sf0.1) has a
plan with a superlinear term that one decade hid — growing ratios are
the red flag, not any absolute value (10× is the linear baseline; local
ratios run below it while data fits caches and above it when spill
starts, so compare SHAPE across decades, not against 10 exactly).

Query set: relational/events PLUS the content tier (make_sf10.py
replicates documents/embeddings with decade-orthogonal transforms — a
disjoint-letter rotation and per-replica sign-flip masks — so dedup/ANN
pair structure grows linearly like a real corpus).  Excluded: the
heaviest pair generators (dedup_ngram_jaccard, dedup_prefix_filter,
~100 s/sample at sf10) and bt/bucketed-fixture builds whose one-time
cost at a new sf dir would dominate the first sample.

Usage:  python tools/probe_sf10.py [/tmp/dbs_sf10]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dbs_sf10"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "topk_orders_global",
    "window_running_sum",
    "events_sessionize",
    "interval_join_order_events",
    "skew_salted_aggregation",
    "exact_quantiles_distributed",
    # content tier (decade-orthogonal replication, make_sf10.py)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "sim_topk_ivf_nprobe",
    "retrieval_sparse_topk",
    "text_tfidf_top_terms",
    "text_quality",
    # r15 additions: the saved-index searches reuse one content-addressed
    # store (the first sample pays the save, min-of-2 keeps the reused
    # one — same treatment as every build-or-reuse fixture here); the
    # prune query's second sample reads a bounded shard subset of its
    # reused range store; hybrid fuses two already-probed modalities.
    "retrieval_saved_topk",
    "retrieval_bm25_topk",
    "retrieval_hybrid_rrf",
    "sorted_shards_range_prune",
    # r16 additions: the serving-shape pair (both legs from saved
    # stores — the cross-decade bet is that their marginal cost tracks
    # the query set, not the corpus), the persisted-codes search, and
    # the two delete/compact lifecycle harnesses (fresh store per call
    # by design — their cost is the mutate-verify contract).
    "retrieval_hybrid_saved",
    "sim_topk_ivfpq_saved",
    "sim_index_delete",
    "retrieval_postings_delete",
    "retrieval_postings_compact",
    # r17 additions: the PQ-backed hybrid (the serving-memory claim —
    # dense leg over the persisted codes table; marginal cost should
    # track the query set like retrieval_hybrid_saved's), the IVF
    # compaction lifecycle (fresh store per call: build + attach +
    # 2 upserts + compact + search — cost is the mutate-verify
    # contract), and the component-pruned semantic dedup whose r17
    # union-find fast path must not regress across decades.
    "retrieval_hybrid_saved_pq",
    "sim_index_compact",
    "dedup_semantic_prune",
]


def main() -> None:
    from datafusion_bigtable_spark import queries as Q
    from datafusion_bigtable_spark.session import get_spark

    spark = get_spark("dbs-probe-sf10")
    spark.range(1).count()
    Q.load(spark, SF10, "lineitem").write.format("noop").mode("overwrite").save()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        Q.REGISTRY[name].fn(spark, SF10).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return round(time.perf_counter() - t0, 3)

    timings = {}
    for name in PROBE:
        a = run_once(name)
        b = run_once(name)
        timings[name] = min(a, b)

    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
        sf01 = json.load(f)["queries"]
    with open(os.path.join(REPO, "BENCH_SF1.json")) as f:
        sf1 = json.load(f)["queries"]

    print(f"{'query':38s} {'sf0.1':>7s} {'sf1':>7s} {'sf10':>8s} {'d1':>6s} {'d2':>6s}")
    rows = []
    def fmt(v, width, prec=2):
        return f"{v:{width}.{prec}f}" if v is not None else " " * (width - 1) + "-"

    for n, t10 in sorted(timings.items(), key=lambda kv: kv[1]):
        t01, t1 = sf01.get(n), sf1.get(n)
        d1 = round(t1 / t01, 1) if t01 and t1 else None
        d2 = round(t10 / t1, 1) if t1 else None
        rows.append({"query": n, "sf0.1": t01, "sf1": t1, "sf10": t10, "d1": d1, "d2": d2})
        print(
            f"{n:38s} {fmt(t01, 7)} {fmt(t1, 7)} {t10:8.2f} "
            f"{fmt(d1, 6, 1)} {fmt(d2, 6, 1)}"
        )
    print(json.dumps({"probe": rows, "sf10_dir": SF10}))


if __name__ == "__main__":
    main()
