"""Streaming IVF upsert (streaming/index_stream.py): the streamed store
must equal the batch operator exactly, record per-batch drift yardsticks,
and stay idempotent under both checkpoint resume and full replay."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from datafusion_bigtable_spark.operators.similarity import (
    build_ivf_index,
    load_ivf_index,
    save_ivf_index,
    upsert_ivf_index,
)
from datafusion_bigtable_spark.queries import load
from datafusion_bigtable_spark.streaming.index_stream import run_streaming_index_upsert


def _setup(spark, sf_dir, tmp_path, n_files=4):
    e = load(spark, str(sf_dir), "embeddings")
    store = str(tmp_path / "store")
    feed = str(tmp_path / "feed")
    with build_ivf_index(e.filter(F.col("vec_id") % 4 != 0), n_cells=16) as idx:
        save_ivf_index(idx, store)
    e.filter(F.col("vec_id") % 4 == 0).repartition(n_files).write.parquet(feed)
    return e, store, feed


def _assignments(spark, path):
    return {
        (r["vec_id"], r["cell"])
        for r in load_ivf_index(spark, path).assignments.select("vec_id", "cell").collect()
    }


def test_streamed_store_equals_batch_upsert(spark, sf_dir, tmp_path):
    e, store, feed = _setup(spark, sf_dir, tmp_path)
    n = run_streaming_index_upsert(spark, feed, store, query_name="t_idxup_eq")

    batch_store = str(tmp_path / "batch_store")
    with build_ivf_index(e.filter(F.col("vec_id") % 4 != 0), n_cells=16) as idx:
        save_ivf_index(idx, batch_store)
    m = upsert_ivf_index(spark, batch_store, e.filter(F.col("vec_id") % 4 == 0))
    assert n == m > 0
    assert _assignments(spark, store) == _assignments(spark, batch_store)

    # one drift record per appending micro-batch, each with a yardstick
    with open(os.path.join(store, "_ivf_meta.json")) as f:
        ups = json.load(f)["upserts"]
    assert len(ups) == 4 and all(u["top1_mean"] is not None for u in ups)


def test_streamed_upsert_idempotent_under_resume_and_replay(spark, sf_dir, tmp_path):
    _, store, feed = _setup(spark, sf_dir, tmp_path)
    n = run_streaming_index_upsert(spark, feed, store, query_name="t_idxup_r1")
    assert n > 0
    before = _assignments(spark, store)
    # checkpoint resume: committed offsets -> no batches re-fire
    assert run_streaming_index_upsert(spark, feed, store, query_name="t_idxup_r2") == 0
    # full replay (fresh checkpoint): batches re-fire, anti-join appends 0
    import shutil

    shutil.rmtree(os.path.join(feed, "_checkpoint"))
    assert run_streaming_index_upsert(spark, feed, store, query_name="t_idxup_r3") == 0
    assert _assignments(spark, store) == before


def test_drifted_feed_surfaces_retrain_flag_in_return_value(spark, sf_dir, tmp_path):
    """VERDICT r13 #6: the streaming harness must surface the drift
    verdict — a feed whose second file is the provably-drifting
    negated-centroid-mean batch yields per-batch drift records and the
    aggregate retrain_recommended flag in the RETURN VALUE, with no
    _ivf_meta.json read by the caller."""
    from datafusion_bigtable_spark.operators.similarity import (
        negated_centroid_mean_batch,
    )

    e = load(spark, str(sf_dir), "embeddings")
    store = str(tmp_path / "store")
    feed = str(tmp_path / "feed")
    with build_ivf_index(e.filter(F.col("vec_id") % 4 != 0), n_cells=16) as idx:
        save_ivf_index(idx, store)
    # file 1: in-distribution batch; file 2: the drifting batch (cast to
    # the feed's declared array<float> — the drift is sign-level, so
    # float precision cannot mask it)
    e.filter(F.col("vec_id") % 4 == 0).coalesce(1).write.mode("append").parquet(feed)
    negated_centroid_mean_batch(spark, store, n=50).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    ).coalesce(1).write.mode("append").parquet(feed)

    res = run_streaming_index_upsert(spark, feed, store, query_name="t_idxup_drift")
    assert res > 0
    assert len(res.drift_records) == 2
    by_flag = {r["retrain_recommended"] for r in res.drift_records}
    assert by_flag == {False, True}, res.drift_records
    assert res.retrain_recommended is True
    assert all(r["top1_mean"] is not None for r in res.drift_records)


def test_clean_feed_reports_no_retrain(spark, sf_dir, tmp_path):
    _, store, feed = _setup(spark, sf_dir, tmp_path)
    res = run_streaming_index_upsert(spark, feed, store, query_name="t_idxup_clean")
    assert res > 0 and len(res.drift_records) == 4
    assert res.retrain_recommended is False
