"""Delete lifecycle + persisted PQ codes for the saved IVF store
(VERDICT r15 #4/#6): delete(build(C), X) ≡ build(C−X) with the same
centroids, name-encoded per-cell swap crash shapes, codes-table
maintenance (attach / incremental upsert encode / delete), and the
fail-loud re-attach path."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_bigtable_spark.operators.similarity import (
    attach_pq_codes,
    build_ivf_index,
    delete_from_ivf_index,
    load_ivf_index,
    load_pq_codes,
    pq_codebooks,
    save_ivf_index,
    topk_ivf,
    topk_ivfpq,
    topk_ivfpq_saved,
    upsert_ivf_index,
)
from datafusion_bigtable_spark.queries import load

@pytest.fixture(autouse=True)
def _clear_scratch_storage(spark):
    """The store mutations under test materialize per-operation scratch
    via eager localCheckpoint (delete's df decrements, upsert's batch
    codes); those RDD blocks are reclaimed by ContextCleaner on GC in a
    real session, but in the shared test session they linger into the
    NEXT module's storage-count pins (test_ivf_ownership sorts right
    after this file) and flake them when the cleaner races the
    assertion.  Drop them deterministically at each test's end."""
    yield
    spark.catalog.clearCache()


def PRED():
    return (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000)


def DEL():
    # the delete set avoids the seed ids (< 16) so a fresh build over the
    # remaining corpus derives the SAME default codebook — the equality
    # the oracle query checks needs identical centroids on both sides
    return (F.col("vec_id") % 16 == 3) & (F.col("vec_id") >= 16)


def _save_full(spark, sf_dir, path):
    e = load(spark, sf_dir, "embeddings")
    with build_ivf_index(e, n_cells=16) as idx:
        save_ivf_index(idx, path)
    return e


def test_delete_equals_fresh_build_with_same_centroids(spark, sf_dir, tmp_path):
    path = str(tmp_path / "store")
    e = _save_full(spark, sf_dir, path)
    n = delete_from_ivf_index(spark, path, e.filter(DEL()).select("vec_id"))
    assert n == e.filter(DEL()).count() > 0
    got = load_ivf_index(spark, path)
    remaining = e.filter(~DEL())
    with build_ivf_index(remaining, n_cells=16) as fresh:
        want_assign = sorted(
            (r.vec_id, r.cell)
            for r in fresh.assignments.select("vec_id", "cell").collect()
        )
        want_search = sorted(
            map(tuple, topk_ivf(remaining, PRED(), k=3, index=fresh).collect())
        )
    assert (
        sorted((r.vec_id, r.cell) for r in got.assignments.select("vec_id", "cell").collect())
        == want_assign
    )
    assert (
        sorted(map(tuple, topk_ivf(remaining, PRED(), k=3, index=got).collect()))
        == want_search
    )


def test_delete_manifest_matches_footers_and_is_idempotent(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from datafusion_bigtable_spark.operators.similarity import read_ivf_manifest

    path = str(tmp_path / "store")
    e = _save_full(spark, sf_dir, path)
    delete_from_ivf_index(spark, path, e.filter(DEL()).select("vec_id"))
    for row in read_ivf_manifest(path):
        files = glob.glob(os.path.join(path, f"cell={row['cell']}", "*.parquet"))
        true_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        assert row["rows"] == true_rows and row["files"] == len(files)
    # replayed takedown folds to nothing; unknown ids too
    assert delete_from_ivf_index(spark, path, e.filter(DEL()).select("vec_id")) == 0
    assert (
        delete_from_ivf_index(
            spark, path, spark.createDataFrame([(99_999_999,)], "vec_id long")
        )
        == 0
    )


def test_delete_swap_crash_shapes_heal(spark, sf_dir, tmp_path):
    """All crash states of the name-encoded swap heal on the next open:
    tmp-complete + cell-missing rolls FORWARD (including the
    zero-survivor cell that has no tmp subdir), tmp-incomplete rolls
    BACK, and a complete tmp with no backups (crash before any rename)
    is simply dropped."""
    path = str(tmp_path / "store")
    e = _save_full(spark, sf_dir, path)
    rows_before = load_ivf_index(spark, path).assignments.count()
    tmp = os.path.join(path, "._del_tmp")

    # forward: crash between the two renames for cell=5
    cdir = os.path.join(path, "cell=5")
    os.makedirs(tmp)
    shutil.copytree(cdir, os.path.join(tmp, "cell=5"))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()  # complete rewrite
    old = os.path.join(path, "._del_old_cell=5")
    os.rename(cdir, old)
    idx = load_ivf_index(spark, path)
    assert os.path.isdir(cdir) and not os.path.isdir(tmp) and not os.path.isdir(old)
    assert idx.assignments.count() == rows_before

    # forward, zero-survivor cell: complete tmp WITHOUT a cell subdir —
    # the cell stays legitimately absent and the backup drops
    os.makedirs(tmp)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    os.rename(cdir, old)
    n5 = spark.read.option("basePath", path).parquet(old).count()
    idx = load_ivf_index(spark, path)
    assert not os.path.isdir(cdir) and not os.path.isdir(tmp) and not os.path.isdir(old)
    assert idx.assignments.count() == rows_before - n5
    # restore cell=5 for the remaining shapes
    shutil.rmtree(path)
    e = _save_full(spark, sf_dir, path)

    # back: incomplete tmp (no _SUCCESS) — the backup restores
    os.makedirs(tmp)
    os.rename(cdir, old)
    idx = load_ivf_index(spark, path)
    assert os.path.isdir(cdir) and not os.path.isdir(old) and not os.path.isdir(tmp)
    assert idx.assignments.count() == rows_before

    # dropped: complete tmp, no backups (crash before any rename)
    os.makedirs(tmp)
    shutil.copytree(cdir, os.path.join(tmp, "cell=5"))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    idx = load_ivf_index(spark, path)
    assert os.path.isdir(cdir) and not os.path.isdir(tmp)
    assert idx.assignments.count() == rows_before


def test_pq_saved_search_matches_fresh_computation(spark, sf_dir, tmp_path):
    """VERDICT r15 #6 done-criterion: the saved-codes search hash-equals
    topk_ivfpq's fresh computation (same codebooks, same cells)."""
    path = str(tmp_path / "store")
    e = _save_full(spark, sf_dir, path)
    books = pq_codebooks(e, m=8, k_c=16)
    attach_pq_codes(spark, path, books)
    fresh = sorted(map(tuple, topk_ivfpq(e, PRED(), m=8, k_c=16, k=3).collect()))
    saved = sorted(map(tuple, topk_ivfpq_saved(spark, path, PRED(), k=3).collect()))
    assert saved == fresh and len(saved) > 0


def test_pq_load_is_metadata_only(spark, sf_dir, tmp_path):
    """load_pq_codes performs zero Spark jobs and opens no data file —
    pinned by physically moving the codes files away (the chmod trick is
    vacuous under root, ADVICE r15 #4)."""
    path = str(tmp_path / "store")
    e = _save_full(spark, sf_dir, path)
    attach_pq_codes(spark, path, pq_codebooks(e, m=8, k_c=16))
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    cdir = os.path.join(path, "_pq_codes")
    hidden = str(tmp_path / "hidden")
    os.makedirs(hidden)
    moved = []
    for f in os.listdir(cdir):
        if f.endswith(".parquet"):
            os.rename(os.path.join(cdir, f), os.path.join(hidden, f))
            moved.append(f)
    assert moved
    try:
        codes, books, meta = load_pq_codes(spark, path)
    finally:
        for f in moved:
            os.rename(os.path.join(hidden, f), os.path.join(cdir, f))
    assert meta["m"] == 8 and len(books) == 8
    assert set(tracker.getJobIdsForGroup(None)) == before, "load ran a Spark job"


def test_pq_upsert_encodes_only_the_batch(spark, sf_dir, tmp_path):
    """Incremental maintenance: an upsert appends the batch's codes
    without rewriting existing code files, and the resulting saved
    search equals the fresh IVF×PQ computation over the merged corpus
    (explicit shared codebooks on both sides)."""
    path = str(tmp_path / "store")
    e = load(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 4 != 0)
    batch = e.filter(F.col("vec_id") % 4 == 0)
    # explicit shared codebooks (ivf + pq) derived from the FULL corpus
    # so the fresh computation and the upserted store agree exactly
    cb_ivf = [
        list(map(float, r.embedding))
        for r in e.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    books = pq_codebooks(e, m=8, k_c=16)
    with build_ivf_index(base, n_cells=16, codebook=cb_ivf) as idx:
        save_ivf_index(idx, path)
    attach_pq_codes(spark, path, books)
    cdir = os.path.join(path, "_pq_codes")
    state = {
        f: os.stat(os.path.join(cdir, f)).st_mtime_ns
        for f in os.listdir(cdir)
        if f.endswith(".parquet")
    }
    n = upsert_ivf_index(spark, path, batch)
    assert n == batch.count()
    after = {
        f: os.stat(os.path.join(cdir, f)).st_mtime_ns
        for f in os.listdir(cdir)
        if f.endswith(".parquet")
    }
    assert all(after[f] == state[f] for f in state), "old code files rewritten"
    assert len(after) > len(state), "no batch code files appended"
    saved = sorted(map(tuple, topk_ivfpq_saved(spark, path, PRED(), k=3).collect()))
    with build_ivf_index(e, n_cells=16, codebook=cb_ivf) as fr:
        fresh = sorted(
            map(tuple, topk_ivfpq(e, PRED(), codebooks=books, index=fr, k=3).collect())
        )
    assert saved == fresh and len(saved) > 0


def test_pq_crash_fails_loud_and_reattach_recovers(spark, sf_dir, tmp_path):
    """Codes meta removed first ⇒ any crash reads as 'codes missing';
    re-attach (codebooks=None) rebuilds from the persisted training
    state and search comes back identical."""
    path = str(tmp_path / "store")
    e = _save_full(spark, sf_dir, path)
    attach_pq_codes(spark, path, pq_codebooks(e, m=8, k_c=16))
    want = sorted(map(tuple, topk_ivfpq_saved(spark, path, PRED(), k=3).collect()))
    os.remove(os.path.join(path, "_pq_meta.json"))  # simulated torn mutation
    with pytest.raises(FileNotFoundError, match="re-run attach_pq_codes"):
        load_pq_codes(spark, path)
    attach_pq_codes(spark, path)  # codebooks from _pq_codebooks.json
    got = sorted(map(tuple, topk_ivfpq_saved(spark, path, PRED(), k=3).collect()))
    assert got == want


def test_delete_removes_pq_code_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "store")
    e = _save_full(spark, sf_dir, path)
    attach_pq_codes(spark, path, pq_codebooks(e, m=8, k_c=16))
    delete_from_ivf_index(spark, path, e.filter(DEL()).select("vec_id"))
    codes, _, _ = load_pq_codes(spark, path)
    gone = {r.vec_id for r in e.filter(DEL()).select("vec_id").collect()}
    left = {r.id for r in codes.select("id").collect()}
    assert not (left & gone), "deleted ids survive in the codes table"
    assert left == {r.vec_id for r in e.filter(~DEL()).select("vec_id").collect()}


def test_compact_restores_file_bounds_and_is_invisible(spark, sf_dir, tmp_path):
    """VERDICT r16 #4 done-criterion: after K upserts fragment the cells
    and the codes table, compact_ivf_store restores the per-cell and
    codes file bounds while search AND code rows stay bit-identical; a
    second call is a no-op."""
    import glob

    from datafusion_bigtable_spark.operators.similarity import compact_ivf_store

    path = str(tmp_path / "store")
    e = load(spark, sf_dir, "embeddings")
    with build_ivf_index(e.filter(F.col("vec_id") % 4 != 0), n_cells=16) as idx:
        save_ivf_index(idx, path)
    attach_pq_codes(spark, path, pq_codebooks(e, m=8, k_c=16), n_files=2)
    for m in (0, 4):
        upsert_ivf_index(
            spark, path, e.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") % 8 == m))
        )

    def fcount(d):
        return len(glob.glob(os.path.join(d, "*.parquet")))

    assert max(fcount(c) for c in glob.glob(path + "/cell=*")) > 1  # fragmented
    want = sorted(
        map(tuple, topk_ivf(e, PRED(), k=3, index=load_ivf_index(spark, path)).collect())
    )
    codes_want = sorted(
        map(
            tuple,
            load_pq_codes(spark, path)[0]
            .select("id", F.col("codes").cast("string"))
            .collect(),
        )
    )
    res = compact_ivf_store(spark, path, codes_n_files=1)
    assert res["cells_compacted"] > 0 and res["codes_compacted"]
    assert max(fcount(c) for c in glob.glob(path + "/cell=*")) == 1
    assert fcount(os.path.join(path, "_pq_codes")) == 1
    got = sorted(
        map(tuple, topk_ivf(e, PRED(), k=3, index=load_ivf_index(spark, path)).collect())
    )
    codes_got = sorted(
        map(
            tuple,
            load_pq_codes(spark, path)[0]
            .select("id", F.col("codes").cast("string"))
            .collect(),
        )
    )
    assert got == want and codes_got == codes_want
    assert compact_ivf_store(spark, path, codes_n_files=1) == {
        "cells_compacted": 0,
        "codes_compacted": False,
    }
    # manifest still matches footers after the rewrite
    from datafusion_bigtable_spark.operators.similarity import read_ivf_manifest

    man = {m["cell"]: m["rows"] for m in read_ivf_manifest(path)}
    actual = {
        r["cell"]: r["n"]
        for r in load_ivf_index(spark, path)
        .assignments.groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert man == actual


def test_compact_crash_shapes_heal(spark, sf_dir, tmp_path):
    """Compaction reuses the delete swap machinery (cells) and the
    meta-removed-first window (codes), so its crash shapes heal through
    the SAME paths — pin the two compaction-specific states: a complete
    cells tmp with a pending marker (rolls forward, manifest recounts),
    and a torn codes rewrite (fails loud, re-attach recovers, the next
    compact sweeps the leftover tmp)."""
    import glob

    from datafusion_bigtable_spark.operators.similarity import compact_ivf_store

    path = str(tmp_path / "store")
    e = _save_full(spark, sf_dir, path)
    attach_pq_codes(spark, path, pq_codebooks(e, m=8, k_c=16))
    rows_before = load_ivf_index(spark, path).assignments.count()

    # cells: crash between the two renames mid-swap (the delete shapes
    # test covers the full matrix; this pins that a COMPACTION-shaped
    # tmp — same rows, fewer files — heals identically)
    cdir = os.path.join(path, "cell=5")
    tmp = os.path.join(path, "._del_tmp")
    os.makedirs(tmp)
    shutil.copytree(cdir, os.path.join(tmp, "cell=5"))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    os.rename(cdir, os.path.join(path, "._del_old_cell=5"))
    assert load_ivf_index(spark, path).assignments.count() == rows_before
    assert os.path.isdir(cdir) and not os.path.isdir(tmp)

    # codes: crash mid-rewrite — meta gone, tmp half-written
    os.remove(os.path.join(path, "_pq_meta.json"))
    os.makedirs(os.path.join(path, "_pq_codes_tmp"))
    with pytest.raises(FileNotFoundError, match="re-run attach_pq_codes"):
        load_pq_codes(spark, path)
    attach_pq_codes(spark, path)  # recover from persisted codebooks
    compact_ivf_store(spark, path)  # sweeps the leftover tmp
    assert not os.path.isdir(os.path.join(path, "_pq_codes_tmp"))
    assert len(glob.glob(os.path.join(path, "_pq_codes", "*.parquet"))) >= 1
    load_pq_codes(spark, path)  # reads clean


def test_streaming_maintain_holds_file_bounds(spark, sf_dir, tmp_path):
    """r17 ingest-forever composition: the maintain stream upserts each
    micro-batch and then holds the store to its file bounds — after the
    feed drains, no cell (and not the codes table) exceeds the bound,
    at least one batch actually compacted (the policy fired, not just
    no-opped), and the search equals the batch-upsert store's."""
    import glob

    from datafusion_bigtable_spark.streaming.index_stream import (
        run_streaming_index_maintain,
    )

    path = str(tmp_path / "store")
    feed = str(tmp_path / "feed")
    e = load(spark, sf_dir, "embeddings")
    with build_ivf_index(e.filter(F.col("vec_id") % 4 != 0), n_cells=16) as idx:
        save_ivf_index(idx, path)
    attach_pq_codes(spark, path, pq_codebooks(e, m=8, k_c=16), n_files=2)
    e.filter(F.col("vec_id") % 4 == 0).repartition(3).write.parquet(feed)
    # max_files_per_cell=1 pins the per-batch CELL compaction path (the
    # r18 default is 8 — amortized; see the write-amplification test)
    res = run_streaming_index_maintain(
        spark, feed, path, max_files_per_cell=1, codes_n_files=2
    )
    assert res == e.filter(F.col("vec_id") % 4 == 0).count()
    assert res.compactions, "3 appending batches must trigger >=1 compaction"
    assert max(
        len(glob.glob(os.path.join(c, "*.parquet")))
        for c in glob.glob(path + "/cell=*")
    ) == 1
    assert len(glob.glob(os.path.join(path, "_pq_codes", "*.parquet"))) <= 2
    # equality with the batch twin: one upsert of the whole quarter
    batch_path = str(tmp_path / "batch_store")
    with build_ivf_index(e.filter(F.col("vec_id") % 4 != 0), n_cells=16) as idx:
        save_ivf_index(idx, batch_path)
    upsert_ivf_index(spark, batch_path, e.filter(F.col("vec_id") % 4 == 0))
    got = sorted(
        map(tuple, topk_ivf(e, PRED(), k=3, index=load_ivf_index(spark, path)).collect())
    )
    want = sorted(
        map(
            tuple,
            topk_ivf(e, PRED(), k=3, index=load_ivf_index(spark, batch_path)).collect(),
        )
    )
    assert got == want


def test_streaming_maintain_default_bound_amortizes_rewrites(spark, sf_dir, tmp_path):
    """r18 write-amplification fix: at the default cell bound (8, was 1)
    a short feed's upserts stay WITHIN bounds — zero full-cell rewrites
    (previously every batch rewrote every touched cell's full data),
    while the store still cannot fragment past the bound and the result
    is identical (compaction is search-invisible by contract).  The
    codes table compacts ONCE on the stream under the default 2×
    trigger/target hysteresis (attach 2 + three 1-file appends crosses
    trigger 4 at the third batch only — previously the single bound
    re-fired every batch), so the maintain machinery stays exercised
    without per-batch table rewrites."""
    import glob

    from datafusion_bigtable_spark.streaming.index_stream import (
        run_streaming_index_maintain,
    )

    path = str(tmp_path / "store")
    feed = str(tmp_path / "feed")
    e = load(spark, sf_dir, "embeddings")
    with build_ivf_index(e.filter(F.col("vec_id") % 4 != 0), n_cells=16) as idx:
        save_ivf_index(idx, path)
    attach_pq_codes(spark, path, pq_codebooks(e, m=8, k_c=16), n_files=2)
    e.filter(F.col("vec_id") % 4 == 0).repartition(3).write.parquet(feed)
    res = run_streaming_index_maintain(spark, feed, path, codes_n_files=2)
    assert res == e.filter(F.col("vec_id") % 4 == 0).count()
    # no full-cell rewrite fired: 1 save file + ≤3 clustered appends per
    # cell stays within the default bound of 8 …
    assert sum(c["cells_compacted"] for c in res.compactions) == 0
    assert max(
        len(glob.glob(os.path.join(c, "*.parquet")))
        for c in glob.glob(path + "/cell=*")
    ) <= 8
    # … while the codes table compacted EXACTLY once (trigger 2×2=4
    # crossed at the third append only — hysteresis, not per-batch)
    assert sum(bool(c["codes_compacted"]) for c in res.compactions) == 1
    assert len(glob.glob(os.path.join(path, "_pq_codes", "*.parquet"))) <= 2


def test_store_stats_track_fragmentation_without_jobs(spark, sf_dir, tmp_path):
    """ivf_store_stats is the maintenance scheduler's decision input:
    listing-only (zero Spark jobs), tracks upsert fragmentation, and
    returns to the bound after compaction."""
    from datafusion_bigtable_spark.operators.similarity import (
        compact_ivf_store,
        ivf_store_stats,
    )

    path = str(tmp_path / "store")
    e = load(spark, sf_dir, "embeddings")
    with build_ivf_index(e.filter(F.col("vec_id") % 4 != 0), n_cells=16) as idx:
        save_ivf_index(idx, path)
    attach_pq_codes(spark, path, pq_codebooks(e, m=8, k_c=16), n_files=2)
    s0 = ivf_store_stats(path)
    assert s0["max_files_per_cell"] >= 1 and s0["pq_codes_files"] == 2
    assert s0["n_rows"] == e.filter(F.col("vec_id") % 4 != 0).count()
    for m in (0, 4):
        upsert_ivf_index(
            spark, path, e.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") % 8 == m))
        )
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    s1 = ivf_store_stats(path)
    assert set(tracker.getJobIdsForGroup(None)) == before, "stats ran a Spark job"
    assert s1["max_files_per_cell"] > s0["max_files_per_cell"]  # fragmented
    assert s1["n_rows"] == e.count()
    compact_ivf_store(spark, path, codes_n_files=1)
    s2 = ivf_store_stats(path)
    assert s2["max_files_per_cell"] == 1 and s2["pq_codes_files"] == 1
    assert s2["n_rows"] == e.count()


def test_streaming_takedown_replay_is_noop_both_stores(spark, sf_dir, tmp_path):
    """At-least-once delivery needs no guard on the takedown streams:
    the batch deletes are idempotent, so a worst-case full replay
    (fresh checkpoint over the same feed) removes zero ids from either
    store."""
    from datafusion_bigtable_spark.operators.retrieval import (
        load_postings_index,
        save_postings_index,
    )
    from datafusion_bigtable_spark.queries import load as _load
    from datafusion_bigtable_spark.streaming.takedown_stream import (
        run_streaming_ivf_delete,
        run_streaming_postings_delete,
    )

    # sparse store
    docs = _load(spark, sf_dir, "documents")
    pstore = str(tmp_path / "pstore")
    pfeed = str(tmp_path / "pfeed")
    save_postings_index(docs, pstore)
    n_total = docs.count()
    docs.filter(F.col("doc_id") % 7 == 0).select("doc_id").repartition(2).write.parquet(pfeed)
    n_del = docs.filter(F.col("doc_id") % 7 == 0).count()
    n1 = run_streaming_postings_delete(spark, pfeed, pstore, query_name="t_pdel1")
    assert n1 == n_del
    assert load_postings_index(spark, pstore).meta["n_docs"] == n_total - n_del
    shutil.rmtree(os.path.join(pfeed, "_checkpoint"))
    n2 = run_streaming_postings_delete(spark, pfeed, pstore, query_name="t_pdel2")
    assert n2 == 0, "replayed takedown removed documents again"

    # dense store
    e = _save_full(spark, sf_dir, str(tmp_path / "vstore"))
    vstore = str(tmp_path / "vstore")
    vfeed = str(tmp_path / "vfeed")
    e.filter(DEL()).select("vec_id").repartition(2).write.parquet(vfeed)
    want = e.filter(DEL()).count()
    m1 = run_streaming_ivf_delete(spark, vfeed, vstore, query_name="t_vdel1")
    assert m1 == want
    shutil.rmtree(os.path.join(vfeed, "_checkpoint"))
    m2 = run_streaming_ivf_delete(spark, vfeed, vstore, query_name="t_vdel2")
    assert m2 == 0, "replayed takedown removed vectors again"
