"""Bucketed co-located joins — the pre-shuffled table layout.

At 100 TB the dominant repeated cost of a fact⋈fact join is the shuffle
of BOTH sides on the join key, re-paid by every downstream job.  Spark's
answer is bucketing: write each table hash-partitioned into N buckets on
the key (optionally sorted within buckets); every later equi-join on
that key then reads co-located buckets — **zero Exchange on either
side**, and with sorted buckets zero Sort too, leaving a pure streaming
SortMergeJoin.  An equality filter on the bucket key additionally prunes
the SCAN to one bucket (``SelectedBucketsCount: 1 out of N``) — the
hash-key analogue of the cells store's key-range file pruning.

This module is the thin, opinionated wrapper this engine uses: external
tables (explicit ``path`` — no warehouse dependence, content-addressable
like every other fixture store), overwrite-idempotent, and bucket counts
chosen once per table pair (both sides MUST agree for the exchange-free
plan; Spark joins mismatched counts by shuffling the smaller).

Two session switches decide how much of the layout Spark exploits
(defaults changed in Spark 3 to tolerate multi-file buckets):

- ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` lets the
  scan report the ``sortBy`` order, eliding the pre-merge-join Sort —
  sound ONLY with one file per bucket, which ``write_bucketed_table``
  guarantees by repartitioning onto the bucket key before the write.
  Without it the join is still Exchange-free but pays a partition-local
  Sort.
- ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` keeps
  the bucketed read for plain filters, so a bucket-key equality prunes
  the scan (``SelectedBucketsCount: 1 out of N``); the default planner
  drops the bucket layout when no join/aggregate consumes it.

No reference analogue (the reference's scan is single-partition by
design, execute_plan.rs:84-86, and DataFusion delegates physical layout
to the caller); scale tier.  Plan contracts pinned in
tests/test_bucketing.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as an external bucketed (and optionally
    within-bucket-sorted) parquet table registered under ``name``.

    Bucketing metadata lives in the session catalog — ``spark.table(name)``
    is how readers get the exchange-free guarantee (a plain
    ``spark.read.parquet(path)`` sees the same bytes but NOT the bucket
    spec, and will shuffle).  ``mode("overwrite")`` makes re-runs
    idempotent; at 100 TB pick ``n_buckets`` so each bucket lands in the
    128 MB–1 GB band (buckets are the unit of join-task parallelism).
    """
    from pyspark.sql import functions as F

    # ONE file per bucket: without this, every write task emits its own
    # file per bucket, and a multi-file bucket is only per-file sorted —
    # the reader then re-Sorts before a merge join, losing half the
    # layout's value.  Repartitioning on the bucket key first puts each
    # bucket's rows in exactly one task (spark.sql.files.maxRecordsPerFile
    # still bounds file size on a real cluster if a bucket outgrows it —
    # at which point the re-Sort returns; size n_buckets accordingly).
    out = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        out.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read of a bucketed table (keeps the bucket spec, unlike a
    path read)."""
    return spark.table(name)


def suggest_bucket_count(
    paths: Sequence[str],
    target_bucket_bytes: int = 256 * 1024 * 1024,
    minimum: int = 16,
) -> int:
    """One bucket count for a JOIN FAMILY of tables, sized off the
    LARGEST member.

    Both sides of an equi-join must agree on the bucket count for the
    exchange-free plan (Spark shuffles the smaller side on a mismatch),
    so the count is a property of the table FAMILY, not of one table —
    size it so the BIGGEST table's buckets land in the 128 MB–1 GB band
    (buckets are the unit of join-task parallelism AND of the one-file-
    per-bucket sort guarantee; a bucket that outgrows
    ``maxRecordsPerFile`` splits into multiple files and re-pays the
    pre-merge Sort).  At 100 TB with the default target this yields
    ~400k buckets — past the point where per-bucket task overhead bites;
    cap by raising ``target_bucket_bytes`` (1 GB → ~100k) or
    partition-THEN-bucket (date partitions × buckets) so each partition's
    family stays in range.  The floor keeps small test fixtures at a
    parallelism-friendly width.  Powers of two only, so families sized
    at different times still tend to agree.
    """
    import math
    import os

    def _bytes(p: str) -> int:
        if os.path.isfile(p):
            return os.path.getsize(p)
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, files in os.walk(p)
            for f in files
        )

    largest = max((_bytes(p) for p in paths), default=0)
    need = max(minimum, math.ceil(largest / target_bucket_bytes))
    return 1 << (need - 1).bit_length()


def custkey_family(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """THE custkey join family: (customer, orders) bucketed on custkey.

    Family membership and the shared bucket count are defined exactly
    once here (review r14-3 #4: six inline copies of the member list
    meant one divergent copy would re-size its fixtures into a layout
    the sweep treats as a stale version of the others' — a permanent
    drop/rewrite cycle).  Every consumer of the custkey layout calls
    this; a new member is added HERE so the whole family re-sizes
    together.
    """
    import os

    paths = [
        os.path.join(sf_dir, "customer.parquet"),
        os.path.join(sf_dir, "orders.parquet"),
    ]
    nb = suggest_bucket_count(paths)
    return (
        bucketed_fixture(spark, sf_dir, "customer", ["c_custkey"], n_buckets=nb),
        bucketed_fixture(spark, sf_dir, "orders", ["o_custkey"], n_buckets=nb),
    )


def orderkey_family(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """THE orderkey join family: (orders, lineitem) bucketed on orderkey.
    See :func:`custkey_family` for why membership lives here."""
    import os

    paths = [
        os.path.join(sf_dir, "orders.parquet"),
        os.path.join(sf_dir, "lineitem.parquet"),
    ]
    nb = suggest_bucket_count(paths)
    return (
        bucketed_fixture(spark, sf_dir, "orders", ["o_orderkey"], n_buckets=nb),
        bucketed_fixture(spark, sf_dir, "lineitem", ["l_orderkey"], n_buckets=nb),
    )


def drop_stale_family_tables(spark: SparkSession, prefix: str, keep: str) -> None:
    """Catalog + DISK hygiene for one content-addressed layout family.

    Drops every registered table named ``{prefix}{12-hex tag}`` except
    ``keep`` and reclaims its /tmp backing directory (review r14 #5: a
    sweep that bounds only the catalog leaks a full bucketed table copy
    per fixture regeneration).  The 12-hex-tag shape requirement makes
    the match exact even when another family's name happens to share
    ``prefix`` as a string prefix — only true family members are swept.
    Only paths under ``/tmp/dbs_bucket`` are ever removed.
    """
    import re
    import shutil
    import warnings

    for t in spark.catalog.listTables():
        if not t.name.startswith(prefix) or t.name == keep:
            continue
        if not re.fullmatch(r"[0-9a-f]{12}", t.name[len(prefix):]):
            continue
        path = None
        try:
            loc = (
                spark.sql(f"DESCRIBE TABLE EXTENDED {t.name}")
                .filter("col_name = 'Location'")
                .first()
            )
            if loc is not None:
                # urlparse handles both 'file:/x' and 'file:///x' forms
                # (review r14-2 #5: a naive replace('file:','') left '//'
                # prefixes that failed the /tmp guard and leaked the dir)
                from urllib.parse import urlparse

                path = urlparse(loc["data_type"]).path
        except Exception as exc:  # noqa: BLE001 — reported, never silent
            # VERDICT r14 #4: a silently-swallowed DESCRIBE failure drops
            # the catalog entry but skips the /tmp reclaim, re-opening
            # (for that table) the disk leak this sweep exists to close.
            # The drop still proceeds (a stale catalog entry is worse
            # than a leaked dir), but the skipped reclaim is LOUD so the
            # leak is attributable instead of invisible.
            warnings.warn(
                f"drop_stale_family_tables: DESCRIBE {t.name} failed "
                f"({exc!r}); dropping the table WITHOUT reclaiming its "
                "backing directory — reclaim it manually",
                RuntimeWarning,
                stacklevel=2,
            )
        spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        if path and path.startswith("/tmp/dbs_bucket"):
            shutil.rmtree(path, ignore_errors=True)


def bucketed_fixture(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
) -> DataFrame:
    """Opt-in bucketed variant of the testdata fixture loader
    (VERDICT r13 #5): the FULL fixture table as a bucketed catalog
    table, written once per fixture generation and reused.

    Content-addressed on the source parquet's (path, mtime, size) plus
    the layout parameters: the first call per content pays the bucketed
    write (the one-time layout cost); every later call — across queries
    and rounds in the same session — reuses the registered table, so
    each subsequent equi-join or aggregate on ``bucket_cols`` runs
    exchange-free instead of re-shuffling the fixture.  That
    write-once/reuse-forever split is the entire 100 TB argument for
    bucketing, and it is why this loader keeps the WHOLE table (column
    pruning still reaches the scan; a per-query column subset would
    fracture the shared layout into per-query copies).  Values are
    byte-identical to ``spark.read.parquet`` — layout never changes
    results, only plans (oracle-checked by every opted-in query).
    """
    import os
    import shutil

    from datafusion_bigtable_spark.tagging import tag_of

    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    # Both tags route through the shared frozen-format helper (ADVICE
    # r14): byte-identical to the previous hand-rolled md5 idioms —
    # pinned in tests/test_bucketing.py so no fixture re-keys.
    tag = tag_of(
        "bfix1",
        os.path.abspath(src),
        st.st_mtime_ns,
        st.st_size,
        ",".join(bucket_cols),
        n_buckets,
    )
    sfname = os.path.basename(os.path.normpath(sf_dir))
    # The LAYOUT family is (source path, table, bucket key): members of
    # one family are content VERSIONS of the same layout, which is what
    # makes a stale member safe to delete.  The same table bucketed on
    # two different keys (orders on custkey for a customer join, orders
    # on orderkey for a lineitem join) is two families — and so is the
    # same (table, key) at two SCALE FACTORS (review r14-2 #1: a family
    # that omitted the source path treated the sf0.01 layout as a stale
    # version of the sf0.1 one and rmtree'd it).  The segment is a
    # fixed-width hash of the '|'-joined identity (review r14 #3: a
    # plain '_'.join(bucket_cols) segment is prefix-ambiguous —
    # ['a','b_c'] vs ['a_b','c']); the human-readable table/key names
    # stay in the path.  n_buckets is deliberately NOT family identity:
    # resizing a layout supersedes the old size, which should be swept.
    fam = tag_of(os.path.abspath(src), table, *bucket_cols, n=8)
    keyseg = "-".join(bucket_cols)
    name = f"dbs_bucketfix_{table}_{fam}_{tag}"
    # fam sits in the PATH too so the cross-session disk sweep below can
    # scope itself to exactly this family without a catalog entry (two sf
    # dirs sharing a basename hash to different fams, so the sweep can
    # never take a sibling family's live fixture).
    base = f"/tmp/dbs_bucketfix_{sfname}_{table}_{keyseg}_{fam}_{tag}"
    # Timestamp columns must round-trip tz-independently through the
    # copy, same contract as the plain fixture loader.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.catalog.tableExists(name) and os.path.isdir(base):
        return spark.table(name)
    # Catalog + disk hygiene scoped to THIS (table, key) family only
    # (ADVICE r13: a sweep must never match a sibling's prefix).
    drop_stale_family_tables(spark, f"dbs_bucketfix_{table}_{fam}_", name)
    # Disk-level sweep for superseded content versions the CATALOG no
    # longer knows (review r14-3 #3: after a testdata regeneration, a
    # fresh session's catalog is empty, so the catalog-driven sweep above
    # finds nothing and every regeneration would leak a full bucketed
    # table copy on /tmp forever).  The family identity is in the path;
    # only 12-hex-tag siblings of THIS family are removed.
    import glob as _glob
    import re as _re

    for d in _glob.glob(f"/tmp/dbs_bucketfix_{sfname}_{table}_{keyseg}_{fam}_*"):
        leaf = os.path.basename(d)
        stale_tag = leaf.rsplit("_", 1)[-1]
        if d != base and _re.fullmatch(r"[0-9a-f]{12}", stale_tag):
            shutil.rmtree(d, ignore_errors=True)
    if os.path.isdir(base) and not os.path.isfile(os.path.join(base, "_SUCCESS")):
        # an earlier session crashed mid-write: the commit marker is
        # missing, so the files are untrustworthy — rewrite from source
        shutil.rmtree(base, ignore_errors=True)
    if os.path.isdir(base):
        # The content-addressed data survives from an earlier session —
        # re-REGISTER it (CREATE TABLE over the existing location keeps
        # the bucket spec; the bucketed writer's file naming carries the
        # bucket ids) instead of re-paying the write.  This is what
        # makes the layout once-per-fixture-GENERATION, not once per
        # SparkSession: a fresh driver/gate/bench session registers in
        # one footer read.
        schema = spark.read.parquet(base).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        keys = ", ".join(bucket_cols)
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
            f"INTO {n_buckets} BUCKETS LOCATION '{base}'"
        )
        return spark.table(name)
    write_bucketed_table(
        spark.read.parquet(src),
        name,
        base,
        list(bucket_cols),
        n_buckets,
        sort_cols=list(bucket_cols),
    )
    return spark.table(name)
