"""JSONL ingestion contract (sources/jsonl.py): schema-enforced read,
corrupt-record quarantine accounting, and round-trip fidelity for
arbitrary document text (embedded newlines/quotes/unicode)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from datafusion_bigtable_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENTS_SCHEMA,
    read_documents_jsonl,
    split_corrupt,
    write_jsonl,
)


def test_quarantine_accounting(spark, sf_dir, tmp_path):
    # 5 valid docs + 2 invalid lines: clean + quarantined == input lines,
    # nothing dropped, nothing fatal.
    p = tmp_path / "feed"
    os.makedirs(p)
    with open(p / "part-0.jsonl", "w") as f:
        for i in range(5):
            f.write('{"doc_id": %d, "text": "doc %d", "lang": "en", "source": "s", "n_chars": 5}\n' % (i, i))
        f.write("{broken json\n")
        f.write("plain text, not json\n")
    raw = read_documents_jsonl(spark, str(p))
    clean, quarantine = split_corrupt(raw)
    assert clean.count() == 5
    assert quarantine.count() == 2
    assert raw.count() == 7
    # quarantine preserves the raw offending line for inspection
    bad = {r[CORRUPT_COL] for r in quarantine.collect()}
    assert "{broken json" in bad and "plain text, not json" in bad
    # schema is enforced, not inferred
    assert [f.name for f in clean.schema.fields] == [f.name for f in DOCUMENTS_SCHEMA.fields]
    assert dict(clean.dtypes)["doc_id"] == "bigint"


def test_roundtrip_hostile_text(spark, tmp_path):
    # Embedded newlines, quotes, backslashes, unicode: the JSON writer
    # escapes them so one physical line stays one record — the invariant
    # that keeps a 1 TB file splittable.
    rows = [
        (1, 'line one\nline two\r\n"quoted"', "en", "s", 0),
        (2, "backslash \\ and tab\t and emoji \U0001f600", "en", "s", 0),
        (3, "", "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    out = str(tmp_path / "out")
    write_jsonl(df, out, partitions=2)
    # one line per record on disk
    n_lines = sum(
        sum(1 for _ in open(f)) for f in glob.glob(f"{out}/part-*") if os.path.getsize(f)
    )
    assert n_lines == 3
    back, quarantine = split_corrupt(read_documents_jsonl(spark, out))
    assert quarantine.count() == 0
    orig = {tuple(r) for r in df.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig


def test_gzip_jsonl_reads_transparently(spark, tmp_path):
    # .jsonl.gz decompresses transparently through the text reader (the
    # common crawl-delivery format).  Caveat pinned here: one gz file is
    # ONE partition (gzip is not splittable) — at scale you want many
    # moderate .gz shards or a seekable codec, never one giant file.
    import gzip
    import os

    p = tmp_path / "feed"
    os.makedirs(p)
    with gzip.open(p / "part-0.jsonl.gz", "wt") as f:
        for i in range(4):
            f.write('{"doc_id": %d, "text": "zipped doc %d", "lang": "en", "source": "s", "n_chars": 1}\n' % (i, i))
        f.write("corrupt line\n")
    raw = read_documents_jsonl(spark, str(p))
    clean, quarantine = split_corrupt(raw)
    assert clean.count() == 4 and quarantine.count() == 1
    assert raw.rdd.getNumPartitions() == 1  # the non-splittability caveat, pinned


def test_streaming_ingest_equals_batch_and_is_incremental(spark, tmp_path):
    """The streaming file-source twin: (1) stream result == batch read
    row-for-row including quarantine; (2) a second availableNow run on
    the same checkpoint processes ONLY files that landed in between —
    exactly-once per file, the property a continuously-landing crawl
    feed needs."""
    import os

    from datafusion_bigtable_spark.sources.jsonl import read_documents_jsonl_stream

    feed = tmp_path / "feed"
    os.makedirs(feed)
    line = '{"doc_id": %d, "text": "doc %d", "lang": "en", "source": "s", "n_chars": 5}\n'
    with open(feed / "a.jsonl", "w") as f:
        for i in range(3):
            f.write(line % (i, i))
        f.write("broken\n")

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            read_documents_jsonl_stream(spark, str(feed))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    first = run_once()
    batch = read_documents_jsonl(spark, str(feed))
    key = lambda rows: sorted(tuple(str(v) for v in r) for r in rows)
    assert key(first.collect()) == key(batch.collect())
    assert first.filter(F.col(CORRUPT_COL).isNotNull()).count() == 1

    with open(feed / "b.jsonl", "w") as f:
        f.write(line % (100, 100))
    second = run_once()
    # same checkpoint -> exactly the NEW file's single row appended
    assert second.count() == first.count() + 1
    assert second.filter(F.col("doc_id") == 100).count() == 1


def test_registered_query_matches_oracle(spark, sf_dir):
    from datafusion_bigtable_spark.queries import REGISTRY, _documents_jsonl_fixture
    from tests.oracle_harness import compare, duck_connection

    spec = REGISTRY["ingest_jsonl_documents"]
    compare(spec.fn(spark, sf_dir), duck_connection(sf_dir), spec.sql)
    # and the injected corrupt lines really are quarantined, not leaked
    from datafusion_bigtable_spark.sources.jsonl import read_documents_jsonl, split_corrupt

    _, quarantine = split_corrupt(read_documents_jsonl(spark, _documents_jsonl_fixture(sf_dir)))
    assert quarantine.count() == 3
