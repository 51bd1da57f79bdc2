"""CSV ingestion contract (sources/delimited.py): the jsonl twin's
quarantine accounting and round-trip guarantees, plus the two
CSV-specific pins — per-file header dropping and the fail-loud embedded
newline guard."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datafusion_bigtable_spark.sources.delimited import (
    read_documents_csv,
    split_corrupt,
    write_csv,
)
from datafusion_bigtable_spark.sources.jsonl import CORRUPT_COL, DOCUMENTS_SCHEMA


def test_csv_quarantine_accounting(spark, tmp_path):
    p = tmp_path / "feed"
    os.makedirs(p)
    with open(p / "part-0.csv", "w") as f:
        for i in range(5):
            f.write('%d,"doc %d, with comma",en,s,5\n' % (i, i))
        f.write('x,"unterminated quote,en,s,notanint\n')
    raw = read_documents_csv(spark, str(p))
    clean, quarantine = split_corrupt(raw)
    assert clean.count() == 5 and quarantine.count() == 1 and raw.count() == 6
    got = {(r.doc_id, r.text) for r in clean.collect()}
    assert (3, "doc 3, with comma") in got  # quoted comma survives
    assert dict(clean.dtypes)["doc_id"] == "bigint"  # schema enforced, not inferred


def test_csv_header_dropped_per_file(spark, tmp_path):
    p = tmp_path / "feed"
    os.makedirs(p)
    header = ",".join(f.name for f in DOCUMENTS_SCHEMA.fields)
    for i in range(2):  # every shard carries its own header line
        with open(p / f"part-{i}.csv", "w") as f:
            f.write(header + "\n")
            f.write(f"{i},body,en,s,4\n")
    clean, quarantine = split_corrupt(read_documents_csv(spark, str(p), header=True))
    assert clean.count() == 2 and quarantine.count() == 0


def test_csv_roundtrip_and_newline_guard(spark, tmp_path):
    rows = [(1, 'quoted "text", commas, and unicode é', "en", "s", 0),
            (2, "", "en", "s", 0)]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    out = str(tmp_path / "out")
    write_csv(df, out, partitions=1)
    back, quarantine = split_corrupt(read_documents_csv(spark, out))
    assert quarantine.count() == 0
    got = {(r.doc_id, r.text) for r in back.collect()}
    # empty string round-trips as null through CSV (format limitation,
    # shared by every CSV reader) — normalize for the compare
    assert {(i, t if t else None) for i, t, *_ in rows} == {(d, t) for d, t in got}
    # embedded newline must FAIL LOUD, never emit split-corrupting rows
    import pytest

    bad = spark.createDataFrame([(3, "line1\nline2", "en", "s", 0)], DOCUMENTS_SCHEMA)
    with pytest.raises(ValueError, match="embedded newline"):
        write_csv(bad, str(tmp_path / "bad"))


def test_header_drop_is_position_aware(spark, tmp_path):
    """ADVICE r11 #4: only each file's FIRST line may be dropped as a
    header — a mid-file data row that serializes to the header string
    must survive, and a headerless shard keeps its first line."""
    from datafusion_bigtable_spark.sources.delimited import read_documents_csv
    from datafusion_bigtable_spark.sources.jsonl import DOCUMENTS_SCHEMA

    hdr = ",".join(f.name for f in DOCUMENTS_SCHEMA.fields)
    d = tmp_path / "csv"
    d.mkdir()
    # file A: header + a data row that EQUALS the header string + normal row
    (d / "a.csv").write_text(f"{hdr}\n{hdr}\n1,alpha text,en,0.5,11\n")
    # file B: headerless shard — first line is data and must be kept
    (d / "b.csv").write_text("2,beta text,de,0.7,12\n3,gamma,fr,0.9,13\n")
    out = read_documents_csv(spark, str(d), header=True)
    rows = out.collect()
    assert len(rows) == 4  # 1 header dropped; header-valued data row kept
    # the header-string data row parses with text = the second column
    # name ("text") and a NULL doc_id — present, not silently lost
    texts = {r["text"] for r in rows if r["text"] is not None}
    assert {"alpha text", "beta text", "gamma"} <= texts


def test_header_drop_survives_leading_blank_line(spark, tmp_path):
    """ADVICE r12: a file whose first PHYSICAL line is blank still has
    its header (the first non-blank line) dropped — blank filtering
    happens before header detection, not after."""
    from datafusion_bigtable_spark.sources.jsonl import DOCUMENTS_SCHEMA

    hdr = ",".join(f.name for f in DOCUMENTS_SCHEMA.fields)
    d = tmp_path / "csv"
    d.mkdir()
    (d / "a.csv").write_text(f"\n{hdr}\n1,alpha,en,s,5\n")
    (d / "b.csv").write_text(f"{hdr}\n2,beta,de,s,6\n")
    out = read_documents_csv(spark, str(d), header=True)
    rows = out.collect()
    assert len(rows) == 2
    assert {r["text"] for r in rows} == {"alpha", "beta"}
