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
