"""JSONL corpus ingestion — the LLM-pipeline interchange format.

No reference analogue (the reference reads Bigtable rows,
src/datasource.rs); this is the ingestion boundary a training pipeline
needs in front of everything in ``operators/``: crawl dumps, API
exports, and annotation deliveries arrive as JSON Lines, one document
object per line.

Scale posture, in order of importance at 100 TB:

1. **Explicit schema, never inference.**  ``spark.read.json`` without a
   schema runs a full extra pass over every byte just to infer types —
   a 2× read before the pipeline starts.  ``read_documents_jsonl``
   requires the schema (the module exports the canonical one).
2. **PERMISSIVE + corrupt-record quarantine.**  A malformed line in a
   100 TB feed must not kill the job (FAILFAST) nor silently vanish
   (DROPMALFORMED).  PERMISSIVE parks the raw line in
   ``_corrupt_record`` with every typed column null; ``split_corrupt``
   separates the clean frame from the quarantine frame so bad input is
   COUNTED and inspectable — the ingest contract is
   ``clean + quarantined == input lines``.
3. **Line-splittable parallelism.**  Uncompressed (or bzip2/zstd
   -seekable) JSONL splits on newlines, so a single 1 TB file still
   fans out across executors; Spark handles the split containment of
   quoted newlines because the JSON writer escapes them (``\\n`` inside
   strings) — one physical line IS one record, which is also why
   ``write_jsonl`` is safe for any text content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write ``df`` as JSON Lines.  Newlines/quotes inside string
    columns are JSON-escaped by the writer, preserving the
    one-line-one-record invariant for arbitrary document text."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Schema-enforced PERMISSIVE JSONL read with a corrupt-record
    column appended — no inference pass, malformed lines quarantined
    not fatal.  Returns the raw frame; use ``split_corrupt``.

    Implementation is ``read.text`` + ``from_json`` (same JacksonParser
    as the native JSON source) rather than ``read.json``: the native
    source refuses any plan whose scan reads only the internal
    corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — which is
    exactly what quarantine ``count()`` prunes down to), and its
    documented ``cache()`` workaround is a non-starter at 100 TB.  The
    text+from_json form has no such restriction and still gives clean +
    quarantine in ONE scan.  Blank lines are skipped to match native
    JSONL semantics."""
    full = StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])
    lines = spark.read.text(str(path)).filter(F.length("value") > 0)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    return lines.select(F.from_json("value", full, opts).alias("j")).select("j.*")


def read_documents_jsonl_stream(
    spark: SparkSession, path: str, schema: StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """The STREAMING twin of :func:`read_documents_jsonl` — a crawl feed
    landing JSONL files in a directory is the canonical Structured
    Streaming file source.  Identical parse (same from_json options, so
    stream == batch row-for-row, quarantine included); new files are
    picked up per micro-batch and each file is processed exactly once
    per checkpoint.  Schema is mandatory here not just for the 2×-read
    reason: a streaming source cannot infer at all."""
    full = StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])
    lines = spark.readStream.text(str(path)).filter(F.length("value") > 0)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    return lines.select(F.from_json("value", full, opts).alias("j")).select("j.*")


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean drops the corrupt column; quarantine
    keeps the full row (typed columns are null, the raw offending line
    sits in the corrupt column).  Spark parks the unparsed line in the
    corrupt column and nulls the typed columns, so the predicate is a
    simple null check — no second parse.  Quarantine deliberately keeps
    a typed column in scope: Spark refuses plans that read ONLY the
    internal corrupt-record column from a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    documented cache() workaround is exactly wrong at 100 TB."""
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantine
