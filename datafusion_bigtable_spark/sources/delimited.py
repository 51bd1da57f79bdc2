"""CSV corpus ingestion — the other common delivery format at the
pipeline boundary (annotation exports, metadata sidecars, tabular
crawls).  Same contract as :mod:`.jsonl`: explicit schema (never an
inference pass), PERMISSIVE corrupt-record quarantine with exact
accounting, one text scan.

No reference analogue (the reference reads Bigtable rows,
src/datasource.rs); LLM-pipeline ingestion tier.

Same text+from_csv construction as jsonl's text+from_json, for the
same reason: the native CSV source refuses plans that read only the
internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
quarantine ``count()`` prunes to exactly that.  One honest caveat the
JSONL twin does not have: a CSV record may legally contain EMBEDDED
NEWLINES inside quoted fields (``multiLine``), which a line-based scan
cannot reassemble — this reader is for one-line-one-record CSV, the
only kind that splits across executors anyway (multiLine CSV is
single-partition by construction, the non-splittable trap).  Writers
that need newlines in fields should JSON-escape (use JSONL) rather
than quote-wrap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from datafusion_bigtable_spark.sources.jsonl import CORRUPT_COL, DOCUMENTS_SCHEMA

__all__ = ["read_documents_csv", "write_csv", "split_corrupt"]

# re-exported so both ingestion modules present one quarantine API
from datafusion_bigtable_spark.sources.jsonl import split_corrupt  # noqa: E402


def _ddl_with_corrupt(schema: StructType) -> str:
    full = StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])
    return full.simpleString()[len("struct<") : -1].replace(":", " ")


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_SCHEMA,
    header: bool = False,
) -> DataFrame:
    """Schema-enforced PERMISSIVE one-line-one-record CSV read with the
    corrupt-record column appended; use :func:`split_corrupt`.

    ``header=True`` drops each file's FIRST non-blank line when it
    matches the schema's column-name row — the standard per-file header
    convention (each shard carries its own header).  POSITION-AWARE
    (ADVICE r11 #4): a data row mid-file that coincidentally serializes
    to the header string is kept, where a pure value match silently
    lost it.  DETERMINISTIC (ADVICE r12): the previous implementation
    matched rows by joining two independent recomputations of
    ``monotonically_increasing_id`` — a flagged-nondeterministic
    expression whose agreement across subplans is an accident of
    partition layout, not a contract.  Now position is established
    locally: within a task, the text source yields a file split's lines
    in file order, so the first row of each ``(file, block_start=0)``
    run IS the file's first line — one Arrow pass, no ids, no join, no
    shuffle, O(1) state per task.  Blank lines are filtered BEFORE
    header detection so a leading blank does not shift the match (the
    second ADVICE r12 defect).  A headerless shard (first line is data)
    keeps its first line, because it fails the value match.  Cost note:
    ``header=True`` routes the scan through one Arrow-batched Python
    pass; the default ``header=False`` plan stays entirely JVM-side."""
    lines = spark.read.text(str(path))
    if header:
        header_line = ",".join(f.name for f in schema.fields)
        lines = lines.select(
            "value",
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.file_block_start").alias("_bs"),
        ).filter(F.length("value") > 0)

        def _drop_file_headers(batches):
            import pyarrow as pa
            import pyarrow.compute as pc

            carry_fp, carry_bs = None, None  # last row of the previous batch
            for batch in batches:
                n = batch.num_rows
                if n == 0:
                    continue
                val = batch.column(batch.schema.get_field_index("value"))
                fp = batch.column(batch.schema.get_field_index("_fp"))
                bs = batch.column(batch.schema.get_field_index("_bs"))
                prev_fp = pa.concat_arrays(
                    [pa.array([carry_fp], type=fp.type), fp.slice(0, n - 1)]
                )
                prev_bs = pa.concat_arrays(
                    [pa.array([carry_bs], type=bs.type), bs.slice(0, n - 1)]
                )
                # First row of a (file, block) run; null compares (the
                # partition's very first row) count as a run start.  The
                # block is part of the key so a same-file later split
                # packed immediately before block 0 cannot mask it.
                run_start = pc.or_kleene(
                    pc.fill_null(pc.not_equal(fp, prev_fp), True),
                    pc.fill_null(pc.not_equal(bs, prev_bs), True),
                )
                drop = pc.and_(
                    run_start,
                    pc.and_(
                        pc.equal(bs, 0),
                        pc.fill_null(pc.equal(val, header_line), False),
                    ),
                )
                yield pa.record_batch(
                    [val.filter(pc.invert(drop))], names=["value"]
                )
                carry_fp, carry_bs = fp[n - 1].as_py(), bs[n - 1].as_py()

        lines = lines.mapInArrow(_drop_file_headers, "value string")
    lines = lines.filter(F.length("value") > 0)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    parsed = lines.select(F.from_csv("value", _ddl_with_corrupt(schema), opts).alias("c"))
    return parsed.select("c.*")


def write_csv(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write one-line-one-record CSV (quoted fields; the reader above
    cannot reassemble embedded newlines — fail loud rather than emit
    records a line-based scan would silently corrupt)."""
    for field in df.schema.fields:
        if field.dataType.simpleString() == "string":
            bad = df.filter(F.col(field.name).contains("\n") | F.col(field.name).contains("\r"))
            if bad.limit(1).count() > 0:
                raise ValueError(
                    f"column {field.name!r} contains embedded newlines — "
                    "quoted-multiline CSV breaks line-based splitting; use JSONL"
                )
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").csv(path)
