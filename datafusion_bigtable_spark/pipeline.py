"""End-to-end training-corpus build: one callable from raw JSONL feed to
training shards on disk.

No reference analogue (the reference is a query connector,
src/lib.rs) — this is the integration the LLM-pipeline tier exists
for, composing only operators that are individually oracle-verified
in queries.py:

    ingest (sources/jsonl)           explicit schema, corrupt quarantine
      → curate (functions/text)      scan-fused keep/drop verdict
      → exact dedup (operators/dedup)   min-id winner per content hash
      → near-dup dedup (LSH → CC)    min-id canonical per cluster
      → leakage-safe split           cluster-atomic train/valid/test
      → shard write (sources/shards) size-governed parquet + manifest

Scale shape: the stages add up to the audited plans of their operators
— two shingle/minhash shuffles (LSH), the CC fixpoint rounds, one
broadcast keep-join, one shard-column shuffle at the write.  Nothing
collects to the driver except CC's bounded iteration counters.

Returns a small summary DataFrame (per split × shard row counts) so
callers can assert the build without re-reading the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_training_corpus(
    spark: SparkSession,
    feed_path: str,
    out_path: str,
    n_shards: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    k: int = 3,
    max_records_per_file: int = 100_000,
) -> DataFrame:
    """Raw JSONL feed → curated, deduplicated, leakage-safely split,
    shard-partitioned training corpus at ``out_path``.  See module doc
    for the stage plan.  Returns (split, shard_id, n_docs)."""
    from datafusion_bigtable_spark.functions.text import curation_reason
    from datafusion_bigtable_spark.operators.dedup import exact_dedup, lsh_candidate_pairs
    from datafusion_bigtable_spark.operators.graph import connected_components
    from datafusion_bigtable_spark.sources.jsonl import read_documents_jsonl, split_corrupt
    from datafusion_bigtable_spark.sources.shards import write_training_shards

    clean, _quarantine = split_corrupt(read_documents_jsonl(spark, feed_path))
    kept = clean.filter(curation_reason(F.col("text")) == "keep")
    kept = exact_dedup(kept)

    pairs = lsh_candidate_pairs(kept, bands=bands, rows_per_band=rows_per_band, k=k)
    comp = connected_components(pairs)
    labeled = kept.join(
        comp.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn("component", F.coalesce(F.col("component"), F.col("doc_id")))
    # near-dup canonical: keep the min doc_id of each cluster (the
    # min-label CC component IS that id, so the filter is row-local)
    canonical = labeled.filter(F.col("doc_id") == F.col("component"))

    split_h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split|"), F.col("component").cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    shard_h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")
    final = canonical.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.when(split_h < 80, "train").when(split_h < 90, "valid").otherwise("test").alias("split"),
        shard_h.alias("shard_id"),
    )
    for split in ("train", "valid", "test"):
        write_training_shards(
            final.filter(F.col("split") == split).drop("split"),
            f"{out_path}/{split}",
            max_records_per_file=max_records_per_file,
        )
    return (
        final.groupBy("split", "shard_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "shard_id")
    )


def build_embedding_store(
    spark: SparkSession,
    embeddings: DataFrame,
    out_path: str,
    dup_threshold: float = 0.95,
    target_block_size: int | None = 2000,
    n_shards: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The embedding-side build: near-dup prune (SemDeDup-style,
    IVF-cell-blocked pairs → min-id canonical) → shard-partitioned
    vector store at ``out_path/vectors`` → searchable IVF index saved
    cell-partitioned at ``out_path/ivf`` (built from the SURVIVORS, so
    a later :func:`~datafusion_bigtable_spark.operators.similarity.
    load_ivf_index` + ``topk_ivf`` never returns a pruned duplicate).

    Scale shape: one IVF assignment pass for the dedup (cell-blocked
    pairs, corpus-relative ``target_block_size`` keeps block cost flat),
    one anti-join against the (small) dropped-id set, one more
    assignment pass for the survivors' index, one shard shuffle at the
    write.  Returns (shard_id, n_vectors).
    """
    from datafusion_bigtable_spark.operators.dedup import embedding_dup_pairs_ivf
    from datafusion_bigtable_spark.operators.similarity import build_ivf_index, save_ivf_index
    from datafusion_bigtable_spark.sources.shards import write_training_shards

    pairs = embedding_dup_pairs_ivf(
        embeddings,
        threshold=dup_threshold,
        target_block_size=target_block_size,
        id_col=id_col,
        vec_col=vec_col,
    )
    # min-id canonical: the HIGHER id of every near-dup pair is dropped
    # (id_a < id_b by construction, so id_b is always the loser)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = embeddings.join(dropped, id_col, "left_anti")

    shard_h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("vshard|"), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")
    write_training_shards(
        survivors.withColumn("shard_id", shard_h), f"{out_path}/vectors"
    )
    if target_block_size:
        # corpus-relative cell count, same derivation as the dedup stage;
        # the survivor count comes from the shard manifest the write just
        # produced (footer truth, driver-side) instead of a second full
        # count action over the survivors frame (r18, guide §1.2)
        from datafusion_bigtable_spark.sources.layout import shard_file_stats

        n_survivors = sum(
            st["rows"] for st in shard_file_stats(f"{out_path}/vectors").values()
        )
        n_cells = max(2, -(-n_survivors // target_block_size))
    else:
        n_cells = 16
    with build_ivf_index(survivors, n_cells, id_col=id_col, vec_col=vec_col) as idx:
        save_ivf_index(idx, f"{out_path}/ivf")
    return (
        spark.read.parquet(f"{out_path}/vectors")
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("shard_id")
    )
