"""Training-shard sink contract (sources/shards.py): layout, file-size
governance, manifest fidelity, shard-pruned reads, idempotent rewrite."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from datafusion_bigtable_spark.sources.shards import (
    read_shard_manifest,
    read_training_shards,
    write_training_shards,
)


def _corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "shard_id",
            (
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
                % 4
            ).cast("int"),
        )
    )


def test_layout_manifest_and_file_cap(spark, sf_dir, tmp_path):
    path = str(tmp_path / "shards")
    df = _corpus(spark, sf_dir)
    write_training_shards(df, path, max_records_per_file=50)
    # one directory per shard
    dirs = sorted(os.path.basename(d) for d in glob.glob(f"{path}/shard_id=*"))
    assert len(dirs) == 4
    # file cap respected: every file holds <= 50 rows
    back = spark.read.parquet(path)
    per_file = back.groupBy(F.input_file_name()).count().collect()
    assert per_file and all(r["count"] <= 50 for r in per_file)
    # manifest == data, via ONE small read
    m = {r.shard_id: (r.n_rows, r.n_files) for r in read_shard_manifest(spark, path).collect()}
    truth = {r.shard_id: r["count"] for r in df.groupBy("shard_id").count().collect()}
    assert {k: v[0] for k, v in m.items()} == truth
    assert all(v[1] >= (v[0] + 49) // 50 for v in m.values())
    # full read-back is exactly the corpus (manifest dir is invisible)
    assert back.count() == df.count()


def test_shard_pruned_read(spark, sf_dir, tmp_path):
    path = str(tmp_path / "shards")
    df = _corpus(spark, sf_dir)
    write_training_shards(df, path, max_records_per_file=1000)
    one = read_training_shards(spark, path, shards=[2])
    assert one.count() == df.filter("shard_id = 2").count()
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "shard_id" in plan.split("PartitionFilters")[1][:120]


def test_rewrite_idempotent(spark, sf_dir, tmp_path):
    path = str(tmp_path / "shards")
    df = _corpus(spark, sf_dir)
    write_training_shards(df, path, max_records_per_file=200)
    first = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    write_training_shards(df, path, max_records_per_file=200)
    second = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert first == second
