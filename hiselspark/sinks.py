"""Training-shard sink: deterministic, content-keyed, size-bounded.

A training-data pipeline's last stage writes the curated corpus as
SHARDS the trainer streams: (a) shard assignment must be deterministic
and layout-independent (re-running the pipeline, or running it on a
different cluster size, must produce the same shard for every row —
else downstream caches and resume logic break); (b) duplicate texts
should land in the SAME shard (shard-local dedup and inspection stay
cheap); (c) file sizes must be bounded (one giant file serializes the
trainer's input workers).

``write_training_shards`` assigns ``shard = content_hash(text) %
n_shards`` (the same cross-engine polynomial hash as
``operators.splits`` — a pure JVM integer expression), repartitions by
shard (ONE shuffle), writes ``partitionBy(shard)`` parquet with
``maxRecordsPerFile`` bounding file size, and returns a per-shard
manifest (row counts) for lineage.  The full write -> read-back round
trip is oracle-checked in the driver gate: DuckDB recomputes every
row's shard arithmetically and must reproduce the per-shard counts.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.splits import content_hash


def write_training_shards(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    n_shards: int = 16,
    salt: int = 0,
    max_records_per_file: Optional[int] = None,
    shard_col: str = "shard",
) -> DataFrame:
    """Write ``df`` as content-sharded parquet under ``path`` and
    return the per-shard manifest (shard, n_rows).  One shuffle
    (repartition on the shard key) so each shard is written by one
    task as few, contiguous files."""
    sharded = df.withColumn(
        shard_col, (content_hash(text_col, salt) % n_shards).cast("int"))
    w = (sharded.repartition(n_shards, shard_col)
         .write.mode("overwrite").partitionBy(shard_col))
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)
    # lineage manifest from the WRITTEN files, not the source plan: a
    # second source scan would double the input cost at corpus scale,
    # and a re-evaluation-unstable source (table being appended to)
    # would make the manifest disagree with the files on disk.  The
    # count scan reads only parquet metadata (count-star pushdown).
    spark = df.sparkSession
    manifest = (spark.read.parquet(path).groupBy(shard_col)
                .agg(F.count("*").alias("n_rows")))
    return manifest


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read the sharded corpus back; the shard partition column is
    recovered from the directory layout."""
    return spark.read.parquet(path)
