"""Bucketed (pre-shuffled) table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides.  Bucketing pays that shuffle ONCE at write time: rows are hash-
partitioned into a fixed number of buckets on the join key and each
bucket is written sorted, so every later join or aggregation on that
key reads co-located, pre-sorted buckets and skips the exchange
entirely (Spark's bucketed scan reports the hash partitioning to
Catalyst; the SortMergeJoin shows NO Exchange on a bucketed side).

This module is a thin, explicit wrapper over the public
``DataFrameWriter.bucketBy`` API so the engine's jobs declare their
bucketed layouts in one place; the plan property (zero shuffles for a
same-key bucketed join) is asserted in ``tests/test_plans.py``.

Production notes:
* both sides must share the bucket count (or be integer multiples,
  with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
* bucket count is a layout decision: at 10^12 rows pick buckets so one
  bucket ~ one task's worth of data (e.g. 2^13-2^15), never so few
  that a bucket exceeds executor memory;
* bucketed tables live in the session catalog; ``path`` makes the
  storage external so the parquet survives the catalog.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int, sort_cols: Optional[Sequence[str]] = None,
                   path: Optional[str] = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed parquet table: hash-partitioned into
    ``n_buckets`` on ``bucket_cols``, each bucket sorted by
    ``sort_cols`` (defaults to the bucket columns — sorted buckets let
    SortMergeJoin skip its sort too)."""
    sort_cols = list(sort_cols) if sort_cols else list(bucket_cols)
    w = (df.write.format("parquet").mode(mode)
         .bucketBy(n_buckets, *bucket_cols)
         .sortBy(*sort_cols))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def ensure_bucketed(spark: SparkSession, table: str, build,
                    bucket_cols: Sequence[str], n_buckets: int,
                    sort_cols: Optional[Sequence[str]] = None,
                    path: Optional[str] = None) -> DataFrame:
    """Idempotent layout staging: build + write the bucketed table only
    if the catalog doesn't have it yet, then return the bucketed scan.
    ``build`` is a zero-arg callable producing the DataFrame to stage."""
    if not spark.catalog.tableExists(table):
        write_bucketed(build(), table, bucket_cols, n_buckets,
                       sort_cols=sort_cols, path=path)
    return spark.table(table)
