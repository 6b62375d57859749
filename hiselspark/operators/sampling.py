"""Deterministic, content-keyed sampling for corpus curation.

Training pipelines need REPRODUCIBLE subsets: re-running the job — on
any cluster size, any partition layout — must pick the same rows, or
ablation studies and resume logic are garbage.  Row-random sampling
(``df.sample``) is layout-dependent; these operators key every
decision on the same cross-engine polynomial content hash as
:mod:`hiselspark.operators.splits`, so the DuckDB gate oracle
recomputes membership row by row.

* :func:`hash_sample` — Bernoulli-style ``frac`` sampling: keep a row
  iff ``content_hash(text, salt) % DENOM < frac * DENOM``.  Map-only,
  no shuffle; duplicates are kept or dropped together (content-keyed),
  and disjoint salts give independent samples.
* :func:`quota_sample` — per-group cap (the "at most K documents per
  domain" balancing rule of public corpus recipes): keep the ``cap``
  rows with the smallest ``(content_hash, id)`` priority per group.
  Skew-safe two-level plan: a pre-rank keyed on
  ``(group, input-partition-id)`` cuts each (partition × group) to
  ``cap`` candidates — that shuffle fans a hot group out over P
  reducer keys instead of serializing it through one, and provably
  retains every global winner — then the real ``row_number`` shuffles
  only the survivors (at most ``cap × P`` per group, never the whole
  hot group).  The pre-rank keys are layout-dependent; the OUTPUT is
  layout-independent because the ``(content_hash, id)`` priority is a
  total order.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .splits import content_hash

_DENOM = 1_000_000


def hash_sample(df: DataFrame, frac: float, text_col: str = "text",
                salt: int = 0) -> DataFrame:
    """Deterministic ``frac`` sample keyed on text content."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    thresh = int(round(frac * _DENOM))
    return df.where(
        (content_hash(text_col, salt) % _DENOM) < thresh)


def quota_sample(df: DataFrame, group_col: str, cap: int,
                 text_col: str = "text", id_col: str = "doc_id",
                 salt: int = 0) -> DataFrame:
    """At most ``cap`` rows per group, deterministically chosen by
    ``(content_hash(text), id)`` priority.  Output columns = input
    columns (no rank leaked)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    pri = df.withColumn(
        "__pri", content_hash(text_col, salt)).withColumn(
        "__pid", F.spark_partition_id())
    order = [F.col("__pri"), F.col(id_col)]
    # level 1: local cut — keeps all global winners by construction
    local = Window.partitionBy(group_col, "__pid").orderBy(*order)
    survivors = (pri.withColumn("__lr", F.row_number().over(local))
                 .where(F.col("__lr") <= cap))
    # level 2: global rank over the bounded survivor set
    final = Window.partitionBy(group_col).orderBy(*order)
    return (survivors.withColumn("__r", F.row_number().over(final))
            .where(F.col("__r") <= cap)
            .drop("__pri", "__pid", "__lr", "__r"))
