"""Skew handling for hot entity keys.

At 10^12 rows a handful of entities (spam accounts, default ids) can
hold a large fraction of the corpus; a hash shuffle on the entity key
then sends one partition a disproportionate share.  Two complementary
tools:

* **AQE skew-join splitting** — free, enable
  ``spark.sql.adaptive.skewJoin.enabled`` (on by default in the bench
  session); handles skewed *joins* but not skewed *window* clustering.
* **Explicit salting** (this module) — for aggregations and equi-joins
  on a skewed key: the fact side gets ``salt = pmod(xxhash64(...), S)``
  and the dimension side is exploded ``S`` ways, so the hot key spreads
  over ``S`` tasks.

Note the as-of join / entity windows CANNOT be salted blindly — their
correctness needs the whole entity timeline in one sorted partition.
For those, the mitigation is bounding the timeline per (entity,
coarse-time-bucket): see :func:`bucketed_entity_key`, which composes
with the windows/asof operators by using the composite as the entity
key (correct whenever the operator's reach — lag depth, rolling window,
as-of staleness tolerance — is shorter than the bucket length).
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, key_cols: Sequence[str], n_salts: int,
              salt_col: str = "__salt",
              deterministic_by: Optional[str] = None) -> DataFrame:
    """Fact-side salt in ``[0, n_salts)``.  With ``deterministic_by``
    set (a unique column), the salt is a stable hash of that column —
    reproducible across retries/resumes; otherwise a uniform random."""
    if deterministic_by is not None:
        salt = F.pmod(F.xxhash64(deterministic_by), F.lit(n_salts))
    else:
        salt = (F.rand(seed=0) * n_salts).cast("long")
    return df.withColumn(salt_col, salt)


def explode_salt(dim: DataFrame, n_salts: int,
                 salt_col: str = "__salt") -> DataFrame:
    """Dimension-side replication: one copy per salt value."""
    # generators cannot be nested inside other expressions (e.g. a
    # cast), so build the sequence as long and explode it bare
    salts = F.explode(F.sequence(F.lit(0).cast("long"),
                                 F.lit(n_salts - 1).cast("long")))
    return dim.withColumn(salt_col, salts)


def salted_join(fact: DataFrame, dim: DataFrame, on: Sequence[str],
                n_salts: int, how: str = "inner",
                deterministic_by: Optional[str] = None) -> DataFrame:
    """Equi-join where ``fact`` is skewed on ``on``: join on
    ``on + [salt]`` after salting/exploding, so each hot key spreads
    over ``n_salts`` tasks.  Use only when AQE's skew-join split is not
    applicable (e.g. the dim side is too big to broadcast but small
    enough to replicate ``n_salts`` times)."""
    f = with_salt(fact, on, n_salts, deterministic_by=deterministic_by)
    d = explode_salt(dim, n_salts)
    out = f.join(d, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(df: DataFrame, key_cols: Sequence[str], exprs,
                     n_salts: int) -> DataFrame:
    """Two-phase aggregation for skewed groupBy keys: partial aggregate
    on ``key + salt`` then final on ``key``.  ``exprs`` is a dict
    ``out_col -> (partial_fn, final_fn, in_col)`` where the pair must
    compose associatively (sum/sum, count/sum, min/min, max/max)."""
    salted = with_salt(df, key_cols, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(*[
        pfn(c).alias(f"__p_{out}") for out, (pfn, _, c) in exprs.items()
    ])
    return partial.groupBy(*key_cols).agg(*[
        ffn(f"__p_{out}").alias(out) for out, (_, ffn, _) in exprs.items()
    ])


def bucketed_entity_key(df: DataFrame, entity_col: str, ts_col: str,
                        bucket_days: int = 7,
                        out_col: str = "__entity_bucket") -> DataFrame:
    """Composite clustering key ``(entity, time-bucket)`` that bounds
    per-partition timeline length for hot entities.  Window/as-of
    operators keyed on this are exact as long as their temporal reach
    is below ``bucket_days`` (enforce with a tolerance)."""
    bucket = F.floor(F.col(ts_col).cast("timestamp").cast("double")
                     / F.lit(bucket_days * 86400.0))
    return df.withColumn(
        out_col, F.concat_ws("#", F.col(entity_col), bucket.cast("string")))
