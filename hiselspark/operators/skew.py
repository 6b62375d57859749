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


def bloom_bitmap(keys: DataFrame, key_col: str, n_bits: int,
                 n_hashes: int = 3, seed: int = 71) -> DataFrame:
    """Build a Bloom-filter bitmap over ``keys[key_col]`` as a tiny
    (bucket, bits) table: ``n_bits`` must be a power of two; position
    ``pmod(xxhash64(key, seed+i), n_bits)`` sets one bit per hash.
    ``n_bits/64`` rows of one BIGINT each — a 10⁹-key side at 10
    bits/key is ~150 MB of bitmap, broadcastable where the raw key set
    is not.  One shuffle over (keys × n_hashes) integer rows."""
    if n_bits & (n_bits - 1) or n_bits < 64:
        raise ValueError(f"n_bits must be a power of two >= 64, got "
                         f"{n_bits}")
    probes = keys.select(
        F.explode(F.array(*[
            F.pmod(F.xxhash64(F.lit(seed + i), F.col(key_col)),
                   F.lit(n_bits))
            for i in range(n_hashes)])).alias("pos"))
    return (probes
            .select(F.expr("pos DIV 64").alias("bucket"),
                    F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")
                    .alias("m"))
            .groupBy("bucket")
            .agg(F.bit_or("m").alias("bits")))


def bloom_semi_join(big: DataFrame, small: DataFrame, key: str,
                    n_bits: int = 1 << 20, n_hashes: int = 3,
                    seed: int = 71) -> DataFrame:
    """Semi-join ``big`` to ``small`` on ``key`` with a Bloom-filter
    pre-filter — the classic runtime-filter plan for when the small
    side's KEY SET is too large to broadcast but its bitmap is not:

      1. build the bitmap (:func:`bloom_bitmap`, tiny);
      2. map-side prune ``big``: ``n_hashes`` broadcast joins on the
         bucket key test all bits — a Bloom filter has NO false
         negatives, so no true match is dropped (pytest-asserted);
      3. exact shuffle semi-join of the few survivors against
         ``small`` removes the false positives.

    The result is therefore EXACTLY ``big SEMI JOIN small`` (the gate
    oracle is that plain semi-join — hash-implementation-free), while
    the shuffle moves only ``|matches| + fp·|big|`` rows instead of
    ``|big|``.  At fp = (1−e^{−kn/m})^k ≈ 1% (10 bits/key, k=3) a
    0.1%-selective semi-join over 100 TB shuffles ~1% of the corpus.
    """
    bmp = bloom_bitmap(small, key, n_bits, n_hashes, seed)
    out = big
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.lit(seed + i), F.col(key)),
                     F.lit(n_bits))
        b = bmp.select(F.col("bucket").alias(f"_bk{i}"),
                       F.col("bits").alias(f"_bits{i}"))
        out = (out.withColumn(f"_p{i}", pos)
                  .withColumn(f"_bk{i}", F.expr(f"_p{i} DIV 64"))
                  .withColumn(f"_m{i}",
                              F.expr(f"shiftleft(1L, "
                                     f"CAST(_p{i} % 64 AS INT))"))
                  .drop(f"_p{i}")
                  .join(F.broadcast(b), f"_bk{i}", "left")
                  .filter(F.col(f"_bits{i}").isNotNull()
                          & (F.col(f"_bits{i}")
                             .bitwiseAND(F.col(f"_m{i}")) != 0))
                  .drop(f"_bk{i}", f"_m{i}", f"_bits{i}"))
    return out.join(small.select(key).distinct(), key, "left_semi")
