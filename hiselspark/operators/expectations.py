"""Data-quality expectation checks (the Deequ/Great-Expectations
staple): before a 100-TB corpus feeds training, the pipeline asserts
schema-level invariants — completeness, ranges, set membership,
uniqueness — and records HOW MANY rows violate each, not just a
boolean.

Design: every rule compiles to a conditional-count EXPRESSION, so a
whole rule suite is ONE map-side-combined aggregate pass over the
table (uniqueness adds one exact groupBy-count pass — the only rule
class that genuinely needs a shuffle).  Output is one row per rule:
``(rule, violations, n_rows, pass)`` — integer counts, reproducible
by plain SQL.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F


def not_null(col: str) -> Tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNull()


def in_range(col: str, lo, hi) -> Tuple[str, Column]:
    """Violated when outside [lo, hi] (NULLs are not range violations —
    pair with not_null to forbid them)."""
    c = F.col(col)
    return (f"in_range({col},{lo},{hi})",
            c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))))


def in_set(col: str, values: Sequence) -> Tuple[str, Column]:
    c = F.col(col)
    name = f"in_set({col})"
    return name, c.isNotNull() & ~c.isin(list(values))


def matches(col: str, pattern: str) -> Tuple[str, Column]:
    c = F.col(col)
    return (f"matches({col})",
            c.isNotNull() & ~c.rlike(pattern))


def check_expectations(
    df: DataFrame,
    rules: Sequence[Tuple[str, Column]],
    unique_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Evaluate all ``rules`` (name, violation-condition pairs from the
    helpers above, or hand-built) in ONE aggregate pass; optionally
    append a ``unique(...)`` rule counting rows that share their
    ``unique_cols`` key with another row (violations = rows in
    duplicated keys, not distinct keys — the number a cleanup job must
    touch)."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(cond.cast("long")).alias(f"__v{i}")
        for i, (_, cond) in enumerate(rules)
    ]
    row = df.agg(*aggs)
    parts = [
        row.select(F.lit(name).alias("rule"),
                   F.col(f"__v{i}").alias("violations"),
                   F.col("__n").alias("n_rows"))
        for i, (name, _) in enumerate(rules)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if unique_cols:
        unique_cols = list(unique_cols)
        dup = (df.groupBy(*unique_cols)
                 .agg(F.count(F.lit(1)).alias("__c"))
                 .filter(F.col("__c") > 1)
                 .agg(F.coalesce(F.sum("__c"), F.lit(0).cast("long"))
                      .alias("violations")))
        total = df.agg(F.count(F.lit(1)).alias("n_rows"))
        uniq = (dup.crossJoin(total)
                .select(F.lit(f"unique({','.join(unique_cols)})")
                        .alias("rule"),
                        "violations", "n_rows"))
        out = out.unionByName(uniq)
    return out.withColumn("pass", F.col("violations") == 0)
