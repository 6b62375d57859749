"""Sketch-based approximate aggregates — the 100-TB answer to
"distinct count" and "quantiles" when exact is too expensive.

Exact distinct and exact quantiles both need a full shuffle of the
key/value stream; at corpus scale the standard move is a fixed-size
mergeable sketch computed map-side: HyperLogLog++ for cardinality
(``approx_count_distinct``; Heule et al., 2013) and the
Greenwald–Khanna sketch for quantiles (``approx_percentile``).  Both
Spark implementations are DETERMINISTIC for a given input multiset —
no RNG — so their outputs are reproducible and even pinnable; the
driver gate instead checks the mathematically guaranteed INVARIANT
(estimate within tolerance of the exact answer, recomputed exactly in
DuckDB) plus the exact columns, which stays valid at any scale factor.

Plan shape: one partial-aggregate shuffle of SKETCHES (bytes per
group, not rows) — this is the operator family where the shuffle
volume is O(groups), not O(rows).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def approx_distinct(df: DataFrame, group_col: str, col: str,
                    rsd: float = 0.05) -> DataFrame:
    """Per-group HLL++ cardinality estimate alongside the exact count
    (callers drop the exact column at real scale; the gate keeps both
    to assert the error bound)."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(col, rsd).alias("n_approx"),
        F.countDistinct(col).alias("n_exact"))


def approx_quantiles(df: DataFrame, group_col: str, col: str,
                     probs: Sequence[float],
                     accuracy: int = 10000) -> DataFrame:
    """Per-group Greenwald–Khanna quantile estimates (rank error
    ≤ 1/accuracy) for each probability in ``probs``."""
    aggs = [F.expr(f"approx_percentile({col}, {p}, {accuracy})")
            .alias(f"q{int(p * 100)}") for p in probs]
    return df.groupBy(group_col).agg(*aggs)
