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


def heavy_hitters(df: DataFrame, col: str, k: int = 100,
                  count_col: str = "n") -> DataFrame:
    """EXACT heavy hitters — every value with frequency strictly above
    ``N/(k+1)`` (N = total rows), with its exact count — found without
    ever shuffling the full value stream:

    1. Per-partition Misra–Gries summaries (k counters) inside
       ``mapInPandas`` — batch ``value_counts`` folded into a bounded
       dict, so memory is O(k) per task regardless of partition size.
    2. The candidate union (≤ partitions·k values, tiny) is broadcast
       back and only matching rows are counted exactly.

    Soundness: if x has global count ``Σ_i c_i(x) > N/(k+1) =
    Σ_i N_i/(k+1)``, then some partition has ``c_i(x) > N_i/(k+1)``
    (pigeonhole), and Misra–Gries guarantees its final counter
    ``est ≥ c_i − N_i/(k+1) > 0`` — so every global heavy hitter
    appears in some partition summary.  The exact second pass then
    makes the output EXACTLY ``{x : count(x)·(k+1) > N}`` — integer
    arithmetic, no estimate in the result, reproducible by a plain
    ``GROUP BY … HAVING`` oracle.  Shuffle volume: candidates only.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def mg(pdfs):
        counters: dict = {}
        for pdf in pdfs:
            for val, c in pdf[col].value_counts(dropna=True).items():
                counters[val] = counters.get(val, 0) + int(c)
                if len(counters) > k:
                    dec = min(counters.values())
                    counters = {v: n - dec for v, n in counters.items()
                                if n > dec}
        yield pd.DataFrame({col: list(counters.keys())})

    cand = (df.select(col).mapInPandas(mg, df.select(col).schema)
              .distinct())
    total = df.count()
    # no forced broadcast: candidates are usually tiny (<= k per
    # partition before distinct) and AQE broadcasts them at runtime,
    # but on a 100k-partition corpus the union can grow past the
    # broadcast threshold and must fall back to a shuffled semi-join
    # of the candidate set — never of the full stream
    return (df.join(cand, col, "left_semi")
              .groupBy(col)
              .agg(F.count(F.lit(1)).alias(count_col))
              .filter(F.col(count_col) * (k + 1) > F.lit(total)))


def approx_quantiles(df: DataFrame, group_col: str, col: str,
                     probs: Sequence[float],
                     accuracy: int = 10000) -> DataFrame:
    """Per-group Greenwald–Khanna quantile estimates (rank error
    ≤ 1/accuracy) for each probability in ``probs``."""
    aggs = [F.expr(f"approx_percentile({col}, {p}, {accuracy})")
            .alias(f"q{int(p * 100)}") for p in probs]
    return df.groupBy(group_col).agg(*aggs)


def heavy_hitters_per_group(df: DataFrame, group_col: str, col: str,
                            k: int = 50,
                            count_col: str = "n") -> DataFrame:
    """Per-group exact heavy hitters — for every group, the values
    with in-group frequency strictly above ``N_g/(k+1)`` and their
    exact counts ("top tokens per language", "top errors per
    service").  The same Misra–Gries candidates → exact-recount
    design as :func:`heavy_hitters`, with the counter dict keyed by
    ``(group, value)`` and a budget of ``k`` counters PER GROUP per
    task: the pigeonhole argument applies within each group
    separately, so soundness per group is inherited verbatim.
    Candidate volume is ≤ partitions·groups·k — still sketch-sized
    relative to the stream; the exact pass semi-joins on
    ``(group, value)``."""
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sel = df.select(group_col, col)

    def mg(pdfs):
        groups: dict = {}
        for pdf in pdfs:
            vc = pdf.groupby([group_col, col], dropna=True,
                             sort=False).size()
            for (g, val), c in vc.items():
                counters = groups.setdefault(g, {})
                counters[val] = counters.get(val, 0) + int(c)
                if len(counters) > k:
                    dec = min(counters.values())
                    groups[g] = {v: n - dec
                                 for v, n in counters.items()
                                 if n > dec}
        rows = [(g, v) for g, cs in groups.items() for v in cs]
        yield pd.DataFrame(rows, columns=[group_col, col])

    cand = sel.mapInPandas(mg, sel.schema).distinct()
    totals = sel.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__ng"))
    return (sel.join(cand, [group_col, col], "left_semi")
               .groupBy(group_col, col)
               .agg(F.count(F.lit(1)).alias(count_col))
               .join(totals, group_col)
               .filter(F.col(count_col) * (k + 1) > F.col("__ng"))
               .drop("__ng"))
