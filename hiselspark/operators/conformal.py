"""Split-conformal prediction intervals with exact arithmetic.

The distribution-free coverage recipe (Vovk et al.; Lei et al. 2018)
every model-serving pipeline bolts on last: fit any point predictor,
compute absolute residuals on a held-out CALIBRATION slice, take the
k-th order statistic with k = ⌈(n+1)(1−α)⌉, and the interval
``prediction ± q`` covers a fresh point with probability ≥ 1−α —
guaranteed, no distributional assumptions.

Exactness: the per-group predictor is the calibration mean kept as an
exact integer FRACTION (num=Σv, den=n), so the residual
``|v·den − num|`` is an exact integer at scale ``den`` and the order
statistic is found on an integer count table (groupBy residual +
cumulative window — no per-group sort of raw rows, no collect), the
same scalable shape as the engine's exact quantiles.  ``k`` uses pure
integer ceiling arithmetic.  The only floats are the final coverage
ratio and the unscaled ``q/den`` report column.

Scale shape: one group shuffle serves the calibration stats, the
residual count table, the order-statistic window and the coverage
counts (subset-cluster-keys reuse); output is one row per group.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def split_conformal(
    df: DataFrame,
    group_col: str,
    is_calibration: Column,
    value_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Per-group split-conformal interval at miscoverage
    ``alpha = alpha_num/alpha_den`` (a rational, so k stays integer):
    returns (group, n_cal, n_test, k, q_scaled, q, covered, coverage).
    ``q_scaled`` is the exact residual threshold at scale ``n_cal``;
    ``q = q_scaled/n_cal`` is the interval half-width in value units.
    When k > n_cal (tiny calibration slice) the interval is infinite:
    q is NULL and coverage is exactly 1."""
    if not (0 < alpha_num < alpha_den):
        raise ValueError("alpha must be a rational in (0, 1)")
    base = df.select(F.col(group_col).alias("grp"),
                     is_calibration.alias("cal"),
                     F.col(value_col).cast("long").alias("v"))
    w_g = Window.partitionBy("grp")
    cur = (base
           .withColumn("n_cal", F.sum(F.when(F.col("cal"), 1)
                                      .otherwise(0)).over(w_g))
           .withColumn("s_cal", F.sum(F.when(F.col("cal"),
                                             F.col("v"))
                                      .otherwise(0)).over(w_g)))
    # residual at scale den = n_cal: |v*den - num|, exact integers
    cur = cur.withColumn(
        "r", F.abs(F.col("v") * F.col("n_cal") - F.col("s_cal")))
    # k = ceil((n_cal + 1) * (1 - alpha)) in pure integers:
    # (n_cal+1)*(den-num) / den, ceiling
    an, ad = alpha_num, alpha_den
    cur = cur.withColumn(
        "k", F.expr(f"((n_cal + 1) * {ad - an} + {ad - 1}) DIV {ad}"))
    # order statistic on the calibration residual count table
    counts = (cur.filter("cal")
              .groupBy("grp", "r")
              .agg(F.count(F.lit(1)).alias("c"),
                   F.max("k").alias("k"),
                   F.max("n_cal").alias("n_cal")))
    w_r = (Window.partitionBy("grp").orderBy("r")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    qrow = (counts.withColumn("cum", F.sum("c").over(w_r))
            .filter(F.col("cum") >= F.col("k"))
            .groupBy("grp")
            .agg(F.min("r").alias("q_scaled"),
                 F.max("k").alias("k"),
                 F.max("n_cal").alias("n_cal")))
    # infinite-interval case: k > n_cal -> no row passed the filter;
    # recover those groups with NULL q
    allg = (cur.groupBy("grp")
            .agg(F.max("n_cal").alias("n_cal"),
                 F.max("k").alias("k"),
                 F.sum(F.when(~F.col("cal"), 1).otherwise(0))
                 .alias("n_test")))
    test = (cur.filter(~F.col("cal"))
            .join(qrow.select("grp", "q_scaled"), "grp", "left")
            .groupBy("grp")
            .agg(F.sum(F.when(F.col("q_scaled").isNull()
                              | (F.col("r") <= F.col("q_scaled")), 1)
                       .otherwise(0)).alias("covered")))
    out = (allg.join(qrow.select("grp", "q_scaled"), "grp", "left")
           .join(test, "grp", "left"))
    q = (F.when(F.col("n_cal") > 0,
                F.col("q_scaled").cast("double")
                / F.col("n_cal").cast("double"))
         .alias("q"))
    cov = (F.when(F.col("n_test") > 0,
                  F.coalesce(F.col("covered"), F.lit(0))
                  .cast("double") / F.col("n_test").cast("double"))
           .alias("coverage"))
    return out.select(
        F.col("grp").alias(group_col), "n_cal", "n_test", "k",
        "q_scaled", q, F.coalesce("covered", F.lit(0))
        .cast("long").alias("covered"), cov)
