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
statistic is found on an integer count table — no per-group sort of
raw rows, no collect.  ``k`` uses pure integer ceiling arithmetic.
The only floats are the final coverage ratio and the unscaled
``q/den`` report column.

Scale shape: TWO map-side-combined shuffles of collapsed data — the
per-group stats aggregate, then (stats broadcast back, residuals
computed map-side) the (group, residual) count table carrying
calibration and test counts side by side.  The order-statistic
window, threshold pick and coverage sums all run on that tiny table.
The raw data is never windowed and never shuffled at full width.
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
    an, ad = alpha_num, alpha_den
    base = df.select(F.col(group_col).alias("grp"),
                     is_calibration.alias("cal"),
                     F.col(value_col).cast("long").alias("v"))
    cs = (base.groupBy("grp").agg(
        F.sum(F.when(F.col("cal"), 1).otherwise(0)).alias("n_cal"),
        F.sum(F.when(F.col("cal"), F.col("v")).otherwise(0))
         .alias("s_cal"),
        F.sum(F.when(~F.col("cal"), 1).otherwise(0)).alias("n_test"))
        .withColumn("k", F.expr(
            f"((n_cal + 1) * {ad - an} + {ad - 1}) DIV {ad}")))
    # stats broadcast back ONCE: residuals are computed map-side, the
    # only full-width shuffle is the (grp, r) count table, and the
    # threshold + coverage come out of ONE window pass over it — a row
    # is inside the interval iff its PREVIOUS cumulative calibration
    # count is below k (q is the first residual whose cumulative
    # reaches k, so r ≤ q ⟺ cum − c_cal < k); no q-join, no second
    # consumption of anything
    joined = (base.join(F.broadcast(cs), "grp")
              .withColumn("r", F.abs(F.col("v") * F.col("n_cal")
                                     - F.col("s_cal"))))
    tbl = (joined.groupBy("grp", "r").agg(
        F.sum(F.when(F.col("cal"), 1).otherwise(0)).alias("c_cal"),
        F.sum(F.when(~F.col("cal"), 1).otherwise(0)).alias("c_test"),
        F.max("k").alias("k"),
        F.max("n_cal").alias("n_cal"),
        F.max("n_test").alias("n_test")))
    w_r = (Window.partitionBy("grp").orderBy("r")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    win = tbl.withColumn("cum", F.sum("c_cal").over(w_r))
    out = (win.groupBy("grp").agg(
        F.max("n_cal").alias("n_cal"),
        F.max("n_test").alias("n_test"),
        F.max("k").alias("k"),
        F.min(F.when(F.col("cum") >= F.col("k"), F.col("r")))
         .alias("q_scaled"),
        F.sum(F.when(F.col("cum") - F.col("c_cal") < F.col("k"),
                     F.col("c_test")).otherwise(0))
         .alias("covered")))
    q = (F.when(F.col("n_cal") > 0,
                F.col("q_scaled").cast("double")
                / F.col("n_cal").cast("double"))
         .alias("q"))
    coverage = (F.when(F.col("n_test") > 0,
                       F.coalesce(F.col("covered"), F.lit(0))
                       .cast("double")
                       / F.col("n_test").cast("double"))
                .alias("coverage"))
    return out.select(
        F.col("grp").alias(group_col), "n_cal", "n_test", "k",
        "q_scaled", q,
        F.coalesce("covered", F.lit(0)).cast("long").alias("covered"),
        coverage)
