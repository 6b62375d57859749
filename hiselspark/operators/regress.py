"""Grouped ordinary least squares — one trend line per entity from a
single aggregation pass of exact integer sufficient statistics.

``slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)``, intercept, and r² per
group: the "fit a tiny model per key" pattern (per-user spend trend,
per-device drift, per-feature decay) that pulls people toward
``applyInPandas`` + sklearn per group — needlessly: OLS is five sums.
One map-side-combined ``groupBy`` shuffle carrying six numbers per
group, no per-group Python, no iteration.

Exactness contract (the engine convention): quantize ``x`` and ``y``
to integers upstream; every sum is then exact, each is cast to double
ONCE, and the closing arithmetic is an IEEE-deterministic expression
tree a SQL oracle replays bit-for-bit.  Keep Σx², Σxy below 2^53 by
choosing units (seconds-since-group-start, cents).
Reference parity note: the reference engine (transferwise/hisel) has no
grouped-regression layer — this module belongs to the grafted per-entity
analytics surface of the engine (north rule), alongside the point-in-
time operators.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def group_ols(df: DataFrame, group_col: str, x_col: str,
              y_col: str) -> DataFrame:
    """One row per group: ``(group, n, slope, intercept, r2)``.
    Groups with zero x-variance get NULL slope/intercept/r2 (a
    vertical line is not a function); r2 is NULL when y is constant
    (no variance to explain)."""
    x = F.col(x_col)
    y = F.col(y_col)
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"))

    def d(c):
        return F.col(c).cast("double")

    n = d("n")
    vx = d("sxx") - d("sx") * d("sx") / n
    vy = d("syy") - d("sy") * d("sy") / n
    cxy = d("sxy") - d("sx") * d("sy") / n
    slope = F.when(vx > 0, cxy / vx)
    intercept = F.when(vx > 0, (d("sy") - (cxy / vx) * d("sx")) / n)
    r2 = F.when((vx > 0) & (vy > 0), (cxy / vx) * (cxy / vy))
    return per.select(group_col, F.col("n").cast("long").alias("n"),
                      slope.alias("slope"),
                      intercept.alias("intercept"),
                      r2.alias("r2"))
