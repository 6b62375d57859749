"""Isotonic regression (PAVA) per group — monotone calibration.

The L2 isotonic fit: given a sequence y_1..y_n (here: a response
ordered by a score), find the non-decreasing μ minimizing
Σ (y_i − μ_i)² — the classic score-calibration operator (Zadrozny &
Elkan 2002; sklearn's ``IsotonicRegression``), fitted by
pool-adjacent-violators (Ayer et al. 1955): scan left to right,
merging each new point into the previous block while the previous
block's mean exceeds the new one's; every fitted value is its block's
mean.

Exactness: responses are integers (cast upstream), block sums/counts
stay exact integers, and each fitted value is ONE int64→double
division.  The classical equivalence with the greatest convex
minorant of the cumulative-sum diagram makes the result SQL-provable
in EXACT arithmetic: a prefix point (m, S_m) lies on the lower convex
hull iff for all k < m < j

    S_m·(j−k) ≤ S_k·(j−m) + S_j·(m−k)      (pure integers)

and the fitted value at position i is the slope of the hull segment
covering [i−1, i] — the same single division.  (Collinear hull points
split a block into sub-segments of the same REAL slope; IEEE division
is correctly rounded, so both engines land on the identical double.)

Scale shape: one ``applyInPandas`` per group (groups = models /
segments / score buckets — bounded cardinality by construction), PAVA
is O(n) per group with NumPy block arithmetic; nothing crosses
groups.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def _pava(y: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators on int64 ``y``; returns fitted doubles.
    Blocks kept as exact (sum, count) int pairs; a block's mean is
    computed once, as one division, on emit."""
    sums: list[int] = []
    cnts: list[int] = []
    for v in y:
        s, c = int(v), 1
        # merge while previous block mean > new block mean, compared
        # EXACTLY via cross-multiplication of integer fractions
        while sums and sums[-1] * c > s * cnts[-1]:
            s += sums.pop()
            c += cnts.pop()
        sums.append(s)
        cnts.append(c)
    out = np.empty(len(y), dtype=np.float64)
    pos = 0
    for s, c in zip(sums, cnts):
        out[pos:pos + c] = s / c
        pos += c
    return out


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    order_col: str,
    y_col: str,
) -> DataFrame:
    """Per ``group_col``, fit the isotonic (non-decreasing) regression
    of ``y_col`` over the sequence ordered by (``x_col``,
    ``order_col``) — the tiebreaker makes the sequence total.  Returns
    (group, idx, x, y, fitted) with ``idx`` the 1-based sequence
    position."""
    base = df.select(
        F.col(group_col).alias("group"),
        F.col(x_col).cast("long").alias("x"),
        F.col(order_col).cast("long").alias("o"),
        F.col(y_col).cast("long").alias("y"))
    schema = T.StructType([
        T.StructField("group", base.schema["group"].dataType),
        T.StructField("idx", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("fitted", T.DoubleType()),
    ])

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["x", "o"], kind="mergesort")
        y = pdf["y"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "group": pdf["group"].to_numpy(),
            "idx": np.arange(1, len(pdf) + 1, dtype=np.int64),
            "x": pdf["x"].to_numpy(),
            "y": y,
            "fitted": _pava(y),
        })

    return base.groupBy("group").applyInPandas(fit, schema)
