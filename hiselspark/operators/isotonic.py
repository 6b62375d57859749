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

import math

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


def platt_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    iterations: int = 3,
    scale: int = 1_000_000_000_000,
) -> dict:
    """Platt scaling (Platt, "Probabilistic outputs for support vector
    machines...", 1999): fit P(y=1|s) = sigmoid(A·s + B) by Newton's
    method on the NLL with Platt's smoothed targets
    t+ = (N+ + 1)/(N+ + 2), t- = 1/(N- + 2), init A = 0,
    B = ln((N- + 1)/(N+ + 1)).

    Engine-exact by the fixed-point discipline: each Newton step's six
    sufficient sums (gradient g = Σ(p−t)·[s,1], Hessian entries
    Σw·s², Σw·s, Σw with w = p(1−p)) are per-row doubles FLOORED to
    ``scale``-scaled BIGINTs before the sum — integer sums are
    associative, so every iterate (A, B) is bit-reproducible across
    partitionings and replayable by unrolled SQL CTEs.  The ≤1-unit
    flooring error per row perturbs each sum by ≤ n/scale — far below
    the 6-decimal gate rounding.  Driver-paced: per iteration one agg
    over the (persisted) scored frame returns six BIGINTs; the 2×2
    Newton solve runs in Python doubles in an expression order the
    oracle mirrors.

    Returns {"a": A, "b": B, "n_pos": N+, "n_neg": N-} after
    ``iterations`` steps.
    """
    base = (df.select(F.col(score_col).cast("double").alias("s"),
                      F.col(label_col).cast("int").alias("y"))
              .filter(F.col("s").isNotNull()
                      & F.col("y").isNotNull())
              .persist())
    cnt = base.agg(
        F.sum(F.col("y")).alias("np"),
        F.sum(1 - F.col("y")).alias("nn")).first()
    n_pos, n_neg = int(cnt["np"]), int(cnt["nn"])
    t_pos = (n_pos + 1.0) / (n_pos + 2.0)
    t_neg = 1.0 / (n_neg + 2.0)
    a, b = 0.0, math.log((n_neg + 1.0) / (n_pos + 1.0))
    for _ in range(int(iterations)):
        p = 1.0 / (1.0 + F.exp(-(F.lit(a) * F.col("s") + F.lit(b))))
        t = F.when(F.col("y") == 1, F.lit(t_pos)).otherwise(
            F.lit(t_neg))
        w = p * (1.0 - p)

        def q(x):
            return F.sum(F.floor(x * F.lit(float(scale)))
                         .cast("long"))

        r = base.agg(q((p - t) * F.col("s")).alias("g1"),
                     q(p - t).alias("g0"),
                     q(w * F.col("s") * F.col("s")).alias("h2"),
                     q(w * F.col("s")).alias("h1"),
                     q(w).alias("h0")).first()
        # float(int)/float(int), NOT int/int: above 2^53 Python's
        # exact integer true-division differs from the SQL engines'
        # double(int)/double(int) by an ulp — mirror the oracle
        g1, g0 = float(r["g1"]) / float(scale), \
            float(r["g0"]) / float(scale)
        h2 = float(r["h2"]) / float(scale)
        h1 = float(r["h1"]) / float(scale)
        h0 = float(r["h0"]) / float(scale)
        det = h2 * h0 - h1 * h1
        a = a - (h0 * g1 - h1 * g0) / det
        b = b - (h2 * g0 - h1 * g1) / det
    base.unpersist()
    return {"a": a, "b": b, "n_pos": n_pos, "n_neg": n_neg}
