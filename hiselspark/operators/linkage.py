"""Record-linkage scoring — Fellegi-Sunter field weights over blocked
candidate pairs.

The canonical entity-resolution recipe (Fellegi & Sunter 1969): block
candidate pairs on a cheap key (never the full cross product), build
per-field agreement indicators, estimate per-field match/non-match
agreement rates

    m_k = P(agree on k | match),   u_k = P(agree on k | non-match)

from a labeled pair set, and score pairs by Σ ln(m_k/u_k) over
agreeing fields.  This module computes the m/u tables and weights;
the counts are EXACT integers (Laplace add-one keeps ln finite on
degenerate fields) and the single ln-of-ratio per field is the only
float, so a second engine replays every digit (modulo libm's ln ulp —
callers round).

Scale shape: one blocked equi-join builds the pair stream (block key
chosen so block sizes are bounded — the classic linkage discipline;
a hot block would be salted exactly like any skewed join here), then
ONE pass of conditional counts over the pairs; the field table is
built by unpivoting the one aggregate row, so the pair stream is
never re-scanned per field.
"""
from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F


def fs_weights(
    pairs: DataFrame,
    agreements: Sequence[Tuple[str, Column]],
    is_match: Column,
) -> DataFrame:
    """Fellegi-Sunter m/u estimates and log-weights per field from a
    labeled candidate-pair stream.

    ``agreements``: (field_name, boolean agreement column) pairs;
    ``is_match``: boolean ground-truth column.  Returns one row per
    field: (field, m_num, m_den, u_num, u_den, weight) with Laplace
    add-one smoothed counts and ``weight = ln(m/u)`` where
    ``m = (m_num+1)/(m_den+2)`` etc.
    """
    if not agreements:
        raise ValueError("at least one agreement field required")
    aggs = [F.sum(F.when(is_match, 1).otherwise(0)).alias("m_den"),
            F.sum(F.when(~is_match, 1).otherwise(0)).alias("u_den")]
    for name, col in agreements:
        aggs.append(F.sum(F.when(is_match & col, 1).otherwise(0))
                    .alias(f"__m_{name}"))
        aggs.append(F.sum(F.when((~is_match) & col, 1).otherwise(0))
                    .alias(f"__u_{name}"))
    one = pairs.agg(*aggs)
    stack = ", ".join(
        f"'{name}', __m_{name}, __u_{name}"
        for name, _ in agreements)
    long = one.selectExpr(
        "m_den", "u_den",
        f"stack({len(agreements)}, {stack})"
        " AS (field, m_num, u_num)")
    m = ((F.col("m_num") + 1).cast("double")
         / (F.col("m_den") + 2).cast("double"))
    u = ((F.col("u_num") + 1).cast("double")
         / (F.col("u_den") + 2).cast("double"))
    return long.select(
        "field", "m_num", "m_den", "u_num", "u_den",
        F.log(m / u).alias("weight"))
