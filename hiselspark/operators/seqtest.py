"""Sequential hypothesis testing: Wald's SPRT over ordered Bernoulli
streams.

The sequential probability ratio test (Wald 1945) monitors a stream of
binary outcomes and stops as soon as the evidence crosses either
boundary: accept H1 (rate = p1) when the cumulative log-likelihood
ratio reaches ``a = ln((1-beta)/alpha)``, accept H0 (rate = p0) when it
falls to ``b = ln(beta/(1-alpha))`` — the always-valid alternative to
fixed-horizon A/B tests (peeking is free by construction).

Reference scope note: hisel (`/root/reference`) contains no sequential
testing; this belongs to the grafted experimentation/guardrail layer
(SURVEY §2) next to srm_check / cuped / diff_in_diff.

Determinism: the LLR after n outcomes is ``npos*l1 + nneg*l0`` where
``l1 = ln(p1/p0)`` and ``l0 = ln((1-p1)/(1-p0))`` are Python-computed
double literals shared with the SQL oracle.  ``npos``/``nneg`` are
EXACT integer prefix counts from one ordered window, so every LLR is a
single three-operation float expression over exact ints — bit-identical
across layouts and engines, with no ordered float fold at all.  The
stopping row is the minimum-n crossing row (struct-min argmin; n is
row_number over a uniquely tiebroken order, so it is unique per
entity).

Scale posture: ONE entity-keyed exchange serves the window and the
final aggregate; output is one row per entity.  No driver state.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def sprt_constants(p0: float, p1: float, alpha: float, beta: float):
    """The four shared double constants of the test: per-outcome LLR
    increments (l1 for a success, l0 for a failure) and the two Wald
    boundaries (upper ``a`` accepts H1, lower ``b`` accepts H0)."""
    if not (0.0 < p0 < p1 < 1.0):
        raise ValueError(f"need 0 < p0 < p1 < 1, got p0={p0}, p1={p1}")
    if not (0.0 < alpha < 1.0 and 0.0 < beta < 1.0):
        raise ValueError(f"alpha/beta must be in (0,1), got {alpha}, {beta}")
    l1 = math.log(p1 / p0)
    l0 = math.log((1.0 - p1) / (1.0 - p0))
    a = math.log((1.0 - beta) / alpha)
    b = math.log(beta / (1.0 - alpha))
    return l1, l0, a, b


def sprt(
    df: DataFrame,
    entity_col: str,
    order_cols: list,
    outcome_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Run one SPRT per entity over its outcome stream in
    ``order_cols`` order (pass a uniquely-tiebroken ordering, e.g.
    ``["ts", "event_id"]`` — the stopping time depends on it).

    ``outcome_col`` must be 0/1 (cast to long).  Returns one row per
    entity:
      (entity, n_total, n_pos, decision, n_decide, llr_decide,
       llr_final)
    where decision is 'h1' / 'h0' at the FIRST boundary crossing in
    stream order, or 'continue' if the stream ends inside the
    boundaries (then n_decide / llr_decide are NULL).  A row crossing
    both boundaries is impossible (a > 0 > b).
    """
    l1, l0, a, b = sprt_constants(p0, p1, alpha, beta)
    base = df.select(
        F.col(entity_col).alias("entity"),
        *[F.col(c) for c in order_cols],
        F.col(outcome_col).cast("long").alias("x"))
    w = (Window.partitionBy("entity")
         .orderBy(*[F.col(c).asc() for c in order_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = Window.partitionBy("entity").orderBy(
        *[F.col(c).asc() for c in order_cols])
    stepped = base.select(
        "entity", "x",
        F.row_number().over(wn).cast("long").alias("n"),
        F.sum("x").over(w).alias("npos"))
    llr = (F.col("npos").cast("double") * F.lit(l1)
           + (F.col("n") - F.col("npos")).cast("double") * F.lit(l0))
    stepped = stepped.withColumn("llr", llr).withColumn(
        "cross",
        F.when(F.col("llr") >= F.lit(a), F.lit(1))      # accept H1
         .when(F.col("llr") <= F.lit(b), F.lit(2))      # accept H0
         .otherwise(F.lit(0)))
    agg = stepped.groupBy("entity").agg(
        F.max("n").alias("n_total"),
        F.sum("x").alias("n_pos"),
        F.min(F.when(F.col("cross") > 0,
                     F.struct(F.col("n").alias("n"),
                              F.col("cross").alias("c"),
                              F.col("llr").alias("llr"))))
        .alias("first_cross"),
        F.max(F.struct(F.col("n").alias("n"),
                       F.col("llr").alias("llr"))).alias("last"))
    return agg.select(
        "entity", "n_total", "n_pos",
        F.when(F.col("first_cross.c") == 1, F.lit("h1"))
         .when(F.col("first_cross.c") == 2, F.lit("h0"))
         .otherwise(F.lit("continue")).alias("decision"),
        F.col("first_cross.n").alias("n_decide"),
        F.round(F.col("first_cross.llr"), 6).alias("llr_decide"),
        F.round(F.col("last.llr"), 6).alias("llr_final"))
