"""Observational causal estimates from exact count tables —
stratified propensity (subclassification) and Horvitz-Thompson IPW.

Randomized-experiment readouts live in ``operators/nbayes.py`` /
``operators/evaluate.py`` (cuped, diff_in_diff, qte, srm_check); this
module adds the OBSERVATIONAL side: when treatment is not randomized,
weight or stratify by the propensity score.  With a discrete stratum
(a binned covariate), the propensity within stratum b is exactly
``e_b = n_treat_b / n_b``, and both classical estimators reduce to
per-stratum exact integer sums (Rosenbaum & Rubin 1984, JASA):

    ATE_strat = Σ_b (n_b/N_used) · (ȳ_t,b − ȳ_c,b)
    ATE_ipw   = (1/N_used) Σ_b [ sy_t,b · n_b/n_t,b  −  sy_c,b · n_b/n_c,b ]

(the IPW form is Horvitz-Thompson with the exact within-stratum
propensity — each term is a rational in the stratum's counts).

Determinism: every count and outcome sum is an exact int64; the two
cross-stratum folds run over the SORTED (stratum, …) struct list via
``F.aggregate`` — fixed term order, replayed term-for-term by a SQL
engine.  Strata with no treated or no control rows have undefined
weights and are DROPPED with their row count reported
(``n_dropped_rows``) — the standard overlap/positivity exclusion made
visible instead of silent.

Scale shape: ONE stratum aggregate (bounded by stratum cardinality,
never row count) + one driver-free sorted fold.  The reference engine
(transferwise/hisel) has no causal layer; this extends the grafted
experimentation surface next to HSIC-based feature relevance.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ipw_estimate(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    stratum_col: str,
) -> DataFrame:
    """Stratified-propensity ATE estimates: one row
    (n, n_used, n_strata, n_used_strata, n_dropped_rows, ate_strat,
    ate_ipw).

    ``treat_col`` must be 0/1, ``outcome_col`` integer-valued (cents
    convention), ``stratum_col`` a discrete stratum id (bin any
    continuous covariate upstream, e.g. with quantile_bin).  Strata
    lacking either arm are dropped (module docstring).  Estimates are
    NULL when no stratum survives.
    """
    base = df.select(
        F.col(stratum_col).cast("long").alias("b"),
        F.col(treat_col).cast("long").alias("t"),
        F.col(outcome_col).cast("long").alias("y"))
    per_b = base.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("t").alias("nt"),
        F.sum(F.col("t") * F.col("y")).alias("syt"),
        F.sum((1 - F.col("t")) * F.col("y")).alias("syc"))
    per_b = per_b.withColumn("ok", (F.col("nt") > 0)
                             & (F.col("nt") < F.col("n_b")))
    agg = per_b.agg(
        F.sum("n_b").alias("n"),
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.when(F.col("ok"), F.col("n_b")).otherwise(F.lit(0)))
        .alias("n_used"),
        F.sum(F.col("ok").cast("long")).alias("n_used_strata"),
        F.sort_array(F.collect_list(F.when(F.col("ok"), F.struct(
            F.col("b").alias("b"), F.col("n_b").alias("n_b"),
            F.col("nt").alias("nt"), F.col("syt").alias("syt"),
            F.col("syc").alias("syc"))))).alias("cells"))
    nu = F.col("n_used").cast("double")
    # ATE_strat: Σ n_b·(ȳt − ȳc) / N_used, folded in ascending-b order
    strat_sum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, s: acc + s["n_b"].cast("double") * (
            s["syt"].cast("double") / s["nt"].cast("double")
            - s["syc"].cast("double")
            / (s["n_b"] - s["nt"]).cast("double")))
    # ATE_ipw: Σ [syt·n_b/nt − syc·n_b/nc] / N_used, same order
    ipw_sum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, s: acc
        + (s["syt"].cast("double") * s["n_b"].cast("double")
           / s["nt"].cast("double")
           - s["syc"].cast("double") * s["n_b"].cast("double")
           / (s["n_b"] - s["nt"]).cast("double")))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_used").cast("long").alias("n_used"),
        F.col("n_strata").cast("long").alias("n_strata"),
        F.col("n_used_strata").cast("long").alias("n_used_strata"),
        (F.col("n") - F.col("n_used")).cast("long")
        .alias("n_dropped_rows"),
        F.when(F.col("n_used") > 0,
               F.round(strat_sum / nu, 6)).alias("ate_strat"),
        F.when(F.col("n_used") > 0,
               F.round(ipw_sum / nu, 6)).alias("ate_ipw"))
