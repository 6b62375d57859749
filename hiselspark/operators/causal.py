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

from pyspark.sql import DataFrame, Window, functions as F


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


def matched_pairs(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    stratum_col: str,
    order_col: str,
) -> DataFrame:
    """Within-stratum rank matching — the deterministic 1:1 matching
    estimator next to :func:`ipw_estimate`: inside every stratum the
    treated rows and control rows are each ranked by ``order_col``
    (a unique id — the reproducible stand-in for a match score) and
    the i-th treated row is paired with the i-th control row; the
    surplus arm's unmatched tail is dropped and COUNTED.  This is
    exact-matching-within-subclass (Rosenbaum & Rubin 1985's
    subclassification matching with a deterministic within-class
    order), the ATT companion of the IPW estimator.

    Exactness: ranks are row_number over a unique key (layout-stable),
    pair differences are exact integer cents, and the ATT is ONE
    division of two exact sums.  Returns one row:
    (n_pairs, n_unmatched_treated, n_unmatched_control,
     sum_diff_cents, att).

    Plan: one stratum-keyed exchange serves both rank windows
    (same-cluster windows share the shuffle), one FULL OUTER
    equi-join on (stratum, rank) — never a cross join, and the
    unmatched tails fall out of the same join — then one global
    aggregate.  No driver actions.
    """
    base = df.select(
        F.col(stratum_col).cast("long").alias("b"),
        F.col(treat_col).cast("long").alias("t"),
        F.col(outcome_col).cast("long").alias("y"),
        F.col(order_col).cast("long").alias("o"))
    w_t = (Window.partitionBy("b", "t").orderBy("o"))
    ranked = base.withColumn("rk", F.row_number().over(w_t))
    t1 = (ranked.filter(F.col("t") == 1)
          .select("b", "rk", F.col("y").alias("yt")))
    t0 = (ranked.filter(F.col("t") == 0)
          .select("b", "rk", F.col("y").alias("yc")))
    both = t1.join(t0, ["b", "rk"], "full")
    is_pair = (F.col("yt").isNotNull()
               & F.col("yc").isNotNull()).cast("long")
    agg = both.agg(
        F.sum(is_pair).alias("n_pairs"),
        F.sum((F.col("yt").isNotNull()
               & F.col("yc").isNull()).cast("long"))
        .alias("n_unmatched_treated"),
        F.sum((F.col("yc").isNotNull()
               & F.col("yt").isNull()).cast("long"))
        .alias("n_unmatched_control"),
        F.sum(F.when(is_pair == 1, F.col("yt") - F.col("yc"))
              .otherwise(F.lit(0))).alias("sum_diff_cents"))
    return agg.select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_unmatched_treated").cast("long")
        .alias("n_unmatched_treated"),
        F.col("n_unmatched_control").cast("long")
        .alias("n_unmatched_control"),
        F.col("sum_diff_cents").cast("long").alias("sum_diff_cents"),
        F.when(F.col("n_pairs") > 0,
               F.round(F.col("sum_diff_cents").cast("double")
                       / F.col("n_pairs").cast("double"), 6))
        .alias("att"))


def reg_discontinuity(df: DataFrame, running_col: str,
                      outcome_col: str, cutoff: int,
                      bandwidth: int) -> DataFrame:
    """Sharp regression-discontinuity estimate (Thistlethwaite &
    Campbell 1960; Imbens & Lemieux 2008): fit a separate closed-form
    OLS of the outcome on the centered running variable on each side
    of the cutoff within ``bandwidth``, and report the jump of the two
    fitted intercepts AT the cutoff as the local treatment effect.

    Both columns must be integer-quantized (cents / scores): every
    sufficient statistic (n, Σx, Σy, Σxy, Σx²) is an exact int64
    reduced in one map-side-combined aggregate per side, so the final
    slopes/intercepts/effect are single mirrored float expressions —
    bit-reproducible across partitionings and engines.  Left side is
    ``cutoff-bandwidth ≤ x < cutoff``, right is ``cutoff ≤ x ≤
    cutoff+bandwidth``; the treated (right) intercept minus the
    control (left) intercept is ``effect``.  Rows with NULL in either
    column are excluded.  One filter + one 2-row aggregate: map-only
    at any scale.  The reference engine (transferwise/hisel) has no
    causal layer — grafted surface."""
    x = F.col(running_col).cast("long") - F.lit(int(cutoff))
    y = F.col(outcome_col).cast("long")
    side = F.when(x < 0, F.lit("left")).otherwise(F.lit("right"))
    per = (df.filter(F.col(running_col).isNotNull()
                     & F.col(outcome_col).isNotNull()
                     & (x >= -int(bandwidth)) & (x <= int(bandwidth)))
             .select(side.alias("side"), x.alias("x"), y.alias("y"))
             .groupBy("side")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                  F.sum(F.col("x") * F.col("y")).alias("sxy"),
                  F.sum(F.col("x") * F.col("x")).alias("sxx")))
    n = F.col("n").cast("double")
    det = n * F.col("sxx").cast("double") - (F.col("sx").cast("double")
                                             * F.col("sx").cast("double"))
    slope = F.when(det != 0.0,
                   (n * F.col("sxy").cast("double")
                    - F.col("sx").cast("double")
                    * F.col("sy").cast("double")) / det)
    intercept = ((F.col("sy").cast("double")
                  - slope * F.col("sx").cast("double")) / n)
    sides = per.withColumn("slope", slope).withColumn("icept", intercept)
    wide = (sides.groupBy()
                 .pivot("side", ["left", "right"])
                 .agg(F.first("n").alias("n"),
                      F.first("slope").alias("slope"),
                      F.first("icept").alias("icept")))
    return wide.select(
        F.col("left_n").cast("long").alias("n_left"),
        F.col("right_n").cast("long").alias("n_right"),
        F.col("left_slope").alias("slope_left"),
        F.col("right_slope").alias("slope_right"),
        F.col("left_icept").alias("icept_left"),
        F.col("right_icept").alias("icept_right"),
        (F.col("right_icept") - F.col("left_icept")).alias("effect"))


def ips_offpolicy(df: DataFrame, action_col: str, reward_col: str,
                  target_action_col: str) -> DataFrame:
    """Off-policy evaluation of a deterministic target policy from
    logged bandit data by inverse propensity scoring (Horvitz &
    Thompson 1952; Li et al. 2011): with the logging propensities
    estimated as the empirical action frequencies ``p(a) = n_a/n``,

        V_IPS   = (1/n) Σ rᵢ·1[π(xᵢ)=aᵢ]/p(aᵢ)
        V_SNIPS = Σ rᵢ·wᵢ / Σ wᵢ,   wᵢ = 1[π(xᵢ)=aᵢ]/p(aᵢ)

    ``target_action_col`` holds the action the TARGET policy would
    take on each logged context (a column, so any deterministic
    policy expressible over the row is supported); ``reward_col``
    must be integer-quantized.  Every sufficient statistic (n, per-
    action counts, matched-reward and matched-count sums grouped BY
    ACTION) is an exact int64; the two estimates are fixed float
    expressions over the per-action sums folded in action order — so
    the result is bit-reproducible and SQL-replayable.  Two count
    shuffles on the action key; linear."""
    r = F.col(reward_col).cast("long")
    match = (F.col(action_col) == F.col(target_action_col))
    per = (df.filter(F.col(action_col).isNotNull()
                     & F.col(reward_col).isNotNull())
             .groupBy(action_col)
             .agg(F.count(F.lit(1)).alias("n_a"),
                  F.sum(F.when(match, r).otherwise(F.lit(0)))
                  .alias("r_match"),
                  F.sum(match.cast("long")).alias("n_match")))
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    per = per.withColumn("n", F.sum("n_a").over(wt))
    # w for every matched row of action a is n/n_a (constant within
    # the action), so the folds are over the per-action table,
    # ordered by action for determinism
    term_v = (F.col("r_match").cast("double")
              * F.col("n").cast("double")
              / F.col("n_a").cast("double"))
    term_w = (F.col("n_match").cast("double")
              * F.col("n").cast("double")
              / F.col("n_a").cast("double"))
    agg = per.agg(
        F.max("n").alias("n"),
        F.sum("n_match").alias("n_matched"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col(action_col).alias("g"),
                    term_v.alias("tv"), term_w.alias("tw")))),
                lambda s: F.struct(s["tv"].alias("tv"),
                                   s["tw"].alias("tw"))),
            F.struct(F.lit(0.0).alias("sv"), F.lit(0.0).alias("sw")),
            lambda acc, s: F.struct(
                (acc["sv"] + s["tv"]).alias("sv"),
                (acc["sw"] + s["tw"]).alias("sw"))).alias("f"))
    v_ips = F.col("f.sv") / F.col("n").cast("double")
    v_snips = F.when(F.col("f.sw") > 0.0,
                     F.col("f.sv") / F.col("f.sw"))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_matched").cast("long").alias("n_matched"),
        v_ips.alias("value_ips"), v_snips.alias("value_snips"))


def iv_wald(df: DataFrame, instrument_col: str, treatment_col: str,
            outcome_col: str) -> DataFrame:
    """Wald instrumental-variable estimator (Wald 1940; the
    just-identified 2SLS with one binary instrument) — the classic
    encouragement-design / imperfect-compliance estimate of a local
    average treatment effect:

        LATE = (ȳ_{z=1} − ȳ_{z=0}) / (x̄_{z=1} − x̄_{z=0})

    ``instrument_col`` is 0/1; treatment and outcome must be
    integer-valued (cents convention), so the per-arm sufficient
    statistics (n, Σx, Σy) are exact int64 from ONE aggregate and the
    intent-to-treat numerator, first-stage denominator and the ratio
    are mirrored float expressions.  LATE is NULL when either arm is
    empty or the first stage is exactly 0 (no instrument relevance).
    Returns one row: (n0, n1, sx0, sx1, sy0, sy1, itt_y,
    first_stage, late)."""
    z = F.col(instrument_col).cast("long")
    x = F.col(treatment_col).cast("long")
    y = F.col(outcome_col).cast("long")
    agg = (df.filter(F.col(instrument_col).isNotNull()
                     & F.col(treatment_col).isNotNull()
                     & F.col(outcome_col).isNotNull())
             .agg(F.sum(1 - z).alias("n0"),
                  F.sum(z).alias("n1"),
                  F.sum((1 - z) * x).alias("sx0"),
                  F.sum(z * x).alias("sx1"),
                  F.sum((1 - z) * y).alias("sy0"),
                  F.sum(z * y).alias("sy1")))
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    itt = F.when(ok, F.col("sy1").cast("double")
                 / F.col("n1").cast("double")
                 - F.col("sy0").cast("double")
                 / F.col("n0").cast("double"))
    fs = F.when(ok, F.col("sx1").cast("double")
                / F.col("n1").cast("double")
                - F.col("sx0").cast("double")
                / F.col("n0").cast("double"))
    late = F.when(ok & (fs != 0.0), itt / fs)
    return agg.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.col("sx0").cast("long").alias("sx0"),
        F.col("sx1").cast("long").alias("sx1"),
        F.col("sy0").cast("long").alias("sy0"),
        F.col("sy1").cast("long").alias("sy1"),
        itt.alias("itt_y"), fs.alias("first_stage"),
        late.alias("late"))


def e_value(df: DataFrame, treatment_col: str,
            outcome_col: str) -> DataFrame:
    """E-value sensitivity analysis (VanderWeele & Ding 2017) — the
    minimum strength of unmeasured confounding (on the risk-ratio
    scale, with both treatment and outcome) needed to explain away an
    observed association:

        E = RR* + √(RR*·(RR*−1)),   RR* = max(RR, 1/RR)

    Both columns are 0/1.  The 2×2 cells are exact int64 from one
    aggregate; RR and E are mirrored float expressions.  RR is NULL
    when either arm is empty or the untreated risk is 0; E is NULL
    when additionally the treated risk is 0 (RR = 0 has no finite
    reciprocal bound).  Returns one row:
    (n, n1, n0, n11, n01, rr, evalue)."""
    t = F.col(treatment_col).cast("long")
    y = F.col(outcome_col).cast("long")
    agg = (df.filter(F.col(treatment_col).isNotNull()
                     & F.col(outcome_col).isNotNull())
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(t).alias("n1"),
                  F.sum(1 - t).alias("n0"),
                  F.sum(t * y).alias("n11"),
                  F.sum((1 - t) * y).alias("n01")))
    p1 = F.col("n11").cast("double") / F.col("n1").cast("double")
    p0 = F.col("n01").cast("double") / F.col("n0").cast("double")
    ok = (F.col("n1") > 0) & (F.col("n0") > 0) & (F.col("n01") > 0)
    rr = F.when(ok, p1 / p0)
    rr_star = F.when(ok & (F.col("n11") > 0),
                     F.when(p1 / p0 >= 1.0, p1 / p0)
                      .otherwise(p0 / p1))
    ev = rr_star + F.sqrt(rr_star * (rr_star - 1.0))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n0").cast("long").alias("n0"),
        F.col("n11").cast("long").alias("n11"),
        F.col("n01").cast("long").alias("n01"),
        rr.alias("rr"), ev.alias("evalue"))


def covariate_balance(df: DataFrame, treat_col: str,
                      covariate_cols) -> DataFrame:
    """Standardized mean differences of every covariate between the
    treated and control arms — THE balance card of any matching /
    weighting analysis (|SMD| < 0.1 is the conventional pass):

        SMD_c = (m₁ − m₀) / √((s₁² + s₀²)/2)

    One aggregate computes every covariate's per-arm exact int64
    (n, Σx, Σx²); means / variances / SMD are mirrored float
    expressions, one output row per covariate IN THE CALLER ORDER
    (an ordinal column pins it).  NULL SMD when an arm has < 2 rows
    or the pooled spread is 0.  Returns (covariate, ord, n1, n0,
    mean1, mean0, smd)."""
    covariate_cols = list(covariate_cols)
    t = F.col(treat_col).cast("long")
    aggs = [F.sum(t).alias("n1"), F.sum(1 - t).alias("n0")]
    for i, c in enumerate(covariate_cols):
        x = F.col(c).cast("long")
        aggs += [F.sum(t * x).alias(f"s1_{i}"),
                 F.sum(t * x * x).alias(f"q1_{i}"),
                 F.sum((1 - t) * x).alias(f"s0_{i}"),
                 F.sum((1 - t) * x * x).alias(f"q0_{i}")]
    stats = df.filter(t.isNotNull()).agg(*aggs)

    def d(c):
        return F.col(c).cast("double")

    rows = None
    for i, c in enumerate(covariate_cols):
        n1, n0 = d("n1"), d("n0")
        m1 = d(f"s1_{i}") / n1
        m0 = d(f"s0_{i}") / n0
        v1 = (d(f"q1_{i}") - d(f"s1_{i}") * d(f"s1_{i}") / n1) \
            / (n1 - 1.0)
        v0 = (d(f"q0_{i}") - d(f"s0_{i}") * d(f"s0_{i}") / n0) \
            / (n0 - 1.0)
        sp = F.sqrt((v1 + v0) / F.lit(2.0))
        ok = (F.col("n1") >= 2) & (F.col("n0") >= 2)
        smd = F.when(ok & (sp > 0.0), (m1 - m0) / sp)
        row = stats.select(
            F.lit(c).alias("covariate"),
            F.lit(i).cast("long").alias("ord"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n0").cast("long").alias("n0"),
            F.when(F.col("n1") > 0, m1).alias("mean1"),
            F.when(F.col("n0") > 0, m0).alias("mean0"),
            smd.alias("smd"))
        rows = row if rows is None else rows.unionAll(row)
    return rows


def mantel_haenszel(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio + test over stratified 2×2
    tables (Mantel & Haenszel 1959) — the classical confounder-
    adjusted association summary next to :func:`ipw_estimate`'s
    difference-scale ATE.  Per stratum s the exact int64 cells

        a=(t=1,y=1)  b=(t=1,y=0)  c=(t=0,y=1)  d=(t=0,y=0),  n=a+b+c+d

    give  OR_MH = Σ_s(a·d/n) / Σ_s(b·c/n)  and the MH chi-square
    (no continuity correction)

        χ² = (Σa − ΣE)² / ΣV,   E = r1·c1/n,
        V  = r1·r0·c1·c0 / (n²(n−1))

    with r/c the treatment/outcome margins.  Strata with n < 2
    (V undefined) are dropped AND counted — the engine's convention.
    All cells are exact integers; the four per-stratum float terms
    (ad/n, bc/n, E, V) fold in ascending-stratum order so both
    engines sum the series identically.  OR is NULL when Σbc/n = 0,
    χ² NULL when ΣV = 0.  Returns one row: (n, n_strata,
    n_used_strata, n_dropped_rows, sum_a, or_mh, chi2_mh).

    Reference ties: hisel routes categorical dependence through
    AMI/MI permutation search (`hisel/categorical.py:115-186`); this
    is the stratified-confounding companion a tabular-feature audit
    runs next to it.
    """
    base = df.select(
        F.col(stratum_col).cast("long").alias("s"),
        F.col(treat_col).cast("long").alias("t"),
        F.col(outcome_col).cast("long").alias("y"))
    per_s = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum(F.col("t") * F.col("y")).alias("a"),
        F.sum(F.col("t") * (1 - F.col("y"))).alias("b"),
        F.sum((1 - F.col("t")) * F.col("y")).alias("c"),
        F.sum((1 - F.col("t")) * (1 - F.col("y"))).alias("d"))
    per_s = per_s.withColumn("ok", F.col("n_s") >= 2)
    agg = per_s.agg(
        F.sum("n_s").alias("n"),
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.col("ok").cast("long")).alias("n_used_strata"),
        F.sum(F.when(F.col("ok"), F.lit(0)).otherwise(F.col("n_s")))
        .alias("n_dropped_rows"),
        F.sum(F.when(F.col("ok"), F.col("a")).otherwise(F.lit(0)))
        .alias("sum_a"),
        F.sort_array(F.collect_list(F.when(F.col("ok"), F.struct(
            F.col("s").alias("s"), F.col("n_s").alias("n_s"),
            F.col("a").alias("a"), F.col("b").alias("b"),
            F.col("c").alias("c"), F.col("d").alias("d")))))
        .alias("cells"))

    def dd(x):
        return x.cast("double")

    r_sum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc
        + dd(e["a"] * e["d"]) / dd(e["n_s"]))
    s_sum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc
        + dd(e["b"] * e["c"]) / dd(e["n_s"]))
    e_sum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc
        + dd((e["a"] + e["b"]) * (e["a"] + e["c"])) / dd(e["n_s"]))
    v_sum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc
        + dd((e["a"] + e["b"]) * (e["c"] + e["d"]))
        * dd((e["a"] + e["c"]) * (e["b"] + e["d"]))
        / (dd(e["n_s"]) * dd(e["n_s"]) * dd(e["n_s"] - 1)))
    dev = F.col("sum_a").cast("double") - e_sum
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_strata").cast("long").alias("n_strata"),
        F.col("n_used_strata").cast("long").alias("n_used_strata"),
        F.col("n_dropped_rows").cast("long").alias("n_dropped_rows"),
        F.col("sum_a").cast("long").alias("sum_a"),
        F.when(s_sum > 0.0, r_sum / s_sum).alias("or_mh"),
        F.when(v_sum > 0.0, dev * dev / v_sum).alias("chi2_mh"))


def aipw_estimate(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
) -> DataFrame:
    """Doubly-robust AIPW ATE (Robins, Rotnitzky & Zhao 1994) with
    stratum-frequency propensities and GLOBAL per-arm outcome means —
    the estimator stays consistent if EITHER model is right, and with
    the deliberately coarse outcome model the IPW correction terms
    are non-trivial (a saturated per-stratum outcome model would make
    them vanish identically and reduce to :func:`ipw_estimate`):

        ATE = (1/N) Σᵢ [ μ̂₁ − μ̂₀ + tᵢ(yᵢ−μ̂₁)/ê_s − (1−tᵢ)(yᵢ−μ̂₀)/(1−ê_s) ]

    μ̂ₐ the global arm means, ê_s = n_{1s}/n_s.  Summed per stratum in
    closed form from exact int64 cells (n_s, n1_s, sy1_s, sy0_s), the
    per-stratum float terms folded in ascending-stratum order.
    Positivity-violating strata (one arm empty) are dropped AND
    counted, the :func:`ipw_estimate` convention.  Returns one row:
    (n, n_used, n_used_strata, n_dropped_rows, mu1, mu0, ate_aipw).
    """
    base = df.select(
        F.col(stratum_col).cast("long").alias("s"),
        F.col(treat_col).cast("long").alias("t"),
        F.col(outcome_col).cast("long").alias("y"))
    per_s = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("t").alias("n1"),
        F.sum(F.col("t") * F.col("y")).alias("sy1"),
        F.sum((1 - F.col("t")) * F.col("y")).alias("sy0"))
    per_s = per_s.withColumn(
        "ok", (F.col("n1") > 0) & (F.col("n1") < F.col("n_s")))
    agg = per_s.agg(
        F.sum("n_s").alias("n"),
        F.sum(F.when(F.col("ok"), F.col("n_s")).otherwise(F.lit(0)))
        .alias("n_used"),
        F.sum(F.col("ok").cast("long")).alias("n_used_strata"),
        F.sum(F.when(F.col("ok"), F.col("n1")).otherwise(F.lit(0)))
        .alias("g_n1"),
        F.sum(F.when(F.col("ok"), F.col("sy1")).otherwise(F.lit(0)))
        .alias("g_sy1"),
        F.sum(F.when(F.col("ok"), F.col("sy0")).otherwise(F.lit(0)))
        .alias("g_sy0"),
        F.sort_array(F.collect_list(F.when(F.col("ok"), F.struct(
            F.col("s").alias("s"), F.col("n_s").alias("n_s"),
            F.col("n1").alias("n1"), F.col("sy1").alias("sy1"),
            F.col("sy0").alias("sy0"))))).alias("cells"))

    def dd(x):
        return x.cast("double")

    nu = F.col("n_used").cast("double")
    mu1 = dd(F.col("g_sy1")) / dd(F.col("g_n1"))
    mu0 = dd(F.col("g_sy0")) / (nu - dd(F.col("g_n1")))
    # Σ_s [ (sy1_s − n1_s·μ̂₁)·n_s/n1_s − (sy0_s − n0_s·μ̂₀)·n_s/n0_s ]
    corr = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc
        + (dd(e["sy1"]) - dd(e["n1"]) * mu1)
        * dd(e["n_s"]) / dd(e["n1"])
        - (dd(e["sy0"]) - dd(e["n_s"] - e["n1"]) * mu0)
        * dd(e["n_s"]) / dd(e["n_s"] - e["n1"]))
    ok_any = F.col("n_used") > 0
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_used").cast("long").alias("n_used"),
        F.col("n_used_strata").cast("long").alias("n_used_strata"),
        (F.col("n") - F.col("n_used")).cast("long")
        .alias("n_dropped_rows"),
        F.when(ok_any, mu1).alias("mu1"),
        F.when(ok_any, mu0).alias("mu0"),
        F.when(ok_any, mu1 - mu0 + corr / nu).alias("ate_aipw"))


def breslow_day(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
) -> DataFrame:
    """Breslow–Day homogeneity test (Breslow & Day 1980 §IV.4) — the
    companion question to :func:`mantel_haenszel`: is the odds ratio
    actually CONSTANT across strata (if not, the pooled OR is the
    wrong summary)?  Under the common OR ψ = OR_MH the expected
    a-cell per stratum solves the quadratic

        (1−ψ)·â² + [(n−r1−c1) + ψ(r1+c1)]·â − ψ·r1·c1 = 0

    (the root inside [max(0, r1+c1−n), min(r1, c1)] — both roots are
    evaluated and the valid one selected by the identical float
    comparisons in either engine; ψ = 1 degenerates to the linear
    â = r1·c1/n), with variance V = 1/(1/â + 1/b̂ + 1/ĉ + 1/d̂) and

        χ²_BD = Σ_s (a_s − â_s)² / V_s,   df = (#used strata) − 1

    Strata with any zero margin (the expected cells degenerate) are
    dropped AND counted, the module convention.  All cells exact
    int64; ψ comes from the same ascending-stratum folds as
    mantel_haenszel and every per-stratum float term folds in the
    same order.  Returns one row: (n, n_used_strata, n_dropped_rows,
    or_mh, chi2_bd, df)."""
    base = df.select(
        F.col(stratum_col).cast("long").alias("s"),
        F.col(treat_col).cast("long").alias("t"),
        F.col(outcome_col).cast("long").alias("y"))
    per_s = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum(F.col("t") * F.col("y")).alias("a"),
        F.sum(F.col("t") * (1 - F.col("y"))).alias("b"),
        F.sum((1 - F.col("t")) * F.col("y")).alias("c"),
        F.sum((1 - F.col("t")) * (1 - F.col("y"))).alias("d"))
    ok = ((F.col("a") + F.col("b") > 0)
          & (F.col("c") + F.col("d") > 0)
          & (F.col("a") + F.col("c") > 0)
          & (F.col("b") + F.col("d") > 0))
    per_s = per_s.withColumn("ok", ok)
    agg = per_s.agg(
        F.sum("n_s").alias("n"),
        F.sum(F.col("ok").cast("long")).alias("n_used_strata"),
        F.sum(F.when(F.col("ok"), F.lit(0)).otherwise(F.col("n_s")))
        .alias("n_dropped_rows"),
        F.sort_array(F.collect_list(F.when(F.col("ok"), F.struct(
            F.col("s").alias("s"), F.col("n_s").alias("n_s"),
            F.col("a").alias("a"), F.col("b").alias("b"),
            F.col("c").alias("c"), F.col("d").alias("d")))))
        .alias("cells"))

    def dd(x):
        return x.cast("double")

    r_sum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc + dd(e["a"] * e["d"]) / dd(e["n_s"]))
    s_sum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc + dd(e["b"] * e["c"]) / dd(e["n_s"]))
    psi = r_sum / s_sum

    def bd_term(e):
        n = dd(e["n_s"])
        r1 = dd(e["a"] + e["b"])
        c1 = dd(e["a"] + e["c"])
        aq = F.lit(1.0) - psi
        bq = (n - r1 - c1) + psi * (r1 + c1)
        cq = -psi * r1 * c1
        disc = F.sqrt(bq * bq - 4.0 * aq * cq)
        root1 = (-bq + disc) / (2.0 * aq)
        root2 = (-bq - disc) / (2.0 * aq)
        lin = r1 * c1 / n
        lo = F.greatest(F.lit(0.0), r1 + c1 - n)
        hi = F.least(r1, c1)
        a_hat = F.when(aq == 0.0, lin).otherwise(
            F.when((root1 >= lo) & (root1 <= hi), root1)
            .otherwise(root2))
        b_hat = r1 - a_hat
        c_hat = c1 - a_hat
        d_hat = n - r1 - c1 + a_hat
        v = 1.0 / (1.0 / a_hat + 1.0 / b_hat
                   + 1.0 / c_hat + 1.0 / d_hat)
        dev = dd(e["a"]) - a_hat
        return dev * dev / v

    chi2 = F.aggregate("cells", F.lit(0.0),
                       lambda acc, e: acc + bd_term(e))
    any_used = F.col("n_used_strata") > 1
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_used_strata").cast("long").alias("n_used_strata"),
        F.col("n_dropped_rows").cast("long").alias("n_dropped_rows"),
        F.when(s_sum > 0.0, psi).alias("or_mh"),
        F.when(any_used & (s_sum > 0.0), chi2).alias("chi2_bd"),
        F.when(any_used, F.col("n_used_strata") - 1)
        .cast("long").alias("df"))


def mediation(df: DataFrame, x_col: str, m_col: str,
              y_col: str) -> DataFrame:
    """Baron–Kenny mediation with the Sobel test (Baron & Kenny 1986;
    Sobel 1982) — how much of x's effect on y flows THROUGH the
    mediator m:

        m = α₀ + a·x            (stage 1)
        y = β₀ + b·m + c·x      (stage 2: direct c, indirect a·b)
        Sobel z = a·b / sqrt(a²·se_b² + b²·se_a²)

    Everything comes from ONE aggregate of exact int64 moments over
    (x, m, y): a and se_a from the simple-OLS closed forms
    (the :func:`..regress.cooks_distance` conventions), b/c and se_b
    from the centered 2×2 normal equations by Cramer — every
    estimate ONE mirrored float expression.  Columns integer-valued
    (cents convention).  Degenerate designs (n < 4, zero Sxx or a
    singular 2×2) yield NULL estimates.  Returns one row: (n, a, b,
    c_direct, indirect, sobel_se, sobel_z, prop_mediated)."""
    base = df.select(F.col(x_col).cast("long").alias("x"),
                     F.col(m_col).cast("long").alias("m"),
                     F.col(y_col).cast("long").alias("y"))
    aggs = [F.count(F.lit(1)).alias("n")]
    cols = ["x", "m", "y"]
    for i, a_ in enumerate(cols):
        aggs.append(F.sum(a_).alias(f"s_{a_}"))
        for b_ in cols[i:]:
            aggs.append(F.sum(F.col(a_) * F.col(b_))
                        .alias(f"s_{a_}{b_}"))
    st = base.agg(*aggs)

    def dd(c):
        return F.col(c).cast("double")

    nd = dd("n")

    def cc(p, q):
        key = f"s_{p}{q}" if f"s_{p}{q}" in st.columns else f"s_{q}{p}"
        return dd(key) - dd(f"s_{p}") * dd(f"s_{q}") / nd

    cxx, cxm, cxy = cc("x", "x"), cc("x", "m"), cc("x", "y")
    cmm, cmy, cyy = cc("m", "m"), cc("m", "y"), cc("y", "y")
    a_hat = cxm / cxx
    sse_m = cmm - a_hat * cxm
    se_a2 = (sse_m / (nd - 2.0)) / cxx
    det = cmm * cxx - cxm * cxm
    b_hat = (cmy * cxx - cxy * cxm) / det
    c_hat = (cxy * cmm - cmy * cxm) / det
    sse_y = cyy - b_hat * cmy - c_hat * cxy
    s2 = sse_y / (nd - 3.0)
    se_b2 = s2 * cxx / det
    ind = a_hat * b_hat
    sob_se = F.sqrt(a_hat * a_hat * se_b2 + b_hat * b_hat * se_a2)
    ok = (F.col("n") >= 4) & (cxx > 0.0) & (det > 0.0) \
        & (sob_se > 0.0)
    prop = F.when(ind + c_hat != 0.0, ind / (ind + c_hat))
    return st.select(
        F.col("n").cast("long").alias("n"),
        F.when(ok, a_hat).alias("a"),
        F.when(ok, b_hat).alias("b"),
        F.when(ok, c_hat).alias("c_direct"),
        F.when(ok, ind).alias("indirect"),
        F.when(ok, sob_se).alias("sobel_se"),
        F.when(ok, ind / sob_se).alias("sobel_z"),
        F.when(ok, prop).alias("prop_mediated"))
