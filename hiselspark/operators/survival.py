"""Kaplan–Meier survival estimation over (cohort, duration, event)
rows — time-to-event analytics (retention, time-to-churn,
time-to-next-purchase) with right-censoring handled correctly, which
is exactly what a naive "average gap" gets wrong: censored subjects
carry information ("survived at least this long") that dropping or
truncating them destroys.

Shape at scale: one ``groupBy(cohort, duration)`` pass reduces the
10^12 input rows to one row per (cohort, distinct duration) — with
durations quantized (days, hours) that table is tiny — then the
at-risk counts and the survival product are windows over it, ordered
by duration within each cohort.  The product
``S(t) = Π_{tⱼ ≤ t} (1 − dⱼ/nⱼ)`` is evaluated as an ordered fold over
the frame-ordered factor list (the engine's deterministic-float
convention: same fold replays in SQL via ``list_reduce``), and every
``dⱼ``/``nⱼ`` is an exact integer — so the curve is bit-reproducible
across partitionings and engines.
Reference parity note: the reference engine (transferwise/hisel) has no
survival-analysis layer — this module belongs to the grafted time-to-
event analytics surface of the engine (north rule), alongside the point-
in-time operators.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def km_curve(df: DataFrame, cohort_col: str, duration_col: str,
             event_col: str) -> DataFrame:
    """One row per (cohort, distinct duration) with ``n_at_risk``
    (subjects with duration ≥ t), ``n_events`` / ``n_censored`` at t,
    and the Kaplan–Meier ``survival`` estimate just after t.
    ``duration_col`` must be integer-quantized; ``event_col`` is 1 for
    an observed event, 0 for right-censoring at that duration."""
    ev = F.col(event_col).cast("long")
    per = (df.groupBy(cohort_col, duration_col)
             .agg(F.sum(ev).alias("n_events"),
                  (F.count(ev) - F.sum(ev)).alias("n_censored")))
    wc = Window.partitionBy(cohort_col)
    w_before = (Window.partitionBy(cohort_col).orderBy(duration_col)
                      .rowsBetween(Window.unboundedPreceding, -1))
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(wc)
    gone = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_before),
        F.lit(0))
    per = per.withColumn("n_at_risk", (total - gone).cast("long"))
    factor = (1.0 - F.col("n_events").cast("double")
              / F.col("n_at_risk").cast("double"))
    w_run = (Window.partitionBy(cohort_col).orderBy(duration_col)
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
    surv = F.aggregate(F.collect_list(factor).over(w_run),
                       F.lit(1.0), lambda acc, x: acc * x)
    return (per.withColumn("survival", surv)
               .select(cohort_col, duration_col, "n_at_risk",
                       "n_events", "n_censored", "survival"))


def nelson_aalen(df: DataFrame, cohort_col: str, duration_col: str,
                 event_col: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator: one row per
    (cohort, distinct duration) with ``n_at_risk``, ``n_events`` and
    ``cumhaz = Σ_{tⱼ ≤ t} dⱼ/nⱼ`` — the non-parametric twin of
    :func:`km_curve` that estimates H(t) instead of S(t) (and is the
    better-behaved quantity under heavy censoring; Aalen 1978).

    Same scale shape as :func:`km_curve`: one groupBy collapses the
    input to the per-(cohort, duration) count table, at-risk counts
    are exact-integer windows over it, and the cumulative sum of the
    float hazard increments is evaluated as an ordered fold over the
    frame-ordered list so it replays bit-identically in SQL via
    ``list_reduce``.  The reference engine (transferwise/hisel) has no
    survival layer — grafted surface."""
    ev = F.col(event_col).cast("long")
    per = (df.groupBy(cohort_col, duration_col)
             .agg(F.sum(ev).alias("n_events"),
                  (F.count(ev) - F.sum(ev)).alias("n_censored")))
    wc = Window.partitionBy(cohort_col)
    w_before = (Window.partitionBy(cohort_col).orderBy(duration_col)
                      .rowsBetween(Window.unboundedPreceding, -1))
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(wc)
    gone = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_before),
        F.lit(0))
    per = per.withColumn("n_at_risk", (total - gone).cast("long"))
    inc = (F.col("n_events").cast("double")
           / F.col("n_at_risk").cast("double"))
    w_run = (Window.partitionBy(cohort_col).orderBy(duration_col)
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
    cumhaz = F.aggregate(F.collect_list(inc).over(w_run),
                         F.lit(0.0), lambda acc, x: acc + x)
    return (per.withColumn("cumhaz", cumhaz)
               .select(cohort_col, duration_col, "n_at_risk",
                       "n_events", "n_censored", "cumhaz"))


def logrank_test(df: DataFrame, group_col: str, duration_col: str,
                 event_col: str, a_label, b_label) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966; Peto & Peto 1972) — THE
    test for "do these two survival curves differ", completing this
    module's km_curve / nelson_aalen estimators: at each distinct
    event time the observed group-A events are compared with the
    hypergeometric expectation

        E_A(t) = d_t·n_A(t)/n(t)
        V(t)   = d_t·(n_A/n)·(n_B/n)·(n−d_t)/(n−1)
        χ²     = (O_A − E_A)² / ΣV,   p = erfc(√(χ²/2))

    Every per-time count (events and at-risk per arm) is an exact
    int64 off the per-(duration) count table — one groupBy collapses
    the rows, the at-risk counts are windows over the (tiny,
    duration-quantized) table; the E and V accumulations are ordered
    folds over the duration-sorted struct list so both engines add
    identical doubles in identical order, and the A-S 7.1.26 erfc
    gives the 1-df p-value (the srm_check/mcnemar convention).
    Times with n(t) ≤ 1 or d_t = 0 contribute nothing (their V term
    is 0/undefined), matching the textbook estimator.  Returns one
    row: (n_a, n_b, o_a, e_a, var_sum, chi2, p_value); chi2/p NULL
    when ΣV = 0 (no comparable event times)."""
    isa = (F.col(group_col) == a_label)
    isb = (F.col(group_col) == b_label)
    ev = F.col(event_col).cast("long")
    per = (df.filter((isa | isb)
                     & F.col(duration_col).isNotNull())
             .groupBy(F.col(duration_col).alias("t"))
             .agg(F.sum(F.when(isa, ev).otherwise(F.lit(0)))
                  .alias("d_a"),
                  F.sum(F.when(isb, ev).otherwise(F.lit(0)))
                  .alias("d_b"),
                  F.sum(isa.cast("long")).alias("c_a"),
                  F.sum(isb.cast("long")).alias("c_b")))
    w_before = (Window.orderBy("t")
                      .rowsBetween(Window.unboundedPreceding, -1))
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    per = (per
           .withColumn("tot_a", F.sum("c_a").over(wt))
           .withColumn("tot_b", F.sum("c_b").over(wt))
           .withColumn("gone_a", F.coalesce(
               F.sum("c_a").over(w_before), F.lit(0)))
           .withColumn("gone_b", F.coalesce(
               F.sum("c_b").over(w_before), F.lit(0)))
           .withColumn("n_a_t", F.col("tot_a") - F.col("gone_a"))
           .withColumn("n_b_t", F.col("tot_b") - F.col("gone_b")))
    d_t = (F.col("d_a") + F.col("d_b")).cast("double")
    n_t = (F.col("n_a_t") + F.col("n_b_t")).cast("double")
    na = F.col("n_a_t").cast("double")
    nb = F.col("n_b_t").cast("double")
    use = (F.col("d_a") + F.col("d_b") > 0) & (n_t > 1.0)
    eterm = F.when(use, d_t * na / n_t).otherwise(F.lit(0.0))
    vterm = F.when(use,
                   d_t * (na / n_t) * (nb / n_t)
                   * (n_t - d_t) / (n_t - 1.0)).otherwise(F.lit(0.0))
    agg = per.agg(
        F.max("tot_a").alias("n_a"), F.max("tot_b").alias("n_b"),
        F.sum("d_a").alias("o_a"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("t").alias("g"),
                    eterm.alias("e"), vterm.alias("v")))),
                lambda s: F.struct(s["e"].alias("e"),
                                   s["v"].alias("v"))),
            F.struct(F.lit(0.0).alias("se"), F.lit(0.0).alias("sv")),
            lambda acc, s: F.struct(
                (acc["se"] + s["e"]).alias("se"),
                (acc["sv"] + s["v"]).alias("sv"))).alias("f"))
    oa = F.col("o_a").cast("double")
    chi2 = F.when(F.col("f.sv") > 0.0,
                  (oa - F.col("f.se")) * (oa - F.col("f.se"))
                  / F.col("f.sv"))
    x = F.sqrt(chi2 / 2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (t * (0.254829592
            + t * (-0.284496736
            + t * (1.421413741
            + t * (-1.453152027 + t * 1.061405429)))))
    p_value = poly * F.exp(-(x * x))
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("o_a").cast("long").alias("o_a"),
        F.col("f.se").alias("e_a"),
        F.col("f.sv").alias("var_sum"),
        chi2.alias("chi2"), p_value.alias("p_value"))


def competing_risks(df: DataFrame, cohort_col: str, duration_col: str,
                    cause_col: str) -> DataFrame:
    """Aalen–Johansen cumulative incidence under TWO competing event
    causes (cause 1 / cause 2; 0 = censored) — the correct replacement
    for "1 − KM per cause" (which over-counts when risks compete):

        CIF_k(t) = Σ_{tⱼ ≤ t} S(tⱼ⁻) · d_kⱼ / nⱼ,
        S(t)     = Π_{tⱼ ≤ t} (1 − (d₁ⱼ + d₂ⱼ)/nⱼ)

    Same scale shape as :func:`nelson_aalen`: the per-(cohort,
    duration) count table, exact-integer at-risk windows, and ONE
    running-window prefix fold per row carrying the (S, cif₁, cif₂)
    struct — the cif terms use the PRE-step S (that is S(tⱼ⁻)), then
    S multiplies down; branch-free arithmetic only, so the DuckDB
    list_reduce replay is safe (the croston lesson) and bit-identical.
    CIF₁ + CIF₂ + S = 1 at every step by construction.  Returns one
    row per (cohort, duration): (cohort, duration, n_at_risk, d1, d2,
    n_censored, surv, cif1, cif2)."""
    cause = F.col(cause_col).cast("long")
    per = (df.groupBy(cohort_col, duration_col)
             .agg(F.sum((cause == 1).cast("long")).alias("d1"),
                  F.sum((cause == 2).cast("long")).alias("d2"),
                  F.sum((cause == 0).cast("long"))
                  .alias("n_censored")))
    wc = Window.partitionBy(cohort_col)
    w_before = (Window.partitionBy(cohort_col).orderBy(duration_col)
                      .rowsBetween(Window.unboundedPreceding, -1))
    gone_expr = (F.col("d1") + F.col("d2") + F.col("n_censored"))
    total = F.sum(gone_expr).over(wc)
    gone = F.coalesce(F.sum(gone_expr).over(w_before), F.lit(0))
    per = per.withColumn("n_at_risk", (total - gone).cast("long"))
    w_run = (Window.partitionBy(cohort_col).orderBy(duration_col)
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
    steps = F.collect_list(F.struct(
        F.col("d1").alias("d1"), F.col("d2").alias("d2"),
        F.col("n_at_risk").alias("n"))).over(w_run)
    zero = F.struct(F.lit(1.0).alias("s"), F.lit(0.0).alias("c1"),
                    F.lit(0.0).alias("c2"))

    def step(acc, e):
        nd = e["n"].cast("double")
        c1 = acc["c1"] + acc["s"] * (e["d1"].cast("double") / nd)
        c2 = acc["c2"] + acc["s"] * (e["d2"].cast("double") / nd)
        s = acc["s"] * (F.lit(1.0)
                        - (e["d1"] + e["d2"]).cast("double") / nd)
        return F.struct(s.alias("s"), c1.alias("c1"), c2.alias("c2"))

    fin = F.aggregate(steps, zero, step)
    return (per
            .withColumn("surv", fin["s"])
            .withColumn("cif1", fin["c1"])
            .withColumn("cif2", fin["c2"])
            .select(cohort_col, duration_col, "n_at_risk", "d1", "d2",
                    "n_censored", "surv", "cif1", "cif2"))


def rmst(df: DataFrame, cohort_col: str, duration_col: str,
         event_col: str, tau: int) -> DataFrame:
    """Restricted mean survival time RMST(τ) = ∫₀^τ S(t)dt per cohort
    (Royston & Parmar 2013) — the modern model-free survival estimand
    on top of :func:`km_curve` (mean time alive within the τ window;
    robust where median survival is undefined under heavy censoring):

        RMST = 1·min(t₁, τ) + Σᵢ Sᵢ·(min(tᵢ₊₁, τ) − min(tᵢ, τ))

    with S constant after the last observed time through τ (the
    standard KM extension, declared).  Per-step contributions come
    from ONE lead() window over the KM step table (no struct-
    accumulator fold), then sum in duration order via the sorted-list
    fold — both mirrored by the oracle.  ``tau`` integer in duration
    units.  Returns one row per cohort: (cohort, tau, n_subjects,
    rmst)."""
    km = km_curve(df, cohort_col, duration_col, event_col)
    t = F.col(duration_col).cast("double")
    tau_l = F.lit(float(int(tau)))
    w = Window.partitionBy(cohort_col).orderBy(duration_col)
    nxt = F.lead(duration_col).over(w).cast("double")
    contrib = (F.col("survival")
               * (F.least(F.coalesce(nxt, tau_l), tau_l)
                  - F.least(t, tau_l)))
    head = F.when(F.row_number().over(w) == 1,
                  F.least(t, tau_l)).otherwise(F.lit(0.0))
    stepped = km.select(
        F.col(cohort_col).alias("cohort"),
        F.col(duration_col).alias("t"),
        (F.col("n_events") + F.col("n_censored")).alias("cnt"),
        (head + contrib).alias("term"))
    agg = stepped.groupBy("cohort").agg(
        F.sum("cnt").alias("n_subjects"),
        F.array_sort(F.collect_list(F.struct(
            F.col("t").alias("t"), F.col("term").alias("term"))))
        .alias("cells"))
    total = F.aggregate("cells", F.lit(0.0),
                        lambda acc, e: acc + e["term"])
    return agg.select(
        F.col("cohort").alias(cohort_col),
        F.lit(int(tau)).cast("long").alias("tau"),
        F.col("n_subjects").cast("long").alias("n_subjects"),
        total.alias("rmst"))


def win_ratio(df: DataFrame, treat_col: str, duration_col: str,
              event_col: str) -> DataFrame:
    """Unmatched win ratio (Pocock et al., Eur Heart J 2012) — the
    composite-endpoint effect measure on top of this module's
    curves: every (treatment, control) pair is compared on
    time-to-event with censoring-aware determinability:

        i (treated) WINS  if d_j < d_i and subject j had the event
                          (j demonstrably failed first)
        i LOSES           symmetrically
        else TIE          (equal durations, or the earlier subject
                          was censored — indeterminate; declared)

        WR = wins / losses,   log-WR se = sqrt(1/wins + 1/losses)

    All pair counts collapse onto the (arm, duration, event) COUNT
    TABLE — O(V²) in distinct (duration, event) cells, never O(n·m)
    in subjects; exact int64 throughout, WR and the se one mirrored
    float expression each.  NULL WR when either wins or losses is 0.
    Returns one row: (n_treat, n_control, wins, losses, ties,
    win_ratio, se_log_wr)."""
    t = F.col(treat_col).cast("long")
    base = df.select(t.alias("t"),
                     F.col(duration_col).cast("long").alias("d"),
                     F.col(event_col).cast("long").alias("e"))
    cells = base.groupBy("t", "d", "e").agg(
        F.count(F.lit(1)).alias("c"))
    a = (cells.filter(F.col("t") == 1)
         .select(F.col("d").alias("da"), F.col("e").alias("ea"),
                 F.col("c").alias("ca")))
    b = (cells.filter(F.col("t") == 0)
         .select(F.col("d").alias("db"), F.col("e").alias("eb"),
                 F.col("c").alias("cb")))
    pairs = a.crossJoin(F.broadcast(b))
    win = ((F.col("db") < F.col("da")) & (F.col("eb") == 1))
    lose = ((F.col("da") < F.col("db")) & (F.col("ea") == 1))
    agg = pairs.agg(
        F.sum(F.when(win, F.col("ca") * F.col("cb")).otherwise(0))
        .alias("wins"),
        F.sum(F.when(lose, F.col("ca") * F.col("cb")).otherwise(0))
        .alias("losses"),
        F.sum(F.when(~win & ~lose,
                     F.col("ca") * F.col("cb")).otherwise(0))
        .alias("ties"))
    ns = base.agg(F.sum("t").alias("n_treat"),
                  (F.count(F.lit(1)) - F.sum("t")).alias("n_control"))
    j = agg.crossJoin(F.broadcast(ns))

    def dd(c):
        return F.col(c).cast("double")

    ok = (F.col("wins") > 0) & (F.col("losses") > 0)
    wr = F.when(ok, dd("wins") / dd("losses"))
    se = F.when(ok, F.sqrt(1.0 / dd("wins") + 1.0 / dd("losses")))
    return j.select(
        F.col("n_treat").cast("long").alias("n_treat"),
        F.col("n_control").cast("long").alias("n_control"),
        F.col("wins").cast("long").alias("wins"),
        F.col("losses").cast("long").alias("losses"),
        F.col("ties").cast("long").alias("ties"),
        wr.alias("win_ratio"), se.alias("se_log_wr"))
