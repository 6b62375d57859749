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
