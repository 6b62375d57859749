"""Distributed model-evaluation metrics — exact, engine-reproducible.

AUC is the one metric teams routinely get wrong at scale: sampling the
scores changes it, and a naive implementation sorts all 10^12 rows.
Here ROC-AUC is computed EXACTLY through the Mann–Whitney identity

    AUC = [ Σ_s neg_below(s)·pos(s) + ½·Σ_s pos(s)·neg(s) ] / (P·N)

over the per-distinct-score count table: one ``groupBy(score)`` over
the full data (map-side combined — the shuffle carries one row per
distinct score), then a running sum over the score-ordered count table.
With the engine's convention of integer-quantized scores the distinct
domain is bounded (e.g. 10⁴ buckets), so the single-task ordered scan
is over a tiny table no matter how many input rows — and every
intermediate is an exact integer, making the AUC bit-reproducible and
SQL-replayable.  Ties are handled exactly (the ½·pos·neg term — same
as average-rank).

``calibration_bins`` (reliability table) and ``confusion_at`` follow
the same shape: exact integer counts, one aggregation pass.
Reference parity note: the reference engine (transferwise/hisel) has no
model-evaluation layer — this module belongs to the grafted training-
pipeline surface of the engine (north rule), alongside the point-in-time
operators.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def binary_auc(df: DataFrame, score_col: str,
               label_col: str) -> DataFrame:
    """One row: ``(auc, n_pos, n_neg)``.  ``score_col`` must be an
    integer-quantized score (the quantization IS the ROC resolution);
    ``label_col`` is 0/1.  Exact — no sampling, no approximation
    beyond the caller's own score quantization."""
    lbl = F.col(label_col).cast("long")
    per = (df.groupBy(score_col)
             .agg(F.sum(lbl).alias("pos"),
                  (F.count(lbl) - F.sum(lbl)).alias("neg")))
    w = (Window.orderBy(score_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    per = per.withColumn("neg_below",
                         F.coalesce(F.sum("neg").over(w), F.lit(0)))
    return per.agg(
        ((F.sum(F.col("neg_below") * F.col("pos")).cast("double")
          + F.sum(F.col("pos") * F.col("neg")).cast("double") / 2.0)
         / (F.sum("pos").cast("double") * F.sum("neg").cast("double")))
        .alias("auc"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"))


def calibration_bins(df: DataFrame, score_col: str, label_col: str,
                     n_bins: int = 10, score_scale: int = 1000
                     ) -> DataFrame:
    """Reliability table: bin rows by quantized score (``score/scale``
    interpreted as a probability in [0, 1]), one row per non-empty bin
    with exact ``n``, ``n_pos``, mean predicted probability and
    observed positive fraction.  A calibrated model has
    ``mean_pred ≈ frac_pos`` per bin."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins / score_scale).cast("long"),
        F.lit(n_bins - 1))
    lbl = F.col(label_col).cast("long")
    return (df.withColumn("bin", b)
              .groupBy("bin")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(lbl).alias("n_pos"),
                   (F.sum(score_col).cast("double")
                    / (F.count(F.lit(1)) * float(score_scale)))
                   .alias("mean_pred"),
                   (F.sum(lbl).cast("double") / F.count(F.lit(1)))
                   .alias("frac_pos")))


def confusion_at(df: DataFrame, score_col: str, label_col: str,
                 threshold: int) -> DataFrame:
    """One row of exact confusion counts + derived precision / recall
    / F1 / accuracy at ``score >= threshold`` (same quantized-score
    units)."""
    pred = (F.col(score_col) >= threshold).cast("long")
    lbl = F.col(label_col).cast("long")
    agg = df.agg(
        F.sum(pred * lbl).alias("tp"),
        F.sum(pred * (1 - lbl)).alias("fp"),
        F.sum((1 - pred) * lbl).alias("fn"),
        F.sum((1 - pred) * (1 - lbl)).alias("tn"))
    tp, fp, fn, tn = (F.col(c).cast("double")
                      for c in ("tp", "fp", "fn", "tn"))
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    return agg.select(
        "tp", "fp", "fn", "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when((tp + fp > 0) & (tp + fn > 0) & (tp > 0),
               2.0 * (tp / (tp + fp)) * (tp / (tp + fn))
               / (tp / (tp + fp) + tp / (tp + fn))).alias("f1"),
        ((tp + tn) / (tp + fp + fn + tn)).alias("accuracy"))


def roc_curve(df: DataFrame, score_col: str,
              label_col: str) -> DataFrame:
    """The exact ROC polyline: one row per distinct score threshold
    (predict positive at ``score >= s``) with exact (fp, tp) counts
    and (fpr, tpr).  Same count-table shape as :func:`binary_auc` —
    the row count is bounded by the score quantization, never by the
    data."""
    lbl = F.col(label_col).cast("long")
    per = (df.groupBy(score_col)
             .agg(F.sum(lbl).alias("pos"),
                  (F.count(lbl) - F.sum(lbl)).alias("neg")))
    w = (Window.orderBy(F.col(score_col).desc())
               .rowsBetween(Window.unboundedPreceding,
                            Window.currentRow))
    g = Window.partitionBy()
    return (per.withColumn("tp", F.sum("pos").over(w))
               .withColumn("fp", F.sum("neg").over(w))
               .withColumn("tpr", F.col("tp")
                           / F.sum("pos").over(g))
               .withColumn("fpr", F.col("fp")
                           / F.sum("neg").over(g))
               .select(F.col(score_col).alias("threshold"),
                       "tp", "fp", "tpr", "fpr"))


def gini_concentration(df: DataFrame, group_col: str,
                       value_col: str) -> DataFrame:
    """Gini coefficient of how unevenly an integer measure is
    concentrated across groups (revenue per user, tokens per domain):
    0 = perfectly even, →1 = one group holds everything.  The
    inequality screen for "is this corpus dominated by a handful of
    sources".

    ``G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n`` over per-group totals sorted
    ascending (i = 1-based rank, ties broken by group id — exact and
    deterministic).  One groupBy reduces rows to one per group; the
    rank + weighted sum run on that (groups-sized) table; every term
    is an exact integer before two final divisions."""
    per = df.groupBy(group_col).agg(F.sum(value_col).alias("x"))
    w = Window.orderBy(F.col("x").asc(), F.col(group_col).asc())
    g = Window.partitionBy()
    ranked = per.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        ((F.lit(2.0) * F.sum(F.col("i") * F.col("x")).cast("double")
          / (F.count(F.lit(1)).cast("double")
             * F.sum("x").cast("double")))
         - (F.count(F.lit(1)) + 1).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("gini"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("x").alias("total"))


def auc_by_period(df: DataFrame, score_col: str, label_col: str,
                  period_col: str) -> DataFrame:
    """ROC-AUC per time slice — the model-degradation trend view
    ("the offline AUC was 0.81, what is it THIS week?").  One row per
    period with the same exact Mann–Whitney arithmetic as
    :func:`binary_auc`, computed for all periods in one pass: the
    count table is keyed by (period, score) and the score-ordered
    running sum partitions by period — so the plan scales with
    periods × distinct scores, never with rows.  Periods with no
    positives or no negatives yield NULL (AUC undefined)."""
    lbl = F.col(label_col).cast("long")
    per = (df.groupBy(period_col, score_col)
             .agg(F.sum(lbl).alias("pos"),
                  (F.count(lbl) - F.sum(lbl)).alias("neg")))
    w = (Window.partitionBy(period_col).orderBy(score_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    per = per.withColumn("neg_below",
                         F.coalesce(F.sum("neg").over(w), F.lit(0)))
    agg = per.groupBy(period_col).agg(
        F.sum(F.col("neg_below") * F.col("pos")).alias("u"),
        F.sum(F.col("pos") * F.col("neg")).alias("t"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"))
    auc = ((F.col("u").cast("double")
            + F.col("t").cast("double") / 2.0)
           / (F.col("n_pos").cast("double")
              * F.col("n_neg").cast("double")))
    return agg.select(
        period_col,
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc)
         .alias("auc"),
        "n_pos", "n_neg")


def retrieval_metrics(
    pred: DataFrame,
    truth: DataFrame,
    k: int = 10,
    probe_col: str = "probe_id",
    id_col: str = "vec_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Per-probe retrieval quality of a (possibly approximate) ranking
    against a relevance set: ``recall@k`` (= fraction of the truth set
    retrieved in the top k), ``precision@k``, and ``mrr`` (reciprocal
    rank of the first relevant hit, 0 if none) — how ANN indexes (LSH
    / IVF / PQ) are actually graded against the exact ranking.

    Both inputs are bounded per-probe ranking tables (probe, id,
    rank); the computation is one equi-join on (probe, id) + one
    aggregate per probe — counts and single divisions of exact
    integers, engine-reproducible.  Probes present in ``truth`` but
    retrieving nothing still appear (zero metrics)."""
    p = (pred.filter(F.col(rank_col) <= int(k))
             .select(F.col(probe_col).alias("probe"),
                     F.col(id_col).alias("doc"),
                     F.col(rank_col).alias("prk")))
    t = truth.select(F.col(probe_col).alias("probe"),
                     F.col(id_col).alias("doc"))
    n_rel = t.groupBy("probe").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = (p.join(t, ["probe", "doc"])
             .groupBy("probe")
             .agg(F.count(F.lit(1)).alias("n_hit"),
                  F.min("prk").alias("first_hit")))
    out = (n_rel.join(hits, "probe", "left")
                .withColumn("n_hit", F.coalesce("n_hit", F.lit(0))))
    return out.select(
        F.col("probe").alias(probe_col), "n_rel", "n_hit",
        (F.col("n_hit") / F.col("n_rel")).alias(f"recall_at_{k}"),
        (F.col("n_hit") / F.lit(float(k))).alias(f"precision_at_{k}"),
        F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)).alias("mrr"))


def cohen_kappa(df: DataFrame, rater1_col: str,
                rater2_col: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    categorical labelings (Cohen 1960): with observed agreement
    ``po = Σ_k c_kk / N`` and chance agreement
    ``pe = Σ_k row_k·col_k / N²``,

        κ = (po − pe) / (1 − pe) = (N·Σc_kk − Σrow·col)
                                   / (N² − Σrow·col)

    — the right-hand form keeps everything an exact integer until ONE
    division, so a second engine replays every digit.  The standard
    inter-annotator / model-vs-model agreement gate for label
    pipelines.

    Returns one row: (n, n_agree, chance_cross, kappa).  Scale shape:
    one map-side-combined ``groupBy`` over the (small) label-pair
    grid, two marginal reductions over that grid, one scalar output —
    the input is scanned once and never reshuffled.
    """
    cells = (df.groupBy(F.col(rater1_col).cast("long").alias("r1"),
                        F.col(rater2_col).cast("long").alias("r2"))
               .agg(F.count(F.lit(1)).alias("c")))
    rows = cells.groupBy("r1").agg(F.sum("c").alias("row_c"))
    cols = cells.groupBy("r2").agg(F.sum("c").alias("col_c"))
    marg = (rows.join(cols, rows.r1 == cols.r2)
            .select((F.col("row_c") * F.col("col_c")).alias("rc")))
    agg = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("r1") == F.col("r2"), F.col("c"))
              .otherwise(F.lit(0))).alias("n_agree"))
    cross = marg.agg(F.sum("rc").alias("chance_cross"))
    out = agg.crossJoin(cross)   # two single-row frames
    kappa = ((F.col("n") * F.col("n_agree")
              - F.col("chance_cross")).cast("double")
             / (F.col("n") * F.col("n")
                - F.col("chance_cross")).cast("double"))
    return out.select("n", "n_agree", "chance_cross",
                      kappa.alias("kappa"))


def best_f1_threshold(df: DataFrame, score_col: str,
                      label_col: str) -> DataFrame:
    """The decision threshold maximizing F1 over every distinct score
    (predict positive iff score ≥ t) — the operating-point picker that
    belongs next to :func:`roc_curve`/:func:`confusion_at`: exact
    suffix-sum counts over the distinct-score table (no row sort of
    the data, the AUC machinery's shape), F1 compared as identical
    doubles from exact integers, ties broken toward the HIGHEST
    threshold (the conservative operating point).  Returns one row:
    (threshold, tp, fp, fn, precision, recall, f1)."""
    per = (df.groupBy(F.col(score_col).cast("long").alias("s"))
           .agg(F.sum(F.col(label_col).cast("long")).alias("pos"),
                F.count(F.lit(1)).alias("tot")))
    w_ge = (Window.orderBy(F.col("s").desc())
            .rowsBetween(Window.unboundedPreceding,
                         Window.currentRow))
    g = Window.partitionBy()
    cur = (per
           .withColumn("tp", F.sum("pos").over(w_ge))
           .withColumn("pp", F.sum("tot").over(w_ge))
           .withColumn("p", F.sum("pos").over(g)))
    f1 = (F.lit(2.0) * F.col("tp").cast("double")
          / (F.col("pp") + F.col("p")).cast("double"))
    pick = (cur.withColumn("f1", f1)
            .groupBy()
            .agg(F.max(F.struct(
                F.col("f1").alias("f1"),
                F.col("s").alias("s"),
                F.col("tp").alias("tp"),
                F.col("pp").alias("pp"),
                F.col("p").alias("p"))).alias("b")))
    return pick.select(
        F.col("b.s").alias("threshold"),
        F.col("b.tp").alias("tp"),
        (F.col("b.pp") - F.col("b.tp")).alias("fp"),
        (F.col("b.p") - F.col("b.tp")).alias("fn"),
        (F.col("b.tp").cast("double")
         / F.col("b.pp").cast("double")).alias("precision"),
        (F.col("b.tp").cast("double")
         / F.col("b.p").cast("double")).alias("recall"),
        F.col("b.f1").alias("f1"))


def lift_table(df: DataFrame, score_col: str, label_col: str,
               id_col: str, n_buckets: int = 10) -> DataFrame:
    """Decile lift / cumulative-gains table — the campaign-targeting
    view of a ranker: sort by score descending, cut into
    ``n_buckets`` equal-count buckets, and report per bucket the
    exact positives, cumulative capture rate and cumulative lift
    (response rate of the top-k buckets over the base rate).

    Determinism: NTILE over ties is order-dependent, so the bucket
    order is (score DESC, id ASC) with ``id_col`` a unique id — the
    standard engine convention for rank cuts.  Bucket boundaries are
    the exact NTILE rule (first ``n mod B`` buckets get the extra
    row).  Counts are exact integers; rates/lift are one mirrored
    float expression each.

    Shape: the rank is computed off the distinct-(score,id) order —
    a single unpartitioned window over the scored frame.  For a
    bounded evaluation frame that is the exact contract (same as
    ``roc_curve``/``exact_quantiles``); at corpus scale cut on an
    approximate-quantile score histogram instead.

    Returns (bucket, n, pos, cum_n, cum_pos, response_rate,
    cum_capture, cum_lift).
    """
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    bucketed = df.select(
        F.col(label_col).cast("long").alias("y"),
        F.ntile(int(n_buckets)).over(w).alias("bucket"))
    per = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("pos"))
    wc = (Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy()
    cur = per.select(
        "bucket", "n", "pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wall).alias("tot_n"),
        F.sum("pos").over(wall).alias("tot_pos"))

    def d(c):
        return F.col(c).cast("double")

    return cur.select(
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.col("pos").cast("long").alias("pos"),
        F.col("cum_n").cast("long").alias("cum_n"),
        F.col("cum_pos").cast("long").alias("cum_pos"),
        (d("pos") / d("n")).alias("response_rate"),
        F.when(F.col("tot_pos") > 0,
               d("cum_pos") / d("tot_pos")).alias("cum_capture"),
        F.when(F.col("tot_pos") > 0,
               (d("cum_pos") / d("cum_n"))
               / (d("tot_pos") / d("tot_n"))).alias("cum_lift"))


def brier_decomposition(df: DataFrame, prob_col: str, label_col: str,
                        denom: int = 100) -> DataFrame:
    """Murphy decomposition of the Brier score for a probabilistic
    binary forecast quantized to an exact grid ``k/denom``:

        BS = REL − RES + UNC
        REL = Σ_k n_k·(p_k − o_k)²/N   (reliability: calibration gap)
        RES = Σ_k n_k·(o_k − ō)²/N     (resolution: discrimination)
        UNC = ō·(1 − ō)                 (irreducible base-rate noise)

    grouped by the distinct forecast value p_k (the finest-grained —
    and only decomposition-exact — binning).  ``prob_col`` must be
    the INTEGER numerator k (0..denom): the engine's exact-grid
    convention, so every group count/positive sum is an exact
    integer, p_k = k/denom is one division, and the Σ folds run over
    groups in sorted-k order — bit-identical and SQL-replayable.
    The Brier score itself is computed EXACTLY as an integer:
    Σ (k − denom·y)² / denom², so the REL − RES + UNC identity is
    verifiable to float precision against an independently exact BS.

    Returns one row: (n, n_groups, brier, rel, res, unc).
    """
    k = F.col(prob_col).cast("long")
    y = F.col(label_col).cast("long")
    base = df.select(k.alias("k"), y.alias("y"))
    per = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("y").alias("pos_k"),
        F.sum((F.col("k") - F.lit(int(denom)) * F.col("y"))
              * (F.col("k") - F.lit(int(denom)) * F.col("y")))
         .alias("sq_k"))
    agg = per.agg(
        F.sum("n_k").alias("n"),
        F.count(F.lit(1)).alias("g"),
        F.sum("pos_k").alias("pos"),
        F.sum("sq_k").alias("sq"),
        F.sort_array(F.collect_list(F.struct(
            F.col("k").alias("k"), F.col("n_k").alias("n_k"),
            F.col("pos_k").alias("pos_k")))).alias("cells"))

    def d(c):
        return F.col(c).cast("double")

    n = d("n")
    obar = d("pos") / n
    dd = float(denom)
    rel = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, c: acc + c["n_k"].cast("double")
        * (c["k"].cast("double") / F.lit(dd)
           - c["pos_k"].cast("double") / c["n_k"].cast("double"))
        * (c["k"].cast("double") / F.lit(dd)
           - c["pos_k"].cast("double") / c["n_k"].cast("double")))
    res = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, c: acc + c["n_k"].cast("double")
        * (c["pos_k"].cast("double") / c["n_k"].cast("double") - obar)
        * (c["pos_k"].cast("double") / c["n_k"].cast("double") - obar))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("g").cast("long").alias("n_groups"),
        (d("sq") / (n * F.lit(dd * dd))).alias("brier"),
        (rel / n).alias("rel"),
        (res / n).alias("res"),
        (obar * (F.lit(1.0) - obar)).alias("unc"))


def uplift_deciles(df: DataFrame, score_col: str, treat_col,
                   label_col: str, id_col: str,
                   n_buckets: int = 10) -> DataFrame:
    """Uplift-by-decile table: rank everyone by the model score
    (deterministic NTILE cuts — score DESC, id ASC), then per decile
    report treatment/control response rates and their difference

        uplift_b = resp_t(b)/n_t(b) − resp_c(b)/n_c(b)

    plus the cumulative uplift — how incremental-lift models (and
    A/B-targeting policies) are actually graded (Radcliffe's Qini
    view at decile granularity).  Counts are exact integers; rates
    and uplift are one mirrored float expression; NULL where a decile
    lacks one arm entirely.

    Same single-window rank shape (bounded evaluation frame contract)
    as :func:`lift_table`.  Returns (bucket, n_t, n_c, resp_t,
    resp_c, rate_t, rate_c, uplift, cum_uplift).
    """
    treat = treat_col if not isinstance(treat_col, str) \
        else F.col(treat_col)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    bucketed = df.select(
        F.col(label_col).cast("long").alias("y"),
        treat.cast("boolean").alias("t"),
        F.ntile(int(n_buckets)).over(w).alias("bucket"))
    per = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("t"), 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(~F.col("t"), 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("t"), F.col("y")).otherwise(0))
         .alias("resp_t"),
        F.sum(F.when(~F.col("t"), F.col("y")).otherwise(0))
         .alias("resp_c"))
    wc = (Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0))
    cur = per.select(
        "bucket", "n_t", "n_c", "resp_t", "resp_c",
        F.sum("n_t").over(wc).alias("cnt"),
        F.sum("n_c").over(wc).alias("cnc"),
        F.sum("resp_t").over(wc).alias("crt"),
        F.sum("resp_c").over(wc).alias("crc"))

    def d(c):
        return F.col(c).cast("double")

    rate_t = F.when(F.col("n_t") > 0, d("resp_t") / d("n_t"))
    rate_c = F.when(F.col("n_c") > 0, d("resp_c") / d("n_c"))
    cum = F.when((F.col("cnt") > 0) & (F.col("cnc") > 0),
                 d("crt") / d("cnt") - d("crc") / d("cnc"))
    return cur.select(
        "bucket",
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_c").cast("long").alias("n_c"),
        F.col("resp_t").cast("long").alias("resp_t"),
        F.col("resp_c").cast("long").alias("resp_c"),
        rate_t.alias("rate_t"), rate_c.alias("rate_c"),
        F.when(rate_t.isNotNull() & rate_c.isNotNull(),
               rate_t - rate_c).alias("uplift"),
        cum.alias("cum_uplift"))


def average_precision(df: DataFrame, score_col: str,
                      label_col: str) -> DataFrame:
    """One row ``(ap, n_pos, n_neg)``: average precision (area under
    the precision-recall curve with step interpolation — what
    sklearn's ``average_precision_score`` computes):

        AP = Σ_k (ΔTP_k / P) · precision_k

    over distinct score thresholds in DESCENDING order (predict
    positive at score ≥ s, ties share a threshold group).  Built on
    the same count-table shape as :func:`binary_auc` — the heavy data
    reduces to one (score → pos, neg) table bounded by the score
    quantization.  The per-threshold terms are rationals of exact
    BIGINT counts; their sum is folded in ascending-threshold order
    via the collected struct list (addition order fixed → the double
    is bit-reproducible and the SQL oracle replays it term-for-term).
    """
    lbl = F.col(label_col).cast("long")
    per = (df.groupBy(score_col)
             .agg(F.sum(lbl).alias("pos"),
                  (F.count(lbl) - F.sum(lbl)).alias("neg")))
    w = (Window.orderBy(F.col(score_col).desc())
               .rowsBetween(Window.unboundedPreceding,
                            Window.currentRow))
    per = (per.withColumn("tp", F.sum("pos").over(w))
              .withColumn("fp", F.sum("neg").over(w))
              .withColumn(
                  "term",
                  (F.col("pos").cast("double")
                   * F.col("tp").cast("double"))
                  / (F.col("tp") + F.col("fp")).cast("double")))
    folded = per.agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct(
                    F.col(score_col).alias("s"),
                    F.col("term").alias("t")))),
                lambda x: x["t"]),
            F.lit(0.0), lambda acc, t: acc + t).alias("sum_terms"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"))
    return folded.select(
        (F.col("sum_terms") / F.col("n_pos").cast("double"))
        .alias("ap"), "n_pos", "n_neg")


def feature_auc_scan(df: DataFrame, feature_cols, label_col: str,
                     descending: bool = False) -> DataFrame:
    """Target-leakage scan: the exact single-feature AUC of EVERY
    listed feature against the label, all in one pass — a feature
    whose raw values rank the label near-perfectly (AUC ≈ 1 or ≈ 0)
    is leaking the target (post-outcome fields, join keys, encoded
    labels), the classic silent killer of offline metrics.

    One melt (explode of (feature, value) structs — row count ×
    n_features, declared) then the :func:`binary_auc` count-table
    arithmetic PARTITIONED BY FEATURE: per (feature, value) exact
    pos/neg counts, one cumulative window per feature, the exact
    rational AUC at the end.  One hash shuffle on (feature, value);
    NULL feature values are dropped per feature (their rows still
    count for other features).

    Returns one row per feature: (feature, auc, n_pos, n_neg,
    n_distinct) — interpret max(auc, 1−auc) as leak severity.
    """
    lbl = F.col(label_col).cast("long")
    melted = df.select(
        lbl.alias("_y"),
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("f"),
                     F.col(c).cast("double").alias("v"))
            for c in feature_cols])).alias("_fv"))
    per = (melted.select("_y", F.col("_fv.f").alias("f"),
                         F.col("_fv.v").alias("v"))
                 .filter(F.col("v").isNotNull())
                 .groupBy("f", "v")
                 .agg(F.sum("_y").alias("pos"),
                      (F.count("_y") - F.sum("_y")).alias("neg")))
    w = (Window.partitionBy("f").orderBy("v")
               .rowsBetween(Window.unboundedPreceding, -1))
    per = per.withColumn("neg_below",
                         F.coalesce(F.sum("neg").over(w), F.lit(0)))
    out = per.groupBy("f").agg(
        ((F.sum(F.col("neg_below") * F.col("pos")).cast("double")
          + F.sum(F.col("pos") * F.col("neg")).cast("double") / 2.0)
         / (F.sum("pos").cast("double")
            * F.sum("neg").cast("double"))).alias("auc"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.count(F.lit(1)).alias("n_distinct"))
    return out.select(F.col("f").alias("feature"), "auc",
                      "n_pos", "n_neg", "n_distinct")


def anova_f(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One-way ANOVA F statistic across the groups of ``group_col``
    over an integer-quantized ``value_col`` — the parametric
    between/within variance-ratio test completing this module's
    two-sample suite (welch_ttest, kruskal_wallis, mann_whitney
    generalize to two groups; this one handles k).

    Per-group sufficient statistics (n, Σx, Σx²) are exact int64 from
    one map-side-combined groupBy; the between-group sum Σ_g sᵍ²/nᵍ is
    a float, so it is evaluated as an ordered fold over the
    group-key-ordered list (the engine's deterministic-float
    convention — replays via ``list_reduce`` in SQL).  Output is one
    row: k, n, ss_between, ss_within, f_stat (NULL when there is no
    within-group variance or fewer than 2 groups)."""
    v = F.col(value_col).cast("long")
    per = (df.filter(F.col(value_col).isNotNull())
             .groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("n_g"),
                  F.sum(v).alias("s_g"),
                  F.sum(v * v).alias("q_g")))
    term = (F.col("s_g").cast("double") * F.col("s_g").cast("double")
            / F.col("n_g").cast("double"))
    terms = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col(group_col).alias("g"),
                             term.alias("t")))),
                lambda s: s["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("sum_s2n"))
    n = F.col("n").cast("double")
    grand = (F.col("s").cast("double") * F.col("s").cast("double")) / n
    ssb = F.col("sum_s2n") - grand
    ssw = F.col("q").cast("double") - F.col("sum_s2n")
    k = F.col("k").cast("double")
    f_stat = F.when((F.col("k") >= 2) & (ssw > 0.0),
                    (ssb / (k - 1.0)) / (ssw / (n - k)))
    return terms.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        ssb.alias("ss_between"), ssw.alias("ss_within"),
        f_stat.alias("f_stat"))


def mcnemar_test(df: DataFrame, y1_col: str, y2_col: str) -> DataFrame:
    """McNemar's paired test (McNemar 1947) — THE test for comparing
    two classifiers on the same examples (Dietterich 1998): only the
    discordant pairs carry information, and with the continuity
    correction

        χ² = (|b − c| − 1)² / (b + c),   p = erfc(√(χ²/2))

    over b = #(model1 right, model2 wrong), c = #(model1 wrong,
    model2 right).  Both columns are 0/1 correctness indicators.
    One exact-integer count aggregate; χ² and the A-S 7.1.26 erfc
    p-value are one fixed float expression each (the same polynomial
    convention as srm_check/mann_whitney).  χ²/p are NULL when b+c=0
    (no discordant pairs — the models are indistinguishable here).
    Returns one row: (n, n00, n01, n10, n11, chi2, p_value)."""
    y1 = F.col(y1_col).cast("long")
    y2 = F.col(y2_col).cast("long")
    cnt = (df.filter(F.col(y1_col).isNotNull()
                     & F.col(y2_col).isNotNull())
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(((1 - y1) * (1 - y2))).alias("n00"),
                  F.sum(((1 - y1) * y2)).alias("n01"),
                  F.sum((y1 * (1 - y2))).alias("n10"),
                  F.sum((y1 * y2)).alias("n11")))
    b = F.col("n10").cast("double")
    c = F.col("n01").cast("double")
    chi2 = F.when(
        F.col("n10") + F.col("n01") > 0,
        (F.abs(b - c) - 1.0) * (F.abs(b - c) - 1.0) / (b + c))
    x = F.sqrt(chi2 / 2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (t * (0.254829592
            + t * (-0.284496736
            + t * (1.421413741
            + t * (-1.453152027 + t * 1.061405429)))))
    p_value = poly * F.exp(-(x * x))
    return cnt.select(
        F.col("n").cast("long").alias("n"),
        F.col("n00").cast("long").alias("n00"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n11").cast("long").alias("n11"),
        chi2.alias("chi2"), p_value.alias("p_value"))


def fleiss_kappa(df: DataFrame, item_col: str,
                 category_col: str) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected agreement of a
    FIXED number of raters assigning categorical labels per item (the
    multi-rater generalization of Cohen's kappa; the standard
    quality-control statistic for labeling/annotation pipelines):

        P̄  = (Σᵢⱼ nᵢⱼ² − N·n) / (N·n·(n−1))
        P̄e = Σⱼ (cⱼ / (N·n))²,   κ = (P̄ − P̄e) / (1 − P̄e)

    with nᵢⱼ the raters of item i choosing category j, N items, n
    raters per item, cⱼ the per-category totals.  Every sufficient
    statistic (Σnᵢⱼ², Σcⱼ², N, n) is an exact int64, so P̄, P̄e and κ
    are fixed float expressions — bit-reproducible and
    SQL-replayable.  κ is NULL when the per-item rater counts are
    unequal (Fleiss requires a constant panel size) or when P̄e = 1
    (a single category — agreement is vacuous).  Two count shuffles;
    linear.  Returns one row: (n_items, n_raters, p_bar, p_e,
    kappa)."""
    nij = (df.filter(F.col(item_col).isNotNull()
                     & F.col(category_col).isNotNull())
             .groupBy(item_col, category_col)
             .agg(F.count(F.lit(1)).alias("n_ij")))
    per_item = (nij.groupBy(item_col)
                   .agg(F.sum("n_ij").alias("n_i"),
                        F.sum(F.col("n_ij") * F.col("n_ij"))
                        .alias("sq_i")))
    per_cat = (nij.groupBy(category_col)
                  .agg(F.sum("n_ij").alias("c_j")))
    items = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min("n_i").alias("n_min"), F.max("n_i").alias("n_max"),
        F.sum("sq_i").alias("sum_sq"))
    tot = (F.col("n_items") * F.col("n_min")).cast("double")
    cats = per_cat.agg(
        F.sum(F.col("c_j") * F.col("c_j")).alias("sum_c2"))
    j = items.join(F.broadcast(cats))
    n_items = F.col("n_items").cast("double")
    n = F.col("n_min").cast("double")
    p_bar = F.when(
        (F.col("n_min") == F.col("n_max")) & (F.col("n_min") >= 2),
        (F.col("sum_sq").cast("double") - n_items * n)
        / (n_items * n * (n - 1.0)))
    p_e = F.col("sum_c2").cast("double") / (tot * tot)
    kappa = F.when(p_e < 1.0, (p_bar - p_e) / (1.0 - p_e))
    return j.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.when(F.col("n_min") == F.col("n_max"), F.col("n_min"))
         .cast("long").alias("n_raters"),
        p_bar.alias("p_bar"), p_e.alias("p_e"),
        kappa.alias("kappa"))


def mcc(df: DataFrame, y_true_col: str, y_pred_col: str) -> DataFrame:
    """Matthews correlation coefficient (Matthews 1975) — the
    single-number binary-classifier summary that stays honest under
    class imbalance (unlike accuracy/F1 it uses all four confusion
    cells symmetrically):

        MCC = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn))

    Both columns are 0/1 indicators.  The four cells come from ONE
    exact-integer count aggregate; the products are evaluated in
    double (mirrored in the SQL oracle — at 10¹²-row scale the cell
    products exceed int64, and the double expression is identical in
    both engines).  MCC is NULL when any marginal is empty (a
    degenerate confusion matrix carries no correlation).  Returns one
    row: (n, tp, fp, fn, tn, mcc)."""
    yt = F.col(y_true_col).cast("long")
    yp = F.col(y_pred_col).cast("long")
    cnt = (df.filter(F.col(y_true_col).isNotNull()
                     & F.col(y_pred_col).isNotNull())
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(yt * yp).alias("tp"),
                  F.sum((1 - yt) * yp).alias("fp"),
                  F.sum(yt * (1 - yp)).alias("fn"),
                  F.sum((1 - yt) * (1 - yp)).alias("tn")))
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    tn = F.col("tn").cast("double")
    den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    val = F.when(den > 0.0, (tp * tn - fp * fn) / F.sqrt(den))
    return cnt.select(
        F.col("n").cast("long").alias("n"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        val.alias("mcc"))


def cochran_q(df: DataFrame, subject_col: str, treatment_col: str,
              y_col: str) -> DataFrame:
    """Cochran's Q test (Cochran 1950) — k-treatment generalization of
    McNemar for PAIRED binary outcomes (e.g. k models judged
    right/wrong on the same examples):

        Q = (k−1)·(k·Σⱼcⱼ² − T²) / (k·T − Σᵢtᵢ²)

    with cⱼ the per-treatment success totals, tᵢ the per-subject
    totals, T the grand total; Q ~ χ²(k−1) under exchangeability.
    Input is one row per (subject, treatment) with a 0/1 ``y_col``;
    subjects missing any of the k globally-observed treatments are
    DROPPED and counted (incomplete blocks carry no within-subject
    contrast), k is taken from the data.  tᵢ ≤ k keeps Σtᵢ² exact
    int64 at any scale; the k-term Σcⱼ² is a treatment-key-ordered
    float fold (the anova_f convention) since cⱼ² exceeds int64 at
    10¹²-row scale.  Q is NULL when the denominator is 0 (all
    subjects all-0 or all-1).  Returns one row:
    (k, n_subjects, n_dropped, t, sum_ti2, sum_cj2, q_stat, df)."""
    d = (df.filter(F.col(y_col).isNotNull())
           .select(F.col(subject_col).alias("__s"),
                   F.col(treatment_col).alias("__t"),
                   F.col(y_col).cast("long").alias("__y")))
    k_df = d.agg(F.countDistinct("__t").alias("k"))
    per_s = (d.groupBy("__s")
              .agg(F.countDistinct("__t").alias("n_t"),
                   F.count(F.lit(1)).alias("n_rows"),
                   F.sum("__y").alias("t_i")))
    per_s = per_s.join(F.broadcast(k_df))
    complete = per_s.filter((F.col("n_t") == F.col("k"))
                            & (F.col("n_rows") == F.col("k")))
    dropped = per_s.filter(~((F.col("n_t") == F.col("k"))
                             & (F.col("n_rows") == F.col("k"))))
    rows = complete.agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("t_i").alias("t"),
        F.sum(F.col("t_i") * F.col("t_i")).alias("sum_ti2"))
    n_drop = dropped.agg(
        F.count(F.lit(1)).alias("n_dropped"))
    keep = complete.select("__s")
    per_c = (d.join(keep, "__s")
              .groupBy("__t").agg(F.sum("__y").alias("c_j")))
    cols = per_c.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("__t").alias("g"),
                    (F.col("c_j").cast("double")
                     * F.col("c_j").cast("double")).alias("t")))),
                lambda s: s["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("sum_cj2"))
    j = rows.join(F.broadcast(k_df)).join(F.broadcast(n_drop)) \
            .join(F.broadcast(cols))
    kd = F.col("k").cast("double")
    td = F.col("t").cast("double")
    denom = kd * td - F.col("sum_ti2").cast("double")
    q = F.when(denom > 0.0,
               (kd - 1.0) * (kd * F.col("sum_cj2") - td * td) / denom)
    return j.select(
        F.col("k").cast("long").alias("k"),
        F.col("n_subjects").cast("long").alias("n_subjects"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        F.col("t").cast("long").alias("t"),
        F.col("sum_ti2").cast("long").alias("sum_ti2"),
        F.col("sum_cj2").alias("sum_cj2"),
        q.alias("q_stat"),
        (F.col("k") - 1).cast("long").alias("df"))


def brown_forsythe(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Brown–Forsythe test (Brown & Forsythe 1974) — the
    median-centered Levene test for EQUALITY OF VARIANCES across k
    groups (the robust pre-check before pooling in anova_f): one-way
    ANOVA F over zᵢⱼ = |xᵢⱼ − medianⱼ|.

    Exactness: the per-group median comes off the per-(group, value)
    COUNT TABLE via the doubled-median trick (m2 = lo + hi, exact
    int64 — the robust_scale/hampel convention, no row sort), so the
    doubled deviations z2 = |2x − m2| are exact ints and the per-group
    (n, Σz2, Σz2²) sufficient statistics are exact int64.  F over z2
    equals F over z (scale-invariance), and the between-group float
    term folds in group-key order (the anova_f convention).
    ``value_col`` must be integer-valued (cents convention).  Returns
    one row: (k, n, ss_between, ss_within, f_stat) — the sums of
    squares are in doubled-deviation units; f_stat is NULL when there
    is no within-group variance or fewer than 2 groups."""
    from pyspark.sql import Window
    v = F.col(value_col).cast("long")
    nn = (df.filter(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("__g"), v.alias("__v")))
    per_v = nn.groupBy("__g", "__v").agg(F.count(F.lit(1)).alias("t"))
    w_run = (Window.partitionBy("__g").orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy("__g")
    c = (per_v.withColumn("cum", F.sum("t").over(w_run))
              .withColumn("n", F.sum("t").over(w_tot)))
    lo_pos = (F.col("n") + 1) - F.expr("n DIV 2") - 1
    hi_pos = F.expr("n DIV 2") + 1
    lo = (c.filter(F.col("cum") >= lo_pos)
          .groupBy("__g").agg(F.min("__v").alias("lo")))
    hi = (c.filter(F.col("cum") >= hi_pos)
          .groupBy("__g").agg(F.min("__v").alias("hi")))
    med = lo.join(hi, "__g").select(
        "__g", (F.col("lo") + F.col("hi")).alias("m2"))
    z = (nn.join(F.broadcast(med), "__g")
           .select("__g", F.abs(F.lit(2) * F.col("__v")
                                - F.col("m2")).alias("z2")))
    per = (z.groupBy("__g")
            .agg(F.count(F.lit(1)).alias("n_g"),
                 F.sum("z2").alias("s_g"),
                 F.sum(F.col("z2") * F.col("z2")).alias("q_g")))
    term = (F.col("s_g").cast("double") * F.col("s_g").cast("double")
            / F.col("n_g").cast("double"))
    terms = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("__g").alias("g"),
                             term.alias("t")))),
                lambda s: s["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("sum_s2n"))
    n = F.col("n").cast("double")
    grand = (F.col("s").cast("double") * F.col("s").cast("double")) / n
    ssb = F.col("sum_s2n") - grand
    ssw = F.col("q").cast("double") - F.col("sum_s2n")
    k = F.col("k").cast("double")
    f_stat = F.when((F.col("k") >= 2) & (ssw > 0.0),
                    (ssb / (k - 1.0)) / (ssw / (n - k)))
    return terms.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        ssb.alias("ss_between"), ssw.alias("ss_within"),
        f_stat.alias("f_stat"))


def group_confusion(df: DataFrame, group_col: str, label_col: str,
                    pred_col: str) -> DataFrame:
    """Per-group binary confusion cells and the three rates every
    fairness audit starts from — positive-prediction rate, TPR
    (equal opportunity) and FPR:

    one map-side-combined aggregate per group, cells exact int64,
    rates mirrored float divisions (NULL where the denominator is
    empty).  Returns one row per group: (group, n, tp, fp, fn, tn,
    pos_rate, tpr, fpr)."""
    y = F.col(label_col).cast("long")
    p = F.col(pred_col).cast("long")
    agg = (df.filter(y.isNotNull() & p.isNotNull())
             .groupBy(F.col(group_col).alias("grp"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(y * p).alias("tp"),
                  F.sum((1 - y) * p).alias("fp"),
                  F.sum(y * (1 - p)).alias("fn"),
                  F.sum((1 - y) * (1 - p)).alias("tn")))

    def d(c):
        return F.col(c).cast("double")

    pos_rate = (d("tp") + d("fp")) / d("n")
    tpr = F.when(F.col("tp") + F.col("fn") > 0,
                 d("tp") / (d("tp") + d("fn")))
    fpr = F.when(F.col("fp") + F.col("tn") > 0,
                 d("fp") / (d("fp") + d("tn")))
    return agg.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        pos_rate.alias("pos_rate"), tpr.alias("tpr"),
        fpr.alias("fpr"))


def fairness_gaps(df: DataFrame, group_col: str, label_col: str,
                  pred_col: str) -> DataFrame:
    """Group-fairness summary over :func:`group_confusion`'s rates —
    the three numbers a model card reports:

        demographic-parity gap  = max pos_rate − min pos_rate
        disparate-impact ratio  = min pos_rate / max pos_rate
                                  (the EEOC four-fifths rule ratio)
        equalized-odds gap      = max(TPR gap, FPR gap)

    Gaps are max−min over groups of already-mirrored float rates —
    order-free (max/min are exact selections, not folds).  Groups
    with an undefined rate (empty denominator) simply don't
    participate in that gap.  NULL outputs when < 2 groups define the
    rate.  Returns one row: (n_groups, dp_gap, di_ratio, tpr_gap,
    fpr_gap, eo_gap)."""
    per = group_confusion(df, group_col, label_col, pred_col)
    agg = per.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.max("pos_rate").alias("pr_max"),
        F.min("pos_rate").alias("pr_min"),
        F.count("pos_rate").alias("pr_n"),
        F.max("tpr").alias("tpr_max"), F.min("tpr").alias("tpr_min"),
        F.count("tpr").alias("tpr_n"),
        F.max("fpr").alias("fpr_max"), F.min("fpr").alias("fpr_min"),
        F.count("fpr").alias("fpr_n"))
    dp = F.when(F.col("pr_n") >= 2,
                F.col("pr_max") - F.col("pr_min"))
    di = F.when((F.col("pr_n") >= 2) & (F.col("pr_max") > 0.0),
                F.col("pr_min") / F.col("pr_max"))
    tg = F.when(F.col("tpr_n") >= 2,
                F.col("tpr_max") - F.col("tpr_min"))
    fg = F.when(F.col("fpr_n") >= 2,
                F.col("fpr_max") - F.col("fpr_min"))
    return agg.select(
        F.col("n_groups").cast("long").alias("n_groups"),
        dp.alias("dp_gap"), di.alias("di_ratio"),
        tg.alias("tpr_gap"), fg.alias("fpr_gap"),
        F.greatest(tg, fg).alias("eo_gap"))


def hosmer_lemeshow(df: DataFrame, prob_col: str, label_col: str,
                    n_bins: int = 10) -> DataFrame:
    """Hosmer–Lemeshow goodness-of-fit test of a probabilistic
    classifier — deciles of predicted risk, observed vs expected
    events per decile:

        HL = Σ_b (O_b − E_b)² / (E_b·(1 − E_b/n_b))  ~ χ²(B−2)

    ``prob_col`` must be the INTEGER per-mille probability (0‥1000 —
    the engine's quantization convention), so E_b = Σp̂ = Σpm/1000 has
    an exact int64 numerator and O_b is an exact count; bins are
    equal-frequency cuts of the probability COUNT table via the exact
    integer CDF split ``bin = (B·below) DIV n`` (the quantile_bin
    plan — ties share a bin, never split).  The B-term HL sum is a
    bin-ordered float fold; degenerate bins (E_b = 0 or E_b = n_b)
    are skipped and counted, df stays B−2 by convention.  Returns one
    row: (n, n_bins, n_degenerate, hl_stat, df)."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    pm = F.col(prob_col).cast("long")
    y = F.col(label_col).cast("long")
    d = (df.filter(pm.isNotNull() & y.isNotNull())
           .select(pm.alias("__pm"), y.alias("__y")))
    per_v = d.groupBy("__pm").agg(F.count(F.lit(1)).alias("t"))
    w_run = (Window.orderBy("__pm")
             .rowsBetween(Window.unboundedPreceding, -1))
    w_all = Window.partitionBy()
    binmap = (per_v
              .select("__pm",
                      F.coalesce(F.sum("t").over(w_run), F.lit(0))
                      .alias("below"),
                      F.sum("t").over(w_all).alias("nn"))
              .select("__pm",
                      F.expr(f"({int(n_bins)} * below) DIV nn")
                      .alias("__b")))
    per_b = (d.join(F.broadcast(binmap), "__pm")
               .groupBy("__b")
               .agg(F.count(F.lit(1)).alias("n_b"),
                    F.sum("__y").alias("o_b"),
                    F.sum("__pm").alias("spm")))
    nb = F.col("n_b").cast("double")
    e_b = F.col("spm").cast("double") / F.lit(1000.0)
    degenerate = (e_b <= 0.0) | (e_b >= nb)
    term = F.when(degenerate, F.lit(0.0)).otherwise(
        (F.col("o_b").cast("double") - e_b)
        * (F.col("o_b").cast("double") - e_b)
        / (e_b * (F.lit(1.0) - e_b / nb)))
    agg = per_b.agg(
        F.sum("n_b").alias("n"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(degenerate.cast("long")).alias("n_degenerate"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("__b").alias("b"), term.alias("t")))),
                lambda s: s["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("hl_stat"))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_bins").cast("long").alias("n_bins"),
        F.col("n_degenerate").cast("long").alias("n_degenerate"),
        F.col("hl_stat").alias("hl_stat"),
        F.lit(int(n_bins) - 2).cast("long").alias("df"))


def bartlett_test(df: DataFrame, group_col: str,
                  value_col: str) -> DataFrame:
    """Bartlett's test for equality of variances across k groups —
    the likelihood-ratio companion of :func:`brown_forsythe` (more
    powerful under normality, fragile otherwise; a dashboard runs
    both):

        T = (N−k)·ln s²_p − Σ (nᵢ−1)·ln s²ᵢ
        C = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1))
        B = T / C   ~ χ²(k−1)

    Per-group (n, Σv, Σv²) exact int64 with integer-quantized
    ``value_col``; the two k-term sums (ln-variances and reciprocal
    dfs) fold in group-key order (the anova_f convention).  Groups
    with n < 2 are DROPPED and counted; NULL B when < 2 usable
    groups or any usable group has zero variance (ln undefined).
    Returns one row: (k, n, n_dropped_groups, bartlett_stat, df)."""
    v = F.col(value_col).cast("long")
    per = (df.filter(v.isNotNull())
             .groupBy(F.col(group_col).alias("g"))
             .agg(F.count(F.lit(1)).alias("ni"),
                  F.sum(v).alias("si"),
                  F.sum(v * v).alias("qi")))
    usable = per.filter(F.col("ni") >= 2)
    dropped = per.filter(F.col("ni") < 2).agg(
        F.count(F.lit(1)).alias("n_dropped_groups"))
    nd = F.col("ni").cast("double")
    s2 = ((F.col("qi").cast("double")
           - F.col("si").cast("double") * F.col("si").cast("double")
           / nd) / (nd - 1.0))
    zero_var = F.sum((F.col("qi") * F.col("ni")
                      == F.col("si") * F.col("si")).cast("long"))
    agg = usable.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("n"),
        zero_var.alias("n_zero_var"),
        F.sum(F.col("qi")).alias("q"),
        F.sum(F.col("si")).alias("s"),
        F.sum((F.col("ni") - 1)).alias("dof_w"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("g").alias("g"),
                    ((nd - 1.0) * F.log(s2)).alias("t")))),
                lambda s_: s_["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("sum_lns"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("g").alias("g"),
                    (F.lit(1.0) / (nd - 1.0)).alias("t")))),
                lambda s_: s_["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("sum_rdf"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("g").alias("g"),
                    ((F.col("qi").cast("double")
                      - F.col("si").cast("double")
                      * F.col("si").cast("double") / nd))
                    .alias("t")))),
                lambda s_: s_["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("ssw"))
    j = agg.crossJoin(F.broadcast(dropped))
    kd = F.col("k").cast("double")
    dw = F.col("dof_w").cast("double")
    sp2 = F.col("ssw") / dw
    t_stat = dw * F.log(sp2) - F.col("sum_lns")
    c = (F.lit(1.0) + (F.col("sum_rdf") - F.lit(1.0) / dw)
         / (3.0 * (kd - 1.0)))
    ok = (F.col("k") >= 2) & (F.col("n_zero_var") == 0)
    return j.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.col("n_dropped_groups").cast("long")
         .alias("n_dropped_groups"),
        F.when(ok, t_stat / c).alias("bartlett_stat"),
        (F.col("k") - 1).cast("long").alias("df"))


def cochran_armitage(df: DataFrame, score_col: str,
                     label_col: str) -> DataFrame:
    """Cochran–Armitage trend test — is a binary outcome rate
    monotone in an ordered/scored factor (dose, bucket, decile):

        z = (Σsᵢrᵢ − p̄·Σsᵢnᵢ)
            / √(p̄(1−p̄)·(Σnᵢsᵢ² − (Σnᵢsᵢ)²/N))

    with integer scores sᵢ, per-score trials nᵢ and successes rᵢ.
    Every sufficient statistic (N, R, Σns, Σns², Σsr) is an exact
    int64 from ONE aggregate over the score count table; z is one
    mirrored float expression.  NULL z when the outcome or the score
    is constant.  Returns one row: (k, n, n_pos, z)."""
    s = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    per = (df.filter(s.isNotNull() & y.isNotNull())
             .groupBy(s.alias("s"))
             .agg(F.count(F.lit(1)).alias("ni"),
                  F.sum(y).alias("ri")))
    agg = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("n"),
        F.sum("ri").alias("r"),
        F.sum(F.col("ni") * F.col("s")).alias("sns"),
        F.sum(F.col("ni") * F.col("s") * F.col("s")).alias("sns2"),
        F.sum(F.col("ri") * F.col("s")).alias("ssr"))
    nd = F.col("n").cast("double")
    pbar = F.col("r").cast("double") / nd
    num = (F.col("ssr").cast("double")
           - pbar * F.col("sns").cast("double"))
    svar = (F.col("sns2").cast("double")
            - F.col("sns").cast("double")
            * F.col("sns").cast("double") / nd)
    den2 = pbar * (F.lit(1.0) - pbar) * svar
    z = F.when(den2 > 0.0, num / F.sqrt(den2))
    return agg.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("n_pos"),
        z.alias("z"))


def cronbach_alpha(df: DataFrame, item_cols) -> DataFrame:
    """Cronbach's α internal-consistency reliability of k integer
    item columns (survey scales, rubric scores, ensemble member
    agreement):

        α = k/(k−1) · (1 − Σᵢ s²ᵢ / s²_T)

    with s²ᵢ the per-item sample variances and s²_T the variance of
    the per-row totals.  Rows with any NULL item are dropped and
    counted (listwise deletion — the standard convention).  All
    sufficient statistics (n, per-item Σx and Σx², ΣT, ΣT² with
    T = Σᵢxᵢ an exact int row total) come from ONE aggregate; the
    item-variance sum folds in the FIXED item-column order (declared:
    the caller's list order, identical in the oracle).  NULL α when
    n < 2, k < 2 or s²_T = 0.  Returns one row:
    (n, n_dropped, k, sum_item_var, total_var, alpha)."""
    item_cols = list(item_cols)
    k = len(item_cols)
    items = [F.col(c).cast("long") for c in item_cols]
    ok = items[0].isNotNull()
    for it in items[1:]:
        ok = ok & it.isNotNull()
    dropped = df.filter(~ok).agg(
        F.count(F.lit(1)).alias("n_dropped"))
    d = df.filter(ok)
    total = items[0]
    for it in items[1:]:
        total = total + it
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(total).alias("st"),
            F.sum(total * total).alias("sst")]
    for i, it in enumerate(items):
        aggs.append(F.sum(it).alias(f"s{i}"))
        aggs.append(F.sum(it * it).alias(f"q{i}"))
    agg = d.agg(*aggs).crossJoin(F.broadcast(dropped))
    nd = F.col("n").cast("double")

    def var_of(s, q):
        return ((F.col(q).cast("double")
                 - F.col(s).cast("double") * F.col(s).cast("double")
                 / nd) / (nd - 1.0))

    sum_iv = var_of("s0", "q0")
    for i in range(1, k):
        sum_iv = sum_iv + var_of(f"s{i}", f"q{i}")
    tot_v = var_of("st", "sst")
    ok2 = (F.col("n") >= 2) & (tot_v > 0.0)
    alpha = F.when(ok2, (F.lit(float(k)) / F.lit(float(k - 1)))
                   * (F.lit(1.0) - sum_iv / tot_v))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        F.lit(k).cast("long").alias("k"),
        F.when(F.col("n") >= 2, sum_iv).alias("sum_item_var"),
        F.when(F.col("n") >= 2, tot_v).alias("total_var"),
        alpha.alias("alpha"))


def rate_decomposition(df: DataFrame, segment_col: str, label_col,
                       is_reference) -> DataFrame:
    """Kitagawa (1955) / Das Gupta decomposition of the change in an
    aggregate rate between a reference and a current period into a
    MIX effect (segment weights shifted) and a RATE effect (within-
    segment rates moved) — the first question any metrics review
    asks about a moved top-line:

        Δ = Σ_s (w_cs − w_rs)·(r_cs + r_rs)/2      [mix]
          + Σ_s (r_cs − r_rs)·(w_cs + w_rs)/2      [rate]

    (the symmetric form: mix + rate = Δ EXACTLY, no interaction
    residual).  Per-segment (n, Σy) are exact int64 for both periods from
    ONE aggregate; the two segment folds run in segment-key order
    (the anova_f convention).  A segment absent from one period gets
    weight 0 there and BORROWS the present period's rate (so its
    whole contribution lands in the mix term — the standard
    convention, documented).  NULL effects when either period is
    empty.  Returns one row: (n_ref, n_cur, rate_ref, rate_cur,
    delta, mix_effect, rate_effect)."""
    ref = is_reference if not isinstance(is_reference, str) \
        else F.col(is_reference)
    r = ref.cast("long")
    y = F.col(label_col).cast("long") if isinstance(label_col, str) \
        else label_col.cast("long")
    per = (df.groupBy(F.col(segment_col).alias("seg"))
             .agg(F.sum(r).alias("nr"),
                  F.sum(r * y).alias("yr"),
                  F.sum(1 - r).alias("nc"),
                  F.sum((1 - r) * y).alias("yc")))
    tot = per.agg(F.sum("nr").alias("n_ref"),
                  F.sum("nc").alias("n_cur"),
                  F.sum("yr").alias("y_ref"),
                  F.sum("yc").alias("y_cur"))
    j = per.crossJoin(F.broadcast(tot))
    nrd = F.col("n_ref").cast("double")
    ncd = F.col("n_cur").cast("double")
    wr = F.col("nr").cast("double") / nrd
    wc = F.col("nc").cast("double") / ncd
    rr_raw = F.when(F.col("nr") > 0,
                    F.col("yr").cast("double")
                    / F.col("nr").cast("double"))
    rc_raw = F.when(F.col("nc") > 0,
                    F.col("yc").cast("double")
                    / F.col("nc").cast("double"))
    rr = F.coalesce(rr_raw, rc_raw)
    rc = F.coalesce(rc_raw, rr_raw)
    mix_term = (wc - wr) * (rc + rr) / F.lit(2.0)
    rate_term = (rc - rr) * (wc + wr) / F.lit(2.0)
    folded = j.groupBy("n_ref", "n_cur", "y_ref", "y_cur").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("seg").alias("g"), mix_term.alias("t")))),
                lambda s: s["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("mix_effect"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("seg").alias("g"), rate_term.alias("t")))),
                lambda s: s["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("rate_effect"))
    ok = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    rate_ref = F.when(F.col("n_ref") > 0,
                      F.col("y_ref").cast("double")
                      / F.col("n_ref").cast("double"))
    rate_cur = F.when(F.col("n_cur") > 0,
                      F.col("y_cur").cast("double")
                      / F.col("n_cur").cast("double"))
    return folded.select(
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        rate_ref.alias("rate_ref"), rate_cur.alias("rate_cur"),
        F.when(ok, rate_cur - rate_ref).alias("delta"),
        F.when(ok, F.col("mix_effect")).alias("mix_effect"),
        F.when(ok, F.col("rate_effect")).alias("rate_effect"))


def two_prop_test(df: DataFrame, flag_col: str,
                  label_col: str) -> DataFrame:
    """Two-proportion z-test with per-arm Wilson score intervals —
    the canonical conversion-rate comparison card:

        z = (p₁ − p₀) / √(p̂(1−p̂)(1/n₁ + 1/n₀)),  p̂ pooled
        Wilson(p, n) = (p + z²/2n ± z·√(p(1−p)/n + z²/4n²))
                       / (1 + z²/n)     (z = 1.96)

    Cells exact int64 from one aggregate; z and the four CI bounds
    are mirrored float expressions (1.96 is exact decimal → same
    double both engines).  NULL z when a margin is degenerate.
    Returns one row: (n1, x1, n0, x0, p1, p0, z, p1_lo, p1_hi,
    p0_lo, p0_hi)."""
    f = F.col(flag_col).cast("long")
    y = F.col(label_col).cast("long")
    agg = (df.filter(f.isNotNull() & y.isNotNull())
             .agg(F.sum(f).alias("n1x"),
                  F.sum(f * y).alias("x1"),
                  F.sum(1 - f).alias("n0x"),
                  F.sum((1 - f) * y).alias("x0")))

    def d(c):
        return F.col(c).cast("double")

    n1, n0 = d("n1x"), d("n0x")
    p1, p0 = d("x1") / n1, d("x0") / n0
    pp = (d("x1") + d("x0")) / (n1 + n0)
    se2 = pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1
                                    + F.lit(1.0) / n0)
    ok = (F.col("n1x") > 0) & (F.col("n0x") > 0)
    z = F.when(ok & (se2 > 0.0), (p1 - p0) / F.sqrt(se2))
    zc = F.lit(1.96)

    def wilson(p, n):
        den = F.lit(1.0) + zc * zc / n
        ctr = p + zc * zc / (2.0 * n)
        rad = zc * F.sqrt(p * (F.lit(1.0) - p) / n
                          + zc * zc / (4.0 * n * n))
        return ((ctr - rad) / den, (ctr + rad) / den)

    w1lo, w1hi = wilson(p1, n1)
    w0lo, w0hi = wilson(p0, n0)
    return agg.select(
        F.col("n1x").cast("long").alias("n1"),
        F.col("x1").cast("long").alias("x1"),
        F.col("n0x").cast("long").alias("n0"),
        F.col("x0").cast("long").alias("x0"),
        F.when(F.col("n1x") > 0, p1).alias("p1"),
        F.when(F.col("n0x") > 0, p0).alias("p0"),
        z.alias("z"),
        F.when(F.col("n1x") > 0, w1lo).alias("p1_lo"),
        F.when(F.col("n1x") > 0, w1hi).alias("p1_hi"),
        F.when(F.col("n0x") > 0, w0lo).alias("p0_lo"),
        F.when(F.col("n0x") > 0, w0hi).alias("p0_hi"))


def poisson_rate_test(df: DataFrame, flag_col: str, count_col: str,
                      exposure_col: str) -> DataFrame:
    """Two-sample Poisson rate-ratio test on (events, exposure)
    pairs — error rates, incident counts, clicks-per-impression:

        RR = (x₁/e₁)/(x₀/e₀),
        z  = ln RR / √(1/x₁ + 1/x₀)

    (the standard log-linear variance; exact int64 totals from one
    aggregate, RR/z mirrored).  NULL RR on zero exposure, NULL z
    additionally on zero events either side (ln/variance undefined).
    Returns one row: (x1, e1, x0, e0, rr, z)."""
    f = F.col(flag_col).cast("long")
    x = F.col(count_col).cast("long")
    e = F.col(exposure_col).cast("long")
    agg = (df.filter(f.isNotNull() & x.isNotNull() & e.isNotNull())
             .agg(F.sum(f * x).alias("x1"),
                  F.sum(f * e).alias("e1"),
                  F.sum((1 - f) * x).alias("x0"),
                  F.sum((1 - f) * e).alias("e0")))

    def d(c):
        return F.col(c).cast("double")

    ok_rr = (F.col("e1") > 0) & (F.col("e0") > 0) & (F.col("x0") > 0)
    rr = F.when(ok_rr, (d("x1") / d("e1")) / (d("x0") / d("e0")))
    ok_z = ok_rr & (F.col("x1") > 0)
    z = F.when(ok_z, F.log((d("x1") / d("e1")) / (d("x0") / d("e0")))
               / F.sqrt(F.lit(1.0) / d("x1") + F.lit(1.0) / d("x0")))
    return agg.select(
        F.col("x1").cast("long").alias("x1"),
        F.col("e1").cast("long").alias("e1"),
        F.col("x0").cast("long").alias("x0"),
        F.col("e0").cast("long").alias("e0"),
        rr.alias("rr"), z.alias("z"))


def qini_curve(df: DataFrame, score_col: str, treat_col,
               label_col: str, id_col: str,
               n_buckets: int = 10) -> DataFrame:
    """Qini curve at bucket granularity (Radcliffe 2007) — the
    uplift-model grading curve :func:`uplift_deciles` summarizes:
    rank by score (score DESC, id ASC NTILE cuts), then per
    cumulative depth b

        qini(b)   = CR_t(b) − CR_c(b)·(CN_t(b)/CN_c(b))
        random(b) = qini(B)·(CN_t(b)+CN_c(b))/N

    (incremental responders at depth b vs the straight-line random
    policy).  Cumulative counts are exact int64 window sums; the two
    curve values and their gap are mirrored float expressions (NULL
    qini where the control arm is empty at depth b).  The Qini
    COEFFICIENT is the sum of per-bucket gaps — emit-side derivable,
    kept out so the frame stays one row per bucket.  Returns
    (bucket, cn_t, cn_c, cr_t, cr_c, qini, random_line, gap)."""
    treat = treat_col if not isinstance(treat_col, str) \
        else F.col(treat_col)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    bucketed = df.select(
        F.col(label_col).cast("long").alias("y"),
        treat.cast("boolean").alias("t"),
        F.ntile(int(n_buckets)).over(w).alias("bucket"))
    per = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("t"), 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(~F.col("t"), 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("t"), F.col("y")).otherwise(0))
         .alias("r_t"),
        F.sum(F.when(~F.col("t"), F.col("y")).otherwise(0))
         .alias("r_c"))
    wc = (Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0))
    wg = Window.partitionBy()
    cur = per.select(
        "bucket",
        F.sum("n_t").over(wc).alias("cnt"),
        F.sum("n_c").over(wc).alias("cnc"),
        F.sum("r_t").over(wc).alias("crt"),
        F.sum("r_c").over(wc).alias("crc"),
        F.sum("n_t").over(wg).alias("tnt"),
        F.sum("n_c").over(wg).alias("tnc"),
        F.sum("r_t").over(wg).alias("trt"),
        F.sum("r_c").over(wg).alias("trc"))

    def d(c):
        return F.col(c).cast("double")

    qini = F.when(F.col("cnc") > 0,
                  d("crt") - d("crc") * (d("cnt") / d("cnc")))
    q_total = F.when(F.col("tnc") > 0,
                     d("trt") - d("trc") * (d("tnt") / d("tnc")))
    rand = q_total * ((d("cnt") + d("cnc"))
                      / (d("tnt") + d("tnc")))
    return cur.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("cnt").cast("long").alias("cn_t"),
        F.col("cnc").cast("long").alias("cn_c"),
        F.col("crt").cast("long").alias("cr_t"),
        F.col("crc").cast("long").alias("cr_c"),
        qini.alias("qini"), rand.alias("random_line"),
        (qini - rand).alias("gap"))


def pinball_loss(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    train_flag,
    q_num: int,
    q_den: int,
) -> DataFrame:
    """Exact pinball (quantile) loss of the per-entity empirical
    q-quantile forecast — the grading metric of any quantile
    predictor (Koenker & Bassett 1978), kept integer-exact end to
    end by two choices:

    * the quantile level is a RATIONAL q = q_num/q_den, so each row's
      scaled loss  q_den·L = q_num·(y−ŷ)  if y ≥ ŷ else
      (q_den−q_num)·(ŷ−y)  is an exact int64;
    * the forecast ŷ is the NON-INTERPOLATED lower empirical quantile
      of the entity's TRAIN rows — the smallest v with
      CDF(v) ≥ q, i.e. cumulative count ≥ ceil(q·n) =
      (q_num·n + q_den − 1) DIV q_den — an exact order statistic off
      the per-(entity, value) count table (no row sort, no float
      quantile edges; the :func:`encoding.quantile_bin` discipline).

    ``train_flag`` (a Column) marks fit rows; the rest are evaluation
    rows.  Entities with no train rows are dropped from the output
    AND surface via n_eval accounting in the gate.  value_col must be
    integer (cents convention).  mean_loss = Σ(q_den·L) /
    (q_den·n_eval) — one division.  Returns one row per entity with
    eval rows: (entity, n_train, n_eval, pred, loss_num, mean_loss).
    """
    qn, qd = int(q_num), int(q_den)
    if not 0 < qn < qd:
        raise ValueError(f"need 0 < q_num < q_den, got {qn}/{qd}")
    base = df.select(
        F.col(entity_col).alias("entity"),
        F.col(value_col).cast("long").alias("v"),
        train_flag.cast("boolean").alias("is_train"))
    train_cells = (base.filter("is_train")
                   .groupBy("entity", "v")
                   .agg(F.count(F.lit(1)).alias("c")))
    w_run = (Window.partitionBy("entity").orderBy("v")
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
    w_all = Window.partitionBy("entity")
    cum = (train_cells
           .withColumn("cum", F.sum("c").over(w_run))
           .withColumn("n_train", F.sum("c").over(w_all)))
    cum = cum.withColumn("idx", F.expr(f"(({qn} * n_train + {qd - 1})"
                                       f") DIV {qd}"))
    pred = (cum.filter(F.col("cum") >= F.col("idx"))
            .groupBy("entity")
            .agg(F.min("v").alias("pred"),
                 F.max("n_train").alias("n_train")))
    ev = base.filter(~F.col("is_train"))
    j = ev.join(pred, "entity")
    scaled = F.when(
        F.col("v") >= F.col("pred"),
        F.lit(qn) * (F.col("v") - F.col("pred"))).otherwise(
        F.lit(qd - qn) * (F.col("pred") - F.col("v")))
    out = j.groupBy("entity").agg(
        F.max("n_train").alias("n_train"),
        F.count(F.lit(1)).alias("n_eval"),
        F.max("pred").alias("pred"),
        F.sum(scaled).alias("loss_num"))
    mean_loss = (F.col("loss_num").cast("double")
                 / (F.lit(qd) * F.col("n_eval")).cast("double"))
    return out.select(
        "entity",
        F.col("n_train").cast("long").alias("n_train"),
        F.col("n_eval").cast("long").alias("n_eval"),
        F.col("pred").cast("long").alias("pred"),
        F.col("loss_num").cast("long").alias("loss_num"),
        mean_loss.alias("mean_loss"))


def krippendorff_alpha(df: DataFrame, item_col: str, rater_col: str,
                       value_col: str) -> DataFrame:
    """Krippendorff's alpha for NOMINAL data (Krippendorff 1970) —
    the annotation-reliability coefficient that, unlike
    :func:`fleiss_kappa`, tolerates MISSING ratings (items rated by
    any m_i ≥ 2 of the raters are pairable; m_i = 1 items are dropped
    AND counted):

        alpha = 1 − Do/De,
        Do = (1/N) Σ_i (m_i² − Σ_c n_ic²)/(m_i − 1),
        De = Σ_c n_c(N − n_c) / (N(N−1))

    with n_ic the per-item category counts, n_c the global marginals
    and N = Σ m_i over pairable items.  Every count is exact int64;
    Do's per-item rational terms fold in ascending-item order and
    De is a category-ordered fold — both replayed by the oracle.
    The item domain must be bounded (the fold collects one struct per
    pairable item — bin upstream); duplicate (item, rater) cells are
    counted as independent ratings (pre-deduplicate upstream if that
    is not the design).  alpha is NULL when De = 0 (all ratings one
    category).  Returns one row: (n_items, n_pairable, n_dropped,
    n_ratings, alpha)."""
    base = df.select(F.col(item_col).cast("long").alias("i"),
                     F.col(rater_col).alias("r"),
                     F.col(value_col).cast("long").alias("c"))
    per_ic = base.groupBy("i", "c").agg(
        F.count(F.lit(1)).alias("nic"))
    per_i = per_ic.groupBy("i").agg(
        F.sum("nic").alias("mi"),
        F.sum(F.col("nic") * F.col("nic")).alias("sq"))
    per_i = per_i.withColumn("ok", F.col("mi") >= 2)
    do_agg = per_i.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("ok").cast("long")).alias("n_pairable"),
        F.sum(F.when(F.col("ok"), F.col("mi")).otherwise(F.lit(0)))
        .alias("n_tot"),
        F.sort_array(F.collect_list(F.when(F.col("ok"), F.struct(
            F.col("i").alias("i"), F.col("mi").alias("mi"),
            F.col("sq").alias("sq"))))).alias("cells"))

    def dd(x):
        return x.cast("double")

    do_sum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc
        + dd(e["mi"] * e["mi"] - e["sq"]) / dd(e["mi"] - 1))
    # global category marginals over PAIRABLE items only
    marg = (per_ic.join(per_i.filter("ok").select("i"), "i")
            .groupBy("c").agg(F.sum("nic").alias("nc")))
    de_agg = marg.agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("c").alias("c"), F.col("nc").alias("nc"))))
        .alias("mcells"))
    j = do_agg.crossJoin(F.broadcast(de_agg))
    nn = dd(F.col("n_tot"))
    de_num = F.aggregate(
        "mcells", F.lit(0.0),
        lambda acc, e: acc + dd(e["nc"]) * (nn - dd(e["nc"])))
    do = do_sum / nn
    de = de_num / (nn * (nn - 1.0))
    alpha = F.when((F.col("n_pairable") > 0) & (de > 0.0),
                   1.0 - do / de)
    return j.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_pairable").cast("long").alias("n_pairable"),
        (F.col("n_items") - F.col("n_pairable")).cast("long")
        .alias("n_dropped"),
        F.col("n_tot").cast("long").alias("n_ratings"),
        alpha.alias("alpha"))


def spiegelhalter_z(df: DataFrame, prob_pm_col: str,
                    label_col: str) -> DataFrame:
    """Spiegelhalter's calibration test (Spiegelhalter 1986) — the
    significance companion of :func:`calibration_bins`/ECE (is the
    observed miscalibration more than chance):

        Z = Σ(y−p)(1−2p) / sqrt( Σ(1−2p)²·p·(1−p) )

    With per-mille integer probabilities (the :func:`hosmer_lemeshow`
    convention) the scale factors CANCEL and both sufficient sums are
    exact int64:

        A = Σ(1000·y − pm)(1000 − 2·pm),
        B = Σ(1000 − 2·pm)²·pm·(1000 − pm),     Z = A / sqrt(B)

    The B sum accumulates in DECIMAL(38,0) (per-row term ≤ 2.5·10¹¹
    would wrap an int64 sum past ~3·10⁷ rows — the
    :func:`~hiselspark.operators.drift.cramer_von_mises` discipline);
    A's per-row bound is 10⁶ so its int64 sum is exact to ~9·10¹²
    rows.  ONE aggregate, one division.  Z is NULL when B = 0 (all
    probabilities at 0/1000); ``b_den`` reports NULL past the int64
    representable range (Z itself stays exact).  Returns one row:
    (n, a_num, b_den, z)."""
    dec = "decimal(38,0)"
    pm = F.col(prob_pm_col).cast("long")
    y = F.col(label_col).cast("long")
    base = df.select(pm.alias("pm"), y.alias("y"))
    a_t = (F.lit(1000) * F.col("y") - F.col("pm")) \
        * (F.lit(1000) - 2 * F.col("pm"))
    b_t = ((F.lit(1000) - 2 * F.col("pm"))
           * (F.lit(1000) - 2 * F.col("pm"))
           * F.col("pm") * (F.lit(1000) - F.col("pm")))
    agg = base.agg(F.count(F.lit(1)).alias("n"),
                   F.sum(a_t).alias("a"),
                   F.sum(b_t.cast(dec)).alias("b"))
    z = F.when(F.col("b") > 0,
               F.col("a").cast("double")
               / F.sqrt(F.col("b").cast("double")))
    b_long = F.when(
        F.col("b") <= F.lit(2 ** 63 - 1).cast(dec),
        F.col("b").cast("long"))
    return agg.select(F.col("n").cast("long").alias("n"),
                      F.col("a").cast("long").alias("a_num"),
                      b_long.alias("b_den"),
                      z.alias("z"))


def funnel_control(df: DataFrame, group_col: str, flag_col,
                   n_sigma: float = 3.0) -> DataFrame:
    """Funnel-plot control limits (Spiegelhalter 2005) — the SPC view
    of per-segment event rates: each group's rate against the pooled
    rate's ``n_sigma`` binomial band at ITS OWN size (small groups
    get wide bands — the honest version of a league table):

        limits = p₀ ± n_sigma·sqrt(p₀(1−p₀)/n_g)

    Counts exact int64 from one aggregate; the pooled p₀, limits and
    the outside-band flags are mirrored float expressions (rates
    compared at full double precision).  Returns one row per group:
    (group, n, k, rate, p0, lo, hi, flag_low, flag_high)."""
    flg = flag_col.cast("long")
    per = (df.groupBy(F.col(group_col).alias("g"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(flg).alias("k")))
    tot = per.agg(F.sum("n").alias("nn"), F.sum("k").alias("kk"))
    j = per.crossJoin(F.broadcast(tot))

    def dd(c):
        return F.col(c).cast("double")

    p0 = dd("kk") / dd("nn")
    rate = dd("k") / dd("n")
    half = F.lit(float(n_sigma)) * F.sqrt(p0 * (1.0 - p0) / dd("n"))
    lo = p0 - half
    hi = p0 + half
    return j.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        rate.alias("rate"), p0.alias("p0"),
        lo.alias("lo"), hi.alias("hi"),
        (rate < lo).alias("flag_low"),
        (rate > hi).alias("flag_high"))


def diagnostics_card(df: DataFrame, score_col: str, label_col: str,
                     threshold) -> DataFrame:
    """Diagnostic-test summary card at a fixed threshold — the
    clinical/screening read-out completing :func:`confusion_at`:
    sensitivity, specificity, Youden's J (= sens + spec − 1, the
    informedness that is prevalence-free where accuracy is not),
    both likelihood ratios and the diagnostic odds ratio:

        LR+ = sens/(1−spec),  LR− = (1−sens)/spec,
        DOR = LR+/LR− = (tp·tn)/(fp·fn)

    Four exact int64 cells from ONE aggregate; every ratio a mirrored
    float expression with NULL rails on empty margins / zero
    denominators (DOR NULL when any cell is 0).  Returns one row:
    (n, tp, fp, tn, fn, sens, spec, youden_j, lr_pos, lr_neg, dor).
    """
    pred = (F.col(score_col) >= threshold).cast("long")
    y = F.col(label_col).cast("long")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * (1 - y)).alias("tn"),
        F.sum((1 - pred) * y).alias("fn"))

    def dd(c):
        return F.col(c).cast("double")

    pos = F.col("tp") + F.col("fn")
    neg = F.col("fp") + F.col("tn")
    sens = F.when(pos > 0, dd("tp") / pos.cast("double"))
    spec = F.when(neg > 0, dd("tn") / neg.cast("double"))
    j = F.when((pos > 0) & (neg > 0), sens + spec - 1.0)
    lr_pos = F.when((pos > 0) & (neg > 0) & (1.0 - spec > 0.0),
                    sens / (1.0 - spec))
    lr_neg = F.when((pos > 0) & (neg > 0) & (spec > 0.0),
                    (1.0 - sens) / spec)
    all_cells = ((F.col("tp") > 0) & (F.col("fp") > 0)
                 & (F.col("tn") > 0) & (F.col("fn") > 0))
    dor = F.when(all_cells,
                 (dd("tp") * dd("tn")) / (dd("fp") * dd("fn")))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("tn").cast("long").alias("tn"),
        F.col("fn").cast("long").alias("fn"),
        sens.alias("sens"), spec.alias("spec"),
        j.alias("youden_j"), lr_pos.alias("lr_pos"),
        lr_neg.alias("lr_neg"), dor.alias("dor"))


def brier_skill(df: DataFrame, prob_pm_col: str,
                label_col: str) -> DataFrame:
    """Brier skill score against the base-rate forecaster — the
    one-number "is this model better than predicting the prevalence"
    companion of :func:`brier_decomposition`:

        BSS = 1 − BS/BS_ref,   BS_ref = p̄(1−p̄)

    With per-mille integer probabilities everything stays exact until
    ONE division:  BS = A/(n·10⁶) with A = Σ(1000·y − pm)² an exact
    int64, BS_ref = k(n−k)/n², so

        BSS = 1 − A·n / (10⁶·k·(n−k))

    The A·n numerator and the 10⁶·k·(n−k) divisor multiply in
    DECIMAL(38,0) (both ≤ 10⁶·n² — an int64 product wraps past
    ~3·10⁶ rows; A itself is int64-exact to ~9·10¹² rows since each
    term is ≤ 10⁶).  NULL when the labels are constant (no base-rate
    variance to beat).  Returns one row: (n, k, a_num, bss)."""
    dec = "decimal(38,0)"
    pm = F.col(prob_pm_col).cast("long")
    y = F.col(label_col).cast("long")
    base = df.select(pm.alias("pm"), y.alias("y"))
    a_t = (F.lit(1000) * F.col("y") - F.col("pm")) \
        * (F.lit(1000) * F.col("y") - F.col("pm"))
    agg = base.agg(F.count(F.lit(1)).alias("n"),
                   F.sum("y").alias("k"),
                   F.sum(a_t).alias("a"))
    ok = (F.col("k") > 0) & (F.col("k") < F.col("n"))
    bss = F.when(ok, 1.0
                 - (F.col("a").cast(dec) * F.col("n")).cast("double")
                 / (F.lit(1_000_000).cast(dec)
                    * F.col("k") * (F.col("n") - F.col("k")))
                 .cast("double"))
    return agg.select(F.col("n").cast("long").alias("n"),
                      F.col("k").cast("long").alias("k"),
                      F.col("a").cast("long").alias("a_num"),
                      bss.alias("bss"))
