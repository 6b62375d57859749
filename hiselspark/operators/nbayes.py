"""Count-based classifiers/adjustments in the exact-replay discipline:
categorical Naive Bayes and CUPED variance reduction.

Both are "sufficient-statistics" methods — training is integer
counting, scoring/adjustment is one fixed float expression per row —
so unlike iterative learners (logistic/GBM) they fit the engine's
cross-engine oracle contract exactly: a SQL engine replays every
count, every smoothed likelihood and every argmax.

The reference engine (transferwise/hisel) selects features for
downstream models; these operators are the cheapest such downstream
consumers, closing the loop (select features → train the count model
→ score) inside the same exactness discipline.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def naive_bayes(train: DataFrame, score: DataFrame,
                feature_cols: Sequence[str], label_col: str,
                alpha: int = 1) -> DataFrame:
    """Categorical Naive Bayes with integer Laplace smoothing: train
    on one frame, score another (held-out shape).

        ln P(c | x) ∝ ln π_c + Σ_f ln ( (c_fvc + α) / (n_c + α·V_f) )

    with π_c = n_c / n, per-(feature, value, class) counts c_fvc and
    per-feature alphabet sizes V_f taken from the TRAIN frame (unseen
    values fall back to the α-mass term with c_fvc = 0).

    Determinism: all counts and alphabet sizes are exact integers;
    each row's class scores fold the per-feature ln terms in sorted
    (feature, class) order via the collected likelihood list, and the
    argmax breaks ties to the smallest class label — every digit
    SQL-replayable.

    Shape: training = one unpivoted count shuffle (cells bounded by
    feature alphabets × classes, never rows) collected to a broadcast
    likelihood table; scoring = map-only joins of each row's feature
    values against that broadcast + one fold.  At 10^12 rows scoring
    is embarrassingly parallel; training cells stay tiny.

    ``score`` must carry a unique ``row_id`` column (never a
    generated monotonically-increasing id — those are partition-
    layout-dependent).  Returns one row per score row:
    (row_id, pred_class, best_logpost).
    """
    feats = sorted(feature_cols)
    classes_df = (train.groupBy(F.col(label_col).alias("cls"))
                  .agg(F.count(F.lit(1)).alias("n_c")))
    total = train.count()
    # unpivot train to (feature, value, cls) cells
    pairs = ", ".join(
        f"'{c}', CAST({c} AS LONG)" for c in feats)
    long_tr = train.selectExpr(
        f"stack({len(feats)}, {pairs}) AS (feature, value)",
        f"{label_col} AS cls")
    cells = (long_tr.groupBy("feature", "value", "cls")
             .agg(F.count(F.lit(1)).alias("c_fvc")))
    vsize = (long_tr.select("feature", "value").distinct()
             .groupBy("feature").agg(F.count(F.lit(1)).alias("v_f")))
    # dense likelihood table: every (feature, value, cls) in the grid
    grid = (long_tr.select("feature", "value").distinct()
            .crossJoin(classes_df.select("cls")))
    lik = (grid.join(cells, ["feature", "value", "cls"], "left")
           .join(vsize, "feature")
           .join(classes_df, "cls")
           .select("feature", "value", "cls",
                   F.coalesce("c_fvc", F.lit(0)).alias("c_fvc"),
                   "v_f", "n_c"))
    a = int(alpha)
    # score: unpivot score rows, left-join likelihoods (unseen values
    # get c_fvc = 0 with the train v_f/n_c), fold per (row, cls)
    sc_pairs = ", ".join(
        f"'{c}', CAST({c} AS LONG)" for c in feats)
    long_sc = score.selectExpr(
        "row_id",
        f"stack({len(feats)}, {sc_pairs}) AS (feature, value)")
    joined = (long_sc
              .join(F.broadcast(vsize), "feature")
              .crossJoin(F.broadcast(classes_df))
              .join(F.broadcast(lik.select(
                  "feature", "value", "cls",
                  F.col("c_fvc").alias("c_hit"))),
                  ["feature", "value", "cls"], "left")
              .select("row_id", "feature", "cls", "n_c", "v_f",
                      F.coalesce("c_hit", F.lit(0)).alias("c_fvc")))
    per_rc = (joined.groupBy("row_id", "cls")
              .agg(F.max("n_c").alias("n_c"),
                   F.sort_array(F.collect_list(F.struct(
                       F.col("feature").alias("f"),
                       F.col("c_fvc").alias("c"),
                       F.col("v_f").alias("v")))).alias("terms")))
    loglik = F.aggregate(
        "terms", F.lit(0.0),
        lambda acc, s: acc + F.log((s["c"] + a).cast("double")
                                   / (F.col("n_c") + a * s["v"])
                                   .cast("double")))
    logpost = (F.log(F.col("n_c").cast("double")
                     / F.lit(float(total))) + loglik)
    scored = per_rc.select("row_id", "cls",
                           logpost.alias("logpost"))
    w = Window.partitionBy("row_id").orderBy(
        F.col("logpost").desc(), F.col("cls").asc())
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("row_id", F.col("cls").alias("pred_class"),
                    F.col("logpost").alias("best_logpost")))


def cuped(df: DataFrame, group_col: str, metric_col: str,
          covariate_col: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi, Walker, "Improving
    the sensitivity of online controlled experiments", WSDM 2013):
    adjust the experiment metric with a pre-period covariate,

        θ   = cov(Y, X) / var(X)          (pooled, both arms)
        Y'ᵢ = Yᵢ − θ·(Xᵢ − X̄)

    then report per group (arm) the adjusted mean and the variance
    reduction 1 − var(Y')/var(Y).  Both metric and covariate must be
    integer-quantized (cents): every sufficient sum (n, ΣY, ΣX, ΣXY,
    ΣX², ΣY²) is an exact int64 and θ, the adjusted means and both
    variances are ONE fixed float expression — bit-identical in the
    SQL oracle.  (Per-arm adjusted variance expands algebraically to
    the same six sums plus ΣXY/ΣX²/ΣY² within the arm, so no second
    pass over rows is needed.)

    Shape: one global aggregate (θ) + one per-group aggregate, both
    map-side combined.  Returns one row per group: (group, n, mean_y,
    mean_y_adj, theta, var_reduction).
    """
    y = F.col(metric_col).cast("long")
    x = F.col(covariate_col).cast("long")
    base = df.select(F.col(group_col).alias("grp"),
                     y.alias("y"), x.alias("x"))
    g = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"), F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))

    def d(c):
        return F.col(c).cast("double")

    nn = d("n")
    theta_num = nn * d("sxy") - d("sx") * d("sy")
    theta_den = nn * d("sxx") - d("sx") * d("sx")
    glob = g.select(
        F.when(theta_den > 0, theta_num / theta_den).alias("theta"),
        (d("sx") / nn).alias("xbar"))
    per = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"), F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    j = per.crossJoin(F.broadcast(glob))
    n_g = d("n")
    my = d("sy") / n_g
    mx = d("sx") / n_g
    th = F.col("theta")
    mean_adj = my - th * (mx - F.col("xbar"))
    var_y = (d("syy") - d("sy") * d("sy") / n_g) / (n_g - 1)
    # var(Y − θX) within the arm (the centering constants drop out)
    cov_xy = (d("sxy") - d("sx") * d("sy") / n_g) / (n_g - 1)
    var_x = (d("sxx") - d("sx") * d("sx") / n_g) / (n_g - 1)
    var_adj = var_y - F.lit(2.0) * th * cov_xy + th * th * var_x
    return j.select(
        F.col("grp"),
        F.col("n").cast("long").alias("n"),
        my.alias("mean_y"),
        mean_adj.alias("mean_y_adj"),
        th.alias("theta"),
        F.when(var_y > 0, F.lit(1.0) - var_adj / var_y)
         .alias("var_reduction"))


def diff_in_diff(
    df: DataFrame,
    unit_col: str,
    treat_col: str,
    period_col: str,
    metric_col: str,
) -> DataFrame:
    """Difference-in-differences estimator on a 2×2 panel
    (treat ∈ {0,1} × period ∈ {0=pre, 1=post}):

        DiD = (ȳ_treat,post − ȳ_treat,pre)
            − (ȳ_ctrl,post − ȳ_ctrl,pre)

    with per-unit aggregation FIRST (each unit contributes its own
    pre/post mean once, so heavy units don't dominate the cell means
    — the standard unit-of-randomization discipline), then the four
    cell means over units.  The parallel-trends assumption is the
    caller's to defend; this computes the estimator and its
    ingredients exactly: metric sums are BIGINT cents and every mean
    is a single double division, so the result is engine-exact.

    Plan: one (unit, period) aggregate, one per-unit mean, one 4-cell
    aggregate — two shuffles, the last to 4 rows.  Returns one row:
    the four cell means, per-cell unit counts and ``did``.
    """
    cents = F.round(F.col(metric_col) * 100).cast("long")
    per_unit = (df.groupBy(
        F.col(unit_col).alias("u"),
        F.col(treat_col).cast("int").alias("t"),
        F.col(period_col).cast("int").alias("p"))
        .agg(F.sum(cents).alias("s"),
             F.count(F.lit(1)).alias("n")))
    unit_mean = per_unit.select(
        "u", "t", "p",
        (F.col("s").cast("double") / F.col("n").cast("double"))
        .alias("m"))
    # cell mean folds the per-unit means in sorted-unit order (float
    # sums via groupBy would be partitioning-dependent)
    fold = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct(
                F.col("u").alias("u"), F.col("m").alias("m")))),
            lambda x: x["m"]),
        F.lit(0.0), lambda acc, m: acc + m)
    cells = (unit_mean.groupBy("t", "p")
             .agg((fold / F.count(F.lit(1)).cast("double"))
                  .alias("cell_mean"),
                  F.count(F.lit(1)).alias("n_units")))
    wide = cells.groupBy().pivot("t", [0, 1]).agg(
        F.first(F.when(F.col("p") == 0, F.col("cell_mean")),
                ignorenulls=True).alias("pre"),
        F.first(F.when(F.col("p") == 1, F.col("cell_mean")),
                ignorenulls=True).alias("post"),
        F.sum(F.when(F.col("p") == 0, F.col("n_units"))).alias("npre"),
        F.sum(F.when(F.col("p") == 1, F.col("n_units"))).alias("npost"))
    return wide.select(
        F.col("0_pre").alias("ctrl_pre"),
        F.col("0_post").alias("ctrl_post"),
        F.col("1_pre").alias("treat_pre"),
        F.col("1_post").alias("treat_post"),
        F.col("0_npre").cast("long").alias("n_ctrl_pre"),
        F.col("0_npost").cast("long").alias("n_ctrl_post"),
        F.col("1_npre").cast("long").alias("n_treat_pre"),
        F.col("1_npost").cast("long").alias("n_treat_post"),
        ((F.col("1_post") - F.col("1_pre"))
         - (F.col("0_post") - F.col("0_pre"))).alias("did"))


def quantile_treatment_effect(
    df: DataFrame,
    treat_col: str,
    metric_col: str,
    quantiles: tuple = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """Quantile treatment effects: at each requested quantile q,

        QTE(q) = Q_treat(q) − Q_ctrl(q)

    (the difference of marginal quantiles — the standard
    distributional read-out when the average effect hides movement in
    the tails; it is NOT the quantile of individual effects unless
    rank invariance holds, which is the caller's assumption to
    defend).  Quantiles are Spark ``percentile`` — exact, linearly
    interpolated order statistics, the engine convention DuckDB's
    ``quantile_cont`` mirrors bit-for-bit.

    Plan: ONE aggregate per arm computing the whole quantile vector
    (a single shuffle of (treat, value) pairs), a broadcast of the
    two 1-row vectors, one posexplode.  Returns one row per quantile:
    (q, y_ctrl, y_treat, qte).
    """
    qs = [float(q) for q in quantiles]
    arm = (df.groupBy(F.col(treat_col).cast("int").alias("t"))
             .agg(F.percentile(F.col(metric_col), qs).alias("v")))
    t1 = arm.filter(F.col("t") == 1).select(F.col("v").alias("vt"))
    t0 = arm.filter(F.col("t") == 0).select(F.col("v").alias("vc"))
    both = t1.crossJoin(F.broadcast(t0))
    qarr = F.array(*[F.lit(q) for q in qs])
    out = both.select(
        F.posexplode(qarr).alias("i", "q"),
        F.col("vt"), F.col("vc"))
    return out.select(
        "q",
        F.col("vc")[F.col("i")].alias("y_ctrl"),
        F.col("vt")[F.col("i")].alias("y_treat"),
        (F.col("vt")[F.col("i")] - F.col("vc")[F.col("i")])
        .alias("qte"))


def srm_check(
    df: DataFrame,
    arm_col: str,
    expected_ratio: float = 0.5,
) -> DataFrame:
    """Sample-ratio-mismatch guardrail (the first thing every
    experimentation platform checks): do the arm sizes match the
    intended split?  One-degree chi-square against the expected
    treated share p:

        χ² = (n_t − n·p)² / (n·p)  +  (n_c − n·(1−p))² / (n·(1−p))
        p_value = erfc( sqrt(χ² / 2) )

    erfc via the Abramowitz–Stegun 7.1.26 rational approximation
    (|error| < 1.5·10⁻⁷ — far tighter than any SRM decision needs,
    and a fixed closed-form polynomial both engines evaluate
    identically; the guardrail convention is "alarm below 1e-3").

    One count aggregate; everything after is scalar arithmetic on
    exact integers.  Returns one row: (n_treat, n_ctrl, expected_p,
    chi2, p_value).
    """
    p = float(expected_ratio)
    if not 0.0 < p < 1.0:
        raise ValueError(f"expected_ratio must be in (0,1), got {p}")
    cnt = df.agg(
        F.sum(F.col(arm_col).cast("long")).alias("nt"),
        F.sum(1 - F.col(arm_col).cast("long")).alias("nc"))
    nt, nc = F.col("nt").cast("double"), F.col("nc").cast("double")
    n = nt + nc
    chi2 = ((nt - n * p) * (nt - n * p) / (n * p)
            + (nc - n * (1.0 - p)) * (nc - n * (1.0 - p))
            / (n * (1.0 - p)))
    x = F.sqrt(chi2 / 2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (t * (0.254829592
            + t * (-0.284496736
            + t * (1.421413741
            + t * (-1.453152027 + t * 1.061405429)))))
    erfc = poly * F.exp(-(x * x))
    return cnt.select(
        F.col("nt").alias("n_treat"), F.col("nc").alias("n_ctrl"),
        F.lit(p).alias("expected_p"),
        chi2.alias("chi2"), erfc.alias("p_value"))
