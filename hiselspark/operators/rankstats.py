"""Rank-based statistics — Spearman correlation, Kruskal-Wallis,
Welch's t — in the engine's exact-integer discipline.

Ranks are where float nondeterminism usually sneaks into "robust"
statistics (average ranks are halves; summing them is a float
reduction whose order depends on partitioning).  Every rank here is
kept as a DOUBLED integer:

    r2(v) = 2·avg_rank(v) = 2·min_rank(v) + ties(v) − 1

an exact int64, computed from one window over the value column.  All
sufficient statistics (Σr2, Σr2², Σr2x·r2y, per-group rank sums) are
then exact integer sums — associative, bit-identical across any
partitioning — and the final statistic is ONE fixed float expression
both engines (and the DuckDB oracle) evaluate identically.

Overflow discipline: with n rows, r2 ≤ 2n, so Σr2x·r2y ≤ 4n³ and the
n·Σ cross terms reach 4n⁴ — int64-safe for n < ~55k and exact-double-
safe (< 2⁵³) for n < ~7k per statistic.  The statistics below divide
BEFORE multiplying where it matters and document per-function bounds;
at 10^12-row scale you'd compute the same sums in DECIMAL(38,0)
(Spark) / HUGEINT (DuckDB) — the plan shape (one unpivot shuffle, one
window, one aggregate) is unchanged.

The reference engine (transferwise/hisel) ranks features with
HSIC/MI (`hisel/select.py`, `hisel/stats.py`); these operators extend
that inference surface with the classical rank tests a feature-audit
dashboard runs next to it.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def spearman_matrix(df: DataFrame, id_col: str,
                    cols: Sequence[str]) -> DataFrame:
    """Spearman rank correlation of every column pair.

    Spearman = Pearson on average ranks, and average ranks are kept
    as exact doubled integers (module docstring), so the whole matrix
    reduces to integer sufficient statistics — the same one-pass
    O(k²)-sums discipline as :func:`profile.corr_matrix`, applied to
    ranks (the ×2 scaling cancels in the correlation ratio, but both
    engines evaluate the identical r2 expression anyway).

    Shape: unpivot (map-only) → per-(feature, value) count table →
    ordered running sum per feature (doubled average rank r2 =
    2·(below+1) + ties − 1) → join ranks back → pivot wide on
    ``id_col`` → ONE aggregate of exact integer sums.  No global row
    sort anywhere: ranks come off the distinct-value count table, so
    the heaviest exchange is on (feature, value).

    ``cols`` must be integer-valued (cents convention) and NULL-free
    upstream; ``id_col`` must be a unique row id.  Integer bound:
    n·Σr2x·r2y ≤ 4n⁴ — int64-exact for n < 55k; at corpus scale run
    the identical plan with DECIMAL(38,0) sums.

    Returns one row per unordered pair (col_x < col_y in input
    order): (col_x, col_y, n, rho).
    """
    cols = list(cols)
    parts = [
        df.select(F.col(id_col).cast("long").alias("id"),
                  F.lit(c).alias("feat"),
                  F.col(c).cast("long").alias("v"))
        for c in cols
    ]
    long_df = parts[0]
    for p in parts[1:]:
        long_df = long_df.unionAll(p)
    per_v = long_df.groupBy("feat", "v").agg(
        F.count(F.lit(1)).alias("t"))
    w_run = (Window.partitionBy("feat").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, -1))
    ranked = per_v.select(
        "feat", "v",
        (F.lit(2) * (F.coalesce(F.sum("t").over(w_run), F.lit(0)) + 1)
         + F.col("t") - 1).alias("r2"))
    with_r = long_df.join(ranked, ["feat", "v"])
    wide = (with_r.groupBy("id")
            .pivot("feat", cols)
            .agg(F.first("r2")))
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    stats = wide.agg(*aggs)

    def d(name):
        return F.col(name).cast("double")

    pairs = None
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            n = d("n")
            num = n * d(f"sp_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}")
            vx = n * d(f"ss_{a}") - d(f"s_{a}") * d(f"s_{a}")
            vy = n * d(f"ss_{b}") - d(f"s_{b}") * d(f"s_{b}")
            row = stats.select(
                F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
                F.col("n").cast("long").alias("n"),
                F.when((vx > 0) & (vy > 0),
                       num / F.sqrt(vx * vy)).alias("rho"))
            pairs = row if pairs is None else pairs.unionAll(row)
    return pairs


def kruskal_wallis(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Kruskal-Wallis H (rank ANOVA) of ``value_col`` across the
    groups of ``group_col``, with the exact tie correction.

    One global window ranks all values (doubled average ranks r2 =
    2·min_rank + ties − 1, exact ints); per-group doubled rank sums
    R2_g and counts n_g are exact integer aggregates.  Then

        H  = 3·Σ_g (R2_g²/n_g) / (n(n+1)) − 3(n+1)
        C  = 1 − Σ_v (t_v³ − t_v) / (n³ − n)      (tie correction)
        Hc = H / C

    The Σ_g fold is evaluated over groups in sorted group-key order
    (collect → sort_array → aggregate) so the float sum is
    bit-reproducible and SQL-replayable; group counts are tiny (it's
    a statistical test, not a rollup), so the per-test array is
    bounded.  Returns one row: (n, n_groups, h, tie_c, h_c).

    No global row sort: ranks come off the distinct-VALUE count table
    (value → count → running sum), so the only unpartitioned window
    is over distinct values — bounded by the value domain, not by n —
    and the rank join back onto rows is a broadcast of that table.
    """
    v = F.col(value_col).cast("long")
    base = df.select(F.col(group_col).alias("g"), v.alias("v"))
    # doubled average rank from the distinct-value count table: no
    # global row sort, just an ordered running sum over distinct values
    per_v = base.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    w_run = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding, -1))
    ranked_v = per_v.select(
        "v", "t",
        (F.lit(2) * (F.coalesce(F.sum("t").over(w_run), F.lit(0)) + 1)
         + F.col("t") - 1).alias("r2"))
    joined = base.join(F.broadcast(ranked_v.select("v", "r2")), "v")
    per_g = joined.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("r2").alias("R2"))
    # fold Σ R2²/n_g over groups in sorted-key order (bounded array)
    gterms = per_g.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sort_array(F.collect_list(F.struct(
            F.col("g").cast("string").alias("g"),
            F.col("R2").alias("R2"),
            F.col("n_g").alias("n_g")))).alias("terms"))
    ties = per_v.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
         .alias("t3t"))
    s = gterms.crossJoin(F.broadcast(ties))
    fold = F.aggregate(
        "terms", F.lit(0.0),
        lambda acc, x: acc + (x["R2"].cast("double")
                              * x["R2"].cast("double")
                              / x["n_g"].cast("double")))
    n = F.col("n").cast("double")
    h = (F.lit(3.0) * fold / (n * (n + 1)) - F.lit(3.0) * (n + 1))
    tie_c = F.lit(1.0) - F.col("t3t").cast("double") / (n * n * n - n)
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("n_groups"),
        h.alias("h"),
        tie_c.alias("tie_c"),
        F.when(tie_c > 0, h / tie_c).alias("h_c"))


def welch_ttest(df: DataFrame, group_col: str, flag_col,
                value_col: str) -> DataFrame:
    """Welch's unequal-variance t between the two samples of
    ``flag_col`` (boolean column/expression) within every group of
    ``group_col`` — the audit test for "did this feature's mean move
    between period A and period B", run for all groups in ONE
    aggregation pass.

    ``value_col`` must be integer-quantized (cents convention): the
    per-sample n, Σv, Σv² are exact integer sums; mean, the unbiased
    variance (n·Σv² − (Σv)²)/(n·(n−1)), the t statistic and the
    Welch-Satterthwaite df are ONE fixed float expression — identical
    in Spark and the SQL oracle.  Returns (group, n_a, n_b, mean_a,
    mean_b, t, df); groups where either side has < 2 rows or both
    variances are zero yield NULL t/df.
    """
    flag = flag_col if not isinstance(flag_col, str) else F.col(flag_col)
    v = F.col(value_col).cast("long")
    a = F.when(flag, v)
    b = F.when(~flag, v)
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(a).alias("na"), F.sum(a).alias("sa"),
        F.sum(a * a).alias("ssa"),
        F.count(b).alias("nb"), F.sum(b).alias("sb"),
        F.sum(b * b).alias("ssb"))

    def d(c):
        return F.col(c).cast("double")

    na, nb = d("na"), d("nb")
    ma, mb = d("sa") / na, d("sb") / nb
    va = (na * d("ssa") - d("sa") * d("sa")) / (na * (na - 1))
    vb = (nb * d("ssb") - d("sb") * d("sb")) / (nb * (nb - 1))
    sea, seb = va / na, vb / nb
    se2 = sea + seb
    t = F.when((F.col("na") >= 2) & (F.col("nb") >= 2) & (se2 > 0),
               (ma - mb) / F.sqrt(se2))
    dof = F.when((F.col("na") >= 2) & (F.col("nb") >= 2) & (se2 > 0),
                 se2 * se2 / (sea * sea / (na - 1)
                              + seb * seb / (nb - 1)))
    return agg.select(
        F.col("grp"),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        ma.alias("mean_a"), mb.alias("mean_b"),
        t.alias("t"), dof.alias("df"))


def kendall_tau(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Kendall's tau-b between two integer-quantized columns, exact.

    Concordant/discordant pairs are counted on the CONTINGENCY TABLE,
    not the rows: with cells (x, y, c) the pair totals are

        C = Σ_ij c_ij · Σ_{k>i, l>j} c_kl
        D = Σ_ij c_ij · Σ_{k>i, l<j} c_kl

    via a self-join of the cell table — O(V²) in the number of
    DISTINCT value pairs, never O(n²) in rows.  That is the engine's
    quantized-domain contract (cents/bucket features have bounded
    alphabets); for large alphabets the same cell table feeds a 2D
    prefix-sum pass instead, same two-shuffle plan shape.  Tie terms
    n1 = Σ t_x(t_x−1)/2, n2 = Σ t_y(t_y−1)/2 come off the marginals.

    All counts are exact int64 (bounds: C, D ≤ n(n−1)/2 — int64-safe
    to n ~ 4·10⁹); tau_b = (C − D)/sqrt((n0−n1)·(n0−n2)) is one fixed
    float expression.  Returns (n, n_pairs, concordant, discordant,
    tau_b).
    """
    base = df.select(F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
    cells = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    a = cells.select(F.col("x").alias("xa"), F.col("y").alias("ya"),
                     F.col("c").alias("ca"))
    b = cells.select(F.col("x").alias("xb"), F.col("y").alias("yb"),
                     F.col("c").alias("cb"))
    prods = (a.join(b, (F.col("xa") < F.col("xb")))
             .select(
                 (F.col("ca") * F.col("cb")).alias("p"),
                 F.when(F.col("ya") < F.col("yb"), F.lit(1))
                  .when(F.col("ya") > F.col("yb"), F.lit(-1))
                  .otherwise(F.lit(0)).alias("sgn")))
    cd = prods.agg(
        F.sum(F.when(F.col("sgn") == 1, F.col("p")).otherwise(0))
         .alias("conc"),
        F.sum(F.when(F.col("sgn") == -1, F.col("p")).otherwise(0))
         .alias("disc"))
    tx = (cells.groupBy("x").agg(F.sum("c").alias("t"))
          .agg(F.sum(F.col("t") * (F.col("t") - 1)).alias("tx2"),
               F.sum("t").alias("n")))
    ty = (cells.groupBy("y").agg(F.sum("c").alias("t"))
          .agg(F.sum(F.col("t") * (F.col("t") - 1)).alias("ty2")))
    s = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))

    def d(c):
        return F.col(c).cast("double")

    n = F.col("n")
    n0x2 = (n * (n - 1))            # 2·n0
    den = (F.sqrt((n0x2 - F.col("tx2")).cast("double")
                  * (n0x2 - F.col("ty2")).cast("double")) / F.lit(2.0))
    tau = F.when(
        (n0x2 > F.col("tx2")) & (n0x2 > F.col("ty2")),
        (d("conc") - d("disc")) / den)
    return s.select(
        n.cast("long").alias("n"),
        (n0x2 / 2).cast("long").alias("n_pairs"),
        F.col("conc").cast("long").alias("concordant"),
        F.col("disc").cast("long").alias("discordant"),
        tau.alias("tau_b"))


def stump_split(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Best decision-stump split of integer feature x against label y
    by exact information gain: over every candidate threshold t
    (the distinct x values, split as x ≤ t vs x > t), maximize

        gain(t) = H(Y) − (n_L/n)·H(Y_L) − (n_R/n)·H(Y_R)

    Counts come off the (x, y) contingency table with per-y running
    sums over the ordered distinct-x axis — no row sort, the same
    count-table discipline as the rank operators.  Entropies are
    folded over classes in sorted-y order (exact integer counts into
    each ln term), so both engines land on identical doubles; the
    argmax takes the smallest threshold on ties.  The last candidate
    (everything left) is excluded — an empty right side has no
    entropy.  Returns one row:
    (threshold, n_left, n_right, h_parent, gain).
    """
    base = df.select(F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
    cells = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    w_run = (Window.partitionBy("y").orderBy("x")
             .rowsBetween(Window.unboundedPreceding, 0))
    wy = Window.partitionBy("y")
    cum = (cells
           .withColumn("cum", F.sum("c").over(w_run))
           .withColumn("tot_y", F.sum("c").over(wy)))
    # candidate rows: every distinct x needs EVERY class's cum count;
    # the per-(x) class lists are built from the cum table by taking,
    # per class, the last cum at or before x — do it by re-windowing
    # over all cells per class then grouping by x with max(cum) per y
    xs = cells.select("x").distinct()
    classes = cells.select("y", ).distinct()
    grid = xs.crossJoin(F.broadcast(classes))
    cum_at = (grid.join(cum.select(F.col("x").alias("cx"), "y",
                                   "cum", "tot_y"), "y")
              .filter(F.col("cx") <= F.col("x"))
              .groupBy("x", "y")
              .agg(F.max("cum").alias("nly"),
                   F.max("tot_y").alias("toty")))
    # classes absent at or before x contribute nly = 0: re-join grid
    cand = (grid.join(cum_at, ["x", "y"], "left")
            .join(F.broadcast(
                cells.groupBy("y").agg(F.sum("c").alias("ty"))), "y")
            .select("x", "y",
                    F.coalesce("nly", F.lit(0)).alias("nly"),
                    F.col("ty")))
    per_t = cand.groupBy("x").agg(
        F.sum("nly").alias("n_l"),
        F.sum("ty").alias("n"),
        F.sort_array(F.collect_list(F.struct(
            F.col("y").alias("y"), F.col("nly").alias("nly"),
            F.col("ty").alias("ty")))).alias("cls"))

    def d(c):
        return c.cast("double") if not isinstance(c, str) \
            else F.col(c).cast("double")

    n = d("n")
    nl = d("n_l")
    nr = n - nl
    h_parent = F.aggregate(
        "cls", F.lit(0.0),
        lambda acc, s: acc + F.when(
            s["ty"] > 0,
            -(s["ty"].cast("double") / n)
            * F.log(s["ty"].cast("double") / n)).otherwise(0.0))
    h_l = F.aggregate(
        "cls", F.lit(0.0),
        lambda acc, s: acc + F.when(
            s["nly"] > 0,
            -(s["nly"].cast("double") / nl)
            * F.log(s["nly"].cast("double") / nl)).otherwise(0.0))
    h_r = F.aggregate(
        "cls", F.lit(0.0),
        lambda acc, s: acc + F.when(
            s["ty"] - s["nly"] > 0,
            -((s["ty"] - s["nly"]).cast("double") / nr)
            * F.log((s["ty"] - s["nly"]).cast("double") / nr))
        .otherwise(0.0))
    scored = per_t.filter(F.col("n_l") < F.col("n")).select(
        F.col("x").alias("threshold"),
        F.col("n_l").cast("long").alias("n_left"),
        (F.col("n") - F.col("n_l")).cast("long").alias("n_right"),
        h_parent.alias("h_parent"),
        (h_parent - (nl / n) * h_l - (nr / n) * h_r).alias("gain"))
    w_best = Window.orderBy(F.col("gain").desc(),
                            F.col("threshold").asc())
    return (scored.withColumn("__rn", F.row_number().over(w_best))
            .filter(F.col("__rn") == 1).drop("__rn"))


def mann_whitney(df: DataFrame, flag_col: str,
                 value_col: str) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) of ``value_col``
    between the ``flag_col`` = 1 sample (A) and the = 0 sample (B),
    with the tie-corrected normal approximation and Cliff's delta —
    the distribution-free two-sample location test next to
    :func:`welch_ttest`, plus the effect size a dashboard reports
    with it.

    Exactness: doubled average ranks r2 off the value count table
    (module docstring), so the doubled rank sum of A
    ``r1d = Σ t_A·r2`` and the doubled U statistic
    ``u2 = r1d − n1·(n1+1)`` are exact int64; the tie term
    ``Σ(t³−t)`` is an exact integer fold of the same table.  The
    statistic, z, Cliff's delta ``(u2 − n1·n2)/(n1·n2)`` (ties count
    half, the average-rank convention) and the Abramowitz-Stegun
    erfc p-value are then ONE fixed float expression each, mirrored
    term-for-term by the oracle.  All-tied data (σ² = 0) yields NULL
    z/p rather than a 0/0.

    Plan: one (value)-keyed count-table exchange + one window on it +
    one global aggregate — never a row sort.  Overflow: t³ ≤ n³
    (int64-safe for n < 2M per tied value; DECIMAL(38,0) at corpus
    scale, same plan).  Returns one row:
    (n1, n2, u, z, p_value, cliffs_delta).
    """
    base = df.select(F.col(value_col).cast("long").alias("v"),
                     F.col(flag_col).cast("long").alias("a"))
    per_v = base.groupBy("v").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("a").alias("ta"))
    w_run = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding, -1))
    ranked = per_v.select(
        "v", "t", "ta",
        (F.lit(2) * (F.coalesce(F.sum("t").over(w_run), F.lit(0)) + 1)
         + F.col("t") - 1).alias("r2"))
    s = ranked.agg(
        F.sum("ta").alias("n1"),
        F.sum(F.col("t") - F.col("ta")).alias("n2"),
        F.sum(F.col("ta") * F.col("r2")).alias("r1d"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .alias("tc"))
    u2 = F.col("r1d") - F.col("n1") * (F.col("n1") + 1)
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    var = (n1d * n2d / F.lit(12.0)) * (
        (nd + F.lit(1.0))
        - F.col("tc").cast("double") / (nd * (nd - F.lit(1.0))))
    z = F.when(
        var > 0,
        ((u2 - F.col("n1") * F.col("n2")).cast("double") / F.lit(2.0))
        / F.sqrt(var))
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t_ = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    p = (t_ * (F.lit(0.254829592)
         + t_ * (F.lit(-0.284496736)
         + t_ * (F.lit(1.421413741)
         + t_ * (F.lit(-1.453152027)
         + t_ * F.lit(1.061405429)))))) * F.exp(-(x * x))
    return s.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        (u2.cast("double") / F.lit(2.0)).alias("u"),
        F.round(z, 6).alias("z"),
        F.round(p, 9).alias("p_value"),
        F.round((u2 - F.col("n1") * F.col("n2")).cast("double")
                / (n1d * n2d), 6).alias("cliffs_delta"))


def _friedman_blocks(df: DataFrame, subject_col: str,
                     treatment_col: str, value_col: str):
    """Shared complete-block doubled-rank plan for
    :func:`friedman_test` and :func:`page_trend`: keep only subjects
    observed exactly once under every globally-seen treatment (the
    :func:`hiselspark.operators.evaluate.cochran_q` convention —
    incomplete blocks carry no within-subject contrast and are
    dropped AND counted), then rank each subject's k values with
    doubled average ranks r2 = 2·count_less + count_eq + 1 (exact
    int64, module docstring) via ONE value-range window per subject.

    Returns (ranked rows frame with (__s, __t, r2), k frame,
    n_subjects/sum_r2sq frame, n_dropped frame)."""
    d = (df.filter(F.col(value_col).isNotNull()
                   & F.col(subject_col).isNotNull()
                   & F.col(treatment_col).isNotNull())
           .select(F.col(subject_col).alias("__s"),
                   F.col(treatment_col).alias("__t"),
                   F.col(value_col).cast("long").alias("__v")))
    k_df = d.agg(F.countDistinct("__t").alias("k"))
    per_s = (d.groupBy("__s")
              .agg(F.countDistinct("__t").alias("n_t"),
                   F.count(F.lit(1)).alias("n_rows")))
    per_s = per_s.join(F.broadcast(k_df))
    is_complete = ((F.col("n_t") == F.col("k"))
                   & (F.col("n_rows") == F.col("k")))
    keep = per_s.filter(is_complete).select("__s")
    n_drop = (per_s.filter(~is_complete)
              .agg(F.count(F.lit(1)).alias("n_dropped")))
    w_less = (Window.partitionBy("__s").orderBy("__v")
              .rangeBetween(Window.unboundedPreceding, -1))
    w_eq = (Window.partitionBy("__s").orderBy("__v")
            .rangeBetween(0, 0))
    ranked = (d.join(keep, "__s")
                .select("__s", "__t",
                        (F.lit(2) * F.coalesce(
                            F.count(F.lit(1)).over(w_less), F.lit(0))
                         + F.count(F.lit(1)).over(w_eq) + 1)
                        .alias("r2")))
    tot = ranked.agg(
        F.countDistinct("__s").alias("n_subjects"),
        F.sum(F.col("r2") * F.col("r2")).alias("sum_r2sq"))
    return ranked, k_df, tot, n_drop


def friedman_test(df: DataFrame, subject_col: str, treatment_col: str,
                  value_col: str) -> DataFrame:
    """Friedman's rank test (Friedman 1937) — the distribution-free
    repeated-measures ANOVA over complete (subject × treatment)
    blocks, with the Conover tie correction:

        Q = (k−1) · Σⱼ (Rⱼ − n(k+1)/2)² / (A − C)

    A = ΣΣ r²ᵢⱼ, C = nk(k+1)²/4.  Everything is computed on DOUBLED
    ranks so all sufficient statistics are exact int64: multiplying
    numerator and denominator by 4 gives

        Q = (k−1) · Σⱼ (R2ⱼ − n(k+1))² / (Σ r2² − nk(k+1)²)

    with R2ⱼ the per-treatment doubled rank sums.  r2 ≤ 2k keeps
    Σ r2² int64-exact at any n; the k-term numerator is a
    treatment-key-ordered float fold (the anova_f convention — R2ⱼ²
    exceeds int64 at 10¹²-row scale).  Q is NULL when the denominator
    is 0 (every block fully tied).  ``value_col`` must be integer-
    quantized (cents convention).  Returns one row: (k, n_subjects,
    n_dropped, sum_r2sq, q_stat, df)."""
    ranked, k_df, tot, n_drop = _friedman_blocks(
        df, subject_col, treatment_col, value_col)
    per_t = ranked.groupBy("__t").agg(F.sum("r2").alias("rj2"))
    num = (per_t.join(F.broadcast(tot)).join(F.broadcast(k_df))
           .agg(F.aggregate(
               F.transform(
                   F.array_sort(F.collect_list(F.struct(
                       F.col("__t").alias("g"),
                       (F.col("rj2").cast("double")
                        - F.col("n_subjects").cast("double")
                        * (F.col("k") + 1).cast("double"))
                       .alias("t")))),
                   lambda s: s["t"] * s["t"]),
               F.lit(0.0), lambda acc, x: acc + x).alias("num4")))
    j = (tot.join(F.broadcast(k_df)).join(F.broadcast(n_drop))
         .join(F.broadcast(num)))
    kd = F.col("k").cast("double")
    nd = F.col("n_subjects").cast("double")
    den4 = (F.col("sum_r2sq").cast("double")
            - nd * kd * (kd + 1.0) * (kd + 1.0))
    q = F.when(den4 > 0.0, (kd - 1.0) * F.col("num4") / den4)
    return j.select(
        F.col("k").cast("long").alias("k"),
        F.col("n_subjects").cast("long").alias("n_subjects"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        F.col("sum_r2sq").cast("long").alias("sum_r2sq"),
        q.alias("q_stat"),
        (F.col("k") - 1).cast("long").alias("df"))


def page_trend(df: DataFrame, subject_col: str, treatment_col: str,
               value_col: str) -> DataFrame:
    """Page's L test for an ORDERED alternative (Page 1963) — the
    monotone-trend companion of :func:`friedman_test` over the same
    complete blocks, treatments ordered by their key:

        L = Σⱼ j·Rⱼ,   μ_L = nk(k+1)²/4,
        σ²_L = n·k²·(k+1)·(k²−1)/144

    Doubled rank sums make L2 = Σ j·R2ⱼ exact int64 (L = L2/2); the
    treatment index j is a key-ordered row_number on the k-row
    per-treatment table (one tiny window).  z = (L − μ)/σ is the one
    mirrored float expression (the untied approximation; average
    ranks are used under ties, the standard practice).  NULL z when
    k < 2 or n = 0.  Returns one row: (k, n_subjects, n_dropped,
    l_stat, mu_l, sigma_l, z)."""
    ranked, k_df, tot, n_drop = _friedman_blocks(
        df, subject_col, treatment_col, value_col)
    w_j = Window.orderBy("__t")
    per_t = (ranked.groupBy("__t").agg(F.sum("r2").alias("rj2"))
             .select("__t", "rj2",
                     F.row_number().over(w_j).alias("j")))
    l2 = per_t.agg(F.sum(F.col("j") * F.col("rj2")).alias("l2"))
    j = (tot.join(F.broadcast(k_df)).join(F.broadcast(n_drop))
         .join(F.broadcast(l2)))
    kd = F.col("k").cast("double")
    nd = F.col("n_subjects").cast("double")
    l_stat = F.col("l2").cast("double") / F.lit(2.0)
    mu = nd * kd * (kd + 1.0) * (kd + 1.0) / F.lit(4.0)
    var = (nd * kd * kd * (kd + 1.0) * (kd * kd - 1.0)
           / F.lit(144.0))
    z = F.when(var > 0.0, (l_stat - mu) / F.sqrt(var))
    return j.select(
        F.col("k").cast("long").alias("k"),
        F.col("n_subjects").cast("long").alias("n_subjects"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        l_stat.alias("l_stat"), mu.alias("mu_l"),
        F.when(var > 0.0, F.sqrt(var)).alias("sigma_l"),
        z.alias("z"))


def cohens_d(df: DataFrame, flag_col: str, value_col: str) -> DataFrame:
    """Cohen's d / Hedges' g standardized mean difference between the
    ``flag_col`` = 1 and = 0 samples — the effect size a dashboard
    reports next to :func:`welch_ttest`'s p-value:

        d = (m₁ − m₀) / s_p,
        s²_p = ((n₁−1)s₁² + (n₀−1)s₀²) / (n₁+n₀−2),
        g = d · (1 − 3/(4(n₁+n₀) − 9))

    ``value_col`` integer-quantized: per-arm (n, Σv, Σv²) exact int64
    (Σv² int64-safe for |v| cents < ~3·10⁹ per row; DECIMAL(38,0) at
    wider scale, same plan), the two variances / d / g mirrored float
    expressions.  NULL d/g when either arm has < 2 rows or the pooled
    variance is 0.  Returns one row: (n1, n0, mean1, mean0,
    var_pooled, cohens_d, hedges_g)."""
    flag = F.col(flag_col).cast("long")
    v = F.col(value_col).cast("long")
    a = F.when(flag == 1, v)
    b = F.when(flag == 0, v)
    agg = (df.filter(flag.isNotNull() & v.isNotNull())
             .agg(F.count(a).alias("n1"), F.sum(a).alias("s1"),
                  F.sum(a * a).alias("ss1"),
                  F.count(b).alias("n0"), F.sum(b).alias("s0"),
                  F.sum(b * b).alias("ss0")))

    def d(c):
        return F.col(c).cast("double")

    n1, n0 = d("n1"), d("n0")
    m1, m0 = d("s1") / n1, d("s0") / n0
    ss1c = d("ss1") - d("s1") * d("s1") / n1
    ss0c = d("ss0") - d("s0") * d("s0") / n0
    vp = (ss1c + ss0c) / (n1 + n0 - 2.0)
    ok = (F.col("n1") >= 2) & (F.col("n0") >= 2)
    cd = F.when(ok & (vp > 0.0), (m1 - m0) / F.sqrt(vp))
    g = cd * (F.lit(1.0) - F.lit(3.0) / (4.0 * (n1 + n0) - 9.0))
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n0").cast("long").alias("n0"),
        F.when(F.col("n1") > 0, m1).alias("mean1"),
        F.when(F.col("n0") > 0, m0).alias("mean0"),
        F.when(ok, vp).alias("var_pooled"),
        cd.alias("cohens_d"), g.alias("hedges_g"))


def somers_d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Somers' D (Somers 1962) — the ASYMMETRIC ordinal association
    completing :func:`kendall_tau`: concordant minus discordant pairs
    normalized by pairs untied on the CONDITIONING variable,

        D(Y|X) = (C − D) / (n₀ − T_x),
        D(X|Y) = (C − D) / (n₀ − T_y)

    with n₀ = n(n−1)/2 and T_x = Σ tₓ(tₓ−1)/2 the tie counts.  Same
    contingency-table plan as kendall_tau (cell self-join on
    xa < xb — O(distinct²), never O(n²) rows; all counts exact
    int64).  D(Y|X) is the Gini-like rank version of "how well does
    X order Y" (for a binary Y it equals 2·AUC − 1).  NULL when the
    corresponding denominator is 0.  Returns one row: (n, concordant,
    discordant, d_yx, d_xy)."""
    base = df.select(F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
    cells = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    a = cells.select(F.col("x").alias("xa"), F.col("y").alias("ya"),
                     F.col("c").alias("ca"))
    b = cells.select(F.col("x").alias("xb"), F.col("y").alias("yb"),
                     F.col("c").alias("cb"))
    prods = (a.join(b, (F.col("xa") < F.col("xb")))
             .select((F.col("ca") * F.col("cb")).alias("p"),
                     F.when(F.col("ya") < F.col("yb"), F.lit(1))
                      .when(F.col("ya") > F.col("yb"), F.lit(-1))
                      .otherwise(F.lit(0)).alias("sgn")))
    cd = prods.agg(
        F.sum(F.when(F.col("sgn") == 1, F.col("p")).otherwise(0))
         .alias("conc"),
        F.sum(F.when(F.col("sgn") == -1, F.col("p")).otherwise(0))
         .alias("disc"))
    tx = (cells.groupBy("x").agg(F.sum("c").alias("t"))
          .agg(F.sum(F.col("t") * (F.col("t") - 1)).alias("tx2"),
               F.sum("t").alias("n")))
    ty = (cells.groupBy("y").agg(F.sum("c").alias("t"))
          .agg(F.sum(F.col("t") * (F.col("t") - 1)).alias("ty2")))
    s = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    n = F.col("n")
    n0x2 = n * (n - 1)              # 2·n0
    numd = (F.col("conc") - F.col("disc")).cast("double")
    den_yx = (n0x2 - F.col("tx2")).cast("double")
    den_xy = (n0x2 - F.col("ty2")).cast("double")
    return s.select(
        n.cast("long").alias("n"),
        F.coalesce(F.col("conc"), F.lit(0)).cast("long")
         .alias("concordant"),
        F.coalesce(F.col("disc"), F.lit(0)).cast("long")
         .alias("discordant"),
        F.when(n0x2 > F.col("tx2"),
               F.lit(2.0) * numd / den_yx).alias("d_yx"),
        F.when(n0x2 > F.col("ty2"),
               F.lit(2.0) * numd / den_xy).alias("d_xy"))


def sign_test(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Paired sign test — the assumption-free "did X beat Y more
    often than chance" check (the median test for paired data):
    counts of positive / negative / tied differences, exact int64
    from one aggregate, and the normal-approximation

        z = (n₊ − n/2) / √(n/4),   n = n₊ + n₋   (ties dropped)

    as the one mirrored float expression.  NULL z when n = 0.
    Returns one row: (n_pos, n_neg, n_tie, z)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = (df.filter(x.isNotNull() & y.isNotNull())
             .agg(F.sum((x > y).cast("long")).alias("n_pos"),
                  F.sum((x < y).cast("long")).alias("n_neg"),
                  F.sum((x == y).cast("long")).alias("n_tie")))
    n = (F.col("n_pos") + F.col("n_neg")).cast("double")
    z = F.when(F.col("n_pos") + F.col("n_neg") > 0,
               (F.col("n_pos").cast("double") - n / 2.0)
               / F.sqrt(n / 4.0))
    return agg.select(
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("long")
         .alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).cast("long")
         .alias("n_neg"),
        F.coalesce(F.col("n_tie"), F.lit(0)).cast("long")
         .alias("n_tie"),
        z.alias("z"))


def wilcoxon_signed_rank(df: DataFrame, x_col: str,
                         y_col: str) -> DataFrame:
    """Wilcoxon signed-rank test for paired samples — the
    magnitude-aware upgrade of :func:`sign_test`: differences
    d = x − y, zeros dropped (Wilcoxon's convention), |d| ranked with
    DOUBLED average ranks off the |d| count table (module docstring —
    exact int64, no row sort), W₂₊ = Σ r2 over positive d:

        z = (W₂₊ − n(n+1)/2) / (2σ),
        σ² = n(n+1)(2n+1)/24 − Σ(t³−t)/48

    (the doubled-rank W has mean n(n+1)/2 and twice the sd).  Every
    sufficient statistic (n, W₂₊, Σ(t³−t)) is exact int64; z is one
    mirrored float expression, NULL when n = 0 or σ = 0 (all |d|
    tied in one bucket can still have σ > 0; σ = 0 only when n < 2).
    Overflow: t³ ≤ n³ — int64-safe per tied |d| to n ~ 2M
    (DECIMAL(38,0) at corpus scale, same plan).  Returns one row:
    (n_nonzero, n_zero, w2_plus, z)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    d0 = (df.filter(x.isNotNull() & y.isNotNull())
            .select((x - y).alias("d")))
    zeros = d0.filter(F.col("d") == 0) \
              .agg(F.count(F.lit(1)).alias("n_zero"))
    nz = d0.filter(F.col("d") != 0) \
           .select(F.abs(F.col("d")).alias("a"),
                   (F.col("d") > 0).cast("long").alias("pos"))
    per_a = nz.groupBy("a").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("pos").alias("tp"))
    w_run = (Window.orderBy("a")
             .rowsBetween(Window.unboundedPreceding, -1))
    ranked = per_a.select(
        "a", "t", "tp",
        (F.lit(2) * (F.coalesce(F.sum("t").over(w_run), F.lit(0)) + 1)
         + F.col("t") - 1).alias("r2"))
    s = ranked.agg(
        F.sum("t").alias("n"),
        F.sum(F.col("tp") * F.col("r2")).alias("w2p"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .alias("tc"))
    s = s.crossJoin(F.broadcast(zeros))
    nd = F.col("n").cast("double")
    var = (nd * (nd + 1.0) * (2.0 * nd + 1.0) / F.lit(24.0)
           - F.col("tc").cast("double") / F.lit(48.0))
    z = F.when((F.col("n") > 0) & (var > 0.0),
               (F.col("w2p").cast("double")
                - nd * (nd + 1.0) / 2.0)
               / (F.lit(2.0) * F.sqrt(var)))
    return s.select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long")
         .alias("n_nonzero"),
        F.col("n_zero").cast("long").alias("n_zero"),
        F.coalesce(F.col("w2p"), F.lit(0)).cast("long")
         .alias("w2_plus"),
        z.alias("z"))


def jonckheere(df: DataFrame, group_col: str,
               value_col: str) -> DataFrame:
    """Jonckheere–Terpstra trend test for an ORDERED alternative
    across k INDEPENDENT groups (the kruskal_wallis companion the way
    page_trend companions friedman_test), groups ordered by their
    integer key:

        J = Σ_{i<j} U_ij   (pairwise Mann-Whitney counts,
                            ties half-credit)

    Computed on the per-(group, value) COUNT TABLE: doubled
    J2 = Σ 2·c_a·c_b·[v_a < v_b] + c_a·c_b·[v_a = v_b] over cell
    pairs with g_a < g_b — exact int64, O(cells²) in the bounded
    quantized alphabet (the kendall_tau contract), never O(n²) rows.
    z uses the standard no-tie moments (documented approximation
    under heavy ties; J itself carries exact half-credit):

        μ = (N² − Σnᵢ²)/4,
        σ² = [N²(2N+3) − Σnᵢ²(2nᵢ+3)]/72

    Returns one row: (k, n, j2, z) — NULL z when σ = 0 (single
    group or empty)."""
    g = F.col(group_col).cast("long")
    v = F.col(value_col).cast("long")
    base = (df.filter(g.isNotNull() & v.isNotNull())
              .select(g.alias("g"), v.alias("v")))
    cells = base.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    a = cells.select(F.col("g").alias("ga"), F.col("v").alias("va"),
                     F.col("c").alias("ca"))
    b = cells.select(F.col("g").alias("gb"), F.col("v").alias("vb"),
                     F.col("c").alias("cb"))
    j2 = (a.join(b, F.col("ga") < F.col("gb"))
          .agg(F.sum(
              F.when(F.col("va") < F.col("vb"),
                     2 * F.col("ca") * F.col("cb"))
               .when(F.col("va") == F.col("vb"),
                     F.col("ca") * F.col("cb"))
               .otherwise(F.lit(0))).alias("j2")))
    per_g = (cells.groupBy("g").agg(F.sum("c").alias("ni"))
             .agg(F.count(F.lit(1)).alias("k"),
                  F.sum("ni").alias("n"),
                  F.sum(F.col("ni") * F.col("ni")).alias("sn2"),
                  F.sum(F.col("ni") * F.col("ni")
                        * (2 * F.col("ni") + 3)).alias("sn23")))
    s = j2.crossJoin(F.broadcast(per_g))
    nd = F.col("n").cast("double")
    mu = (nd * nd - F.col("sn2").cast("double")) / F.lit(4.0)
    var = ((nd * nd * (2.0 * nd + 3.0)
            - F.col("sn23").cast("double")) / F.lit(72.0))
    z = F.when(var > 0.0,
               (F.col("j2").cast("double") / F.lit(2.0) - mu)
               / F.sqrt(var))
    return s.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.coalesce(F.col("j2"), F.lit(0)).cast("long").alias("j2"),
        z.alias("z"))


def mood_median(df: DataFrame, group_col: str,
                value_col: str) -> DataFrame:
    """Mood's median test — k-group location check on the 2×k table
    of counts above / not-above the GRAND median (doubled-median off
    the global count table, the engine convention; 2v > m2 is an
    exact integer split, at-median rows count "not above"):

        χ² = Σ_cells (O − E)²/E,   E = row·col/N   ~ χ²(k−1)

    All counts exact int64; the 2k χ² terms fold in group-key order
    (the anova_f convention).  NULL χ² when a margin is empty (all
    values on one side of the median).  Returns one row:
    (k, n, n_above, chi2, df)."""
    v = F.col(value_col).cast("long")
    base = (df.filter(v.isNotNull())
              .select(F.col(group_col).alias("g"), v.alias("v")))
    per_v = base.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    w_run = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
    w_all = Window.partitionBy()
    c = (per_v.withColumn("cum", F.sum("t").over(w_run))
              .withColumn("nt", F.sum("t").over(w_all)))
    lo_pos = (F.col("nt") + 1) - F.expr("nt DIV 2") - 1
    hi_pos = F.expr("nt DIV 2") + 1
    lo = (c.filter(F.col("cum") >= lo_pos)
          .agg(F.min("v").alias("lo")))
    hi = (c.filter(F.col("cum") >= hi_pos)
          .agg(F.min("v").alias("hi")))
    med = lo.crossJoin(hi).select(
        (F.col("lo") + F.col("hi")).alias("m2"))
    tagged = base.crossJoin(F.broadcast(med)).select(
        "g", (F.lit(2) * F.col("v") > F.col("m2")).cast("long")
        .alias("ab"))
    per_g = tagged.groupBy("g").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum("ab").alias("ai"))
    tot = per_g.agg(F.sum("ni").alias("n"),
                    F.sum("ai").alias("n_above"),
                    F.count(F.lit(1)).alias("k"))
    j = per_g.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    pa = F.col("n_above").cast("double") / nd

    ea = F.col("ni").cast("double") * pa
    eb = F.col("ni").cast("double") * (F.lit(1.0) - pa)
    term = (
        (F.col("ai").cast("double") - ea)
        * (F.col("ai").cast("double") - ea) / ea
        + ((F.col("ni") - F.col("ai")).cast("double") - eb)
        * ((F.col("ni") - F.col("ai")).cast("double") - eb) / eb)
    folded = j.groupBy("n", "n_above", "k").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("g").alias("g"), term.alias("t")))),
                lambda s: s["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("chi2"))
    ok = ((F.col("n_above") > 0)
          & (F.col("n_above") < F.col("n")))
    return folded.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.col("n_above").cast("long").alias("n_above"),
        F.when(ok, F.col("chi2")).alias("chi2"),
        (F.col("k") - 1).cast("long").alias("df"))


def goodman_kruskal(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Goodman–Kruskal gamma and lambda (Goodman & Kruskal 1954) —
    the two classical PRE association measures completing the ordinal
    family around :func:`kendall_tau` / :func:`somers_d`:

        gamma = (C − D)/(C + D)          (ordinal, ties ignored)
        lambda(Y|X) = (Σ_x max_y c_xy − max_y c_+y)/(n − max_y c_+y)
        lambda(X|Y) = symmetric           (nominal, error-reduction)

    C/D come off the same contingency-cell self-join as kendall_tau —
    O(V²) in DISTINCT value pairs, never O(n²) in rows — and every
    lambda ingredient is an exact int64 max/sum of cell counts, so
    the only float op is the final division.  Modal counts use plain
    MAX (value-free, order-free — no tie rule needed for a count
    maximum).  gamma is NULL when C+D = 0; lambda(Y|X) NULL when the
    modal y column holds all rows (nothing to reduce), likewise
    lambda(X|Y).  Returns one row: (n, concordant, discordant, gamma,
    lambda_y_x, lambda_x_y)."""
    base = df.select(F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
    cells = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    a = cells.select(F.col("x").alias("xa"), F.col("y").alias("ya"),
                     F.col("c").alias("ca"))
    b = cells.select(F.col("x").alias("xb"), F.col("y").alias("yb"),
                     F.col("c").alias("cb"))
    # bounded cell table -> broadcast one side of the pair join (no
    # join shuffle); the three cells branches below are identical
    # subtrees AQE deduplicates via ReusedExchange at runtime
    cd = (a.join(F.broadcast(b), F.col("xa") < F.col("xb"))
          .agg(F.sum(F.when(F.col("ya") < F.col("yb"),
                            F.col("ca") * F.col("cb")).otherwise(0))
               .alias("conc"),
               F.sum(F.when(F.col("ya") > F.col("yb"),
                            F.col("ca") * F.col("cb")).otherwise(0))
               .alias("disc")))
    # per-x marginal total + modal count in ONE regroup (same for y)
    mx = (cells.groupBy("x").agg(F.sum("c").alias("cx"),
                                 F.max("c").alias("mx"))
          .agg(F.sum("mx").alias("sum_mx"),
               F.max("cx").alias("mode_x"), F.sum("cx").alias("n")))
    my = (cells.groupBy("y").agg(F.sum("c").alias("cy"),
                                 F.max("c").alias("my"))
          .agg(F.sum("my").alias("sum_my"),
               F.max("cy").alias("mode_y")))
    s = cd.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(my))

    def dd(c):
        return F.col(c).cast("double")

    gamma = F.when(
        (F.col("conc") + F.col("disc")) > 0,
        (dd("conc") - dd("disc")) / (dd("conc") + dd("disc")))
    lam_yx = F.when(
        F.col("n") > F.col("mode_y"),
        (dd("sum_mx") - dd("mode_y")) / (dd("n") - dd("mode_y")))
    lam_xy = F.when(
        F.col("n") > F.col("mode_x"),
        (dd("sum_my") - dd("mode_x")) / (dd("n") - dd("mode_x")))
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.col("conc").cast("long").alias("concordant"),
        F.col("disc").cast("long").alias("discordant"),
        gamma.alias("gamma"),
        lam_yx.alias("lambda_y_x"),
        lam_xy.alias("lambda_x_y"))


def kendall_w(df: DataFrame, subject_col: str, treatment_col: str,
              value_col: str) -> DataFrame:
    """Kendall's coefficient of concordance W across k "raters"
    (treatments) judging n "items" (subjects) — the effect-size
    companion of :func:`friedman_test` (W = Q/(n(k−1)) with the same
    tie correction), read as agreement ∈ [0, 1].

    Rides `_friedman_blocks` verbatim: complete blocks only (dropped
    AND counted), doubled within-block ranks exact int64, so

        W = Q / (n(k−1))

    is one extra mirrored division on the Friedman machinery.  NULL
    whenever Q is (no complete blocks, k < 2, or all-tied blocks).
    Returns one row: (n_subjects, k, n_dropped, w)."""
    q = friedman_test(df, subject_col, treatment_col, value_col)
    w = F.when(
        F.col("q_stat").isNotNull()
        & (F.col("n_subjects") > 0) & (F.col("k") > 1),
        F.col("q_stat")
        / (F.col("n_subjects") * (F.col("k") - 1)).cast("double"))
    return q.select("n_subjects", "k", "n_dropped", w.alias("w"))


def dunn_test(df: DataFrame, group_col: str,
              value_col: str) -> DataFrame:
    """Dunn's post-hoc pairwise test (Dunn 1964) — the follow-up
    :func:`kruskal_wallis` points at: which PAIRS of groups differ,
    on the pooled-rank scale with the KW tie correction:

        z_ij = (R̄_i − R̄_j) / sqrt( (N(N+1)/12 − Σ(t³−t)/(12(N−1)))
                                     · (1/n_i + 1/n_j) )

    Doubled average ranks off the pooled value count table keep every
    sufficient statistic exact int64 (module docstring); mean ranks,
    z and the two-sided p (the A-S erfc polynomial, the
    :func:`mann_whitney` convention) are mirrored float expressions.
    Feed the p's to ``drift.bh_adjust`` for multiplicity control.
    Groups must be a bounded set (the pairwise output is groups²).
    Returns one row per unordered pair (g_a < g_b): (g_a, g_b, n_a,
    n_b, mean_rank_a, mean_rank_b, z, p_value); z/p NULL on a
    degenerate pooled variance."""
    base = df.select(F.col(group_col).alias("g"),
                     F.col(value_col).cast("long").alias("v"))
    per_v = base.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    w_run = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding, -1))
    ranked = per_v.select(
        "v", "t",
        (F.lit(2) * (F.coalesce(F.sum("t").over(w_run), F.lit(0)) + 1)
         + F.col("t") - 1).alias("r2"))
    tot = ranked.agg(
        F.sum("t").alias("nn"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .alias("tc"))
    j = base.join(ranked.select("v", "r2"), "v")
    per_g = j.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r2").alias("r2sum"))
    a = per_g.select(F.col("g").alias("ga"), F.col("n").alias("na"),
                     F.col("r2sum").alias("ra"))
    b = per_g.select(F.col("g").alias("gb"), F.col("n").alias("nb"),
                     F.col("r2sum").alias("rb"))
    pairs = (a.join(F.broadcast(b), F.col("ga") < F.col("gb"))
             .crossJoin(F.broadcast(tot)))

    def dd(c):
        return F.col(c).cast("double")

    nd = dd("nn")
    # mean ranks from doubled sums: R̄ = r2sum / (2 n)
    mra = dd("ra") / (F.lit(2.0) * dd("na"))
    mrb = dd("rb") / (F.lit(2.0) * dd("nb"))
    var = (nd * (nd + 1.0) / F.lit(12.0)
           - dd("tc") / (F.lit(12.0) * (nd - 1.0))) \
        * (F.lit(1.0) / dd("na") + F.lit(1.0) / dd("nb"))
    z = F.when(var > 0.0, (mra - mrb) / F.sqrt(var))
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t_ = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    p = (t_ * (F.lit(0.254829592)
         + t_ * (F.lit(-0.284496736)
         + t_ * (F.lit(1.421413741)
         + t_ * (F.lit(-1.453152027)
         + t_ * F.lit(1.061405429)))))) * F.exp(-(x * x))
    return pairs.select(
        F.col("ga").alias("g_a"), F.col("gb").alias("g_b"),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        mra.alias("mean_rank_a"), mrb.alias("mean_rank_b"),
        z.alias("z"), p.alias("p_value"))
