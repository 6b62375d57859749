"""Feature-drift metrics between two populations of the same table.

Population Stability Index per feature key: with reference shares
``p_i`` and current shares ``q_i`` over a common bucketing,

    PSI = Σ_i (q_i - p_i) · ln(q_i / p_i)

(> 0.1 is the conventional "investigate", > 0.25 "shifted").  A
point-in-time feature pipeline needs this as a first-class operator:
before a model trained on window A scores window B, drift over exactly
the served feature encoding is the go/no-go signal.

Scale shape: one partial-aggregated ``groupBy(key, bucket)`` counting
both periods in a single pass over the input (no self-join of the two
populations), then a ``groupBy(key)`` reduction over the (small)
bucket set — two map-side-combined shuffles, output one row per key.
Determinism: counts stay integers until the final share division;
Laplace add-one smoothing (count+1 over total+n_buckets) keeps ``ln``
finite on empty buckets; and the per-key bucket terms are summed in
sorted-bucket order via ``array_sort`` + ``aggregate`` — float
addition is not associative, so a fixed order is what makes the result
identical run-to-run and mirrorable in another engine (DuckDB
``list_sort``/``list_reduce``) to the last double, modulo libm's
``ln`` ulp (callers round for cross-engine comparison).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def psi_drift(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    is_reference: Column,
    psi_col: str = "psi",
) -> DataFrame:
    """PSI per ``key_cols`` group between the rows where
    ``is_reference`` is true (reference period) and the rest (current
    period), over the discrete ``bucket_col`` values observed in either
    period.  Returns one row per key: ``n_ref``, ``n_cur``, ``psi``.
    """
    key_cols = list(key_cols)
    ref = is_reference.cast("long")
    per_bucket = (
        df.groupBy(*key_cols, bucket_col)
          .agg(F.sum(ref).alias("__cr"),
               F.sum(1 - ref).alias("__cc"))
    )
    per_key = (
        per_bucket
        .groupBy(*key_cols)
        .agg(F.sum("__cr").alias("n_ref"),
             F.sum("__cc").alias("n_cur"),
             F.count(F.lit(1)).alias("__nb"),
             # struct sorts field-by-field, bucket first → a total,
             # partition-layout-independent order for the float sum
             F.array_sort(F.collect_list(
                 F.struct(F.col(bucket_col).alias("b"),
                          F.col("__cr").alias("cr"),
                          F.col("__cc").alias("cc")))).alias("__b"))
    )

    def share(count, total):
        return (count.cast("double") + 1.0) / (
            total.cast("double") + F.col("__nb").cast("double"))

    def term(acc, b):
        q = share(b["cc"], F.col("n_cur"))
        p = share(b["cr"], F.col("n_ref"))
        return acc + (q - p) * F.log(q / p)

    return (per_key
            .withColumn(psi_col, F.aggregate("__b", F.lit(0.0), term))
            .drop("__b", "__nb"))


def jsd_drift(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    is_reference: Column,
    jsd_col: str = "jsd",
) -> DataFrame:
    """Jensen–Shannon divergence per ``key_cols`` group between the
    reference and current populations over ``bucket_col``:

        JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),   m = (p+q)/2

    Symmetric and bounded by ``ln 2`` (nats) — unlike PSI it cannot
    blow up on a bucket one side barely touches, so it is the better
    alarm metric for heavy-tailed feature distributions; PSI remains
    the industry-threshold report.  Same two map-side-combined shuffles
    and sorted-bucket float summation as :func:`psi_drift` (see module
    docstring for why the order is load-bearing).  Returns one row per
    key: ``n_ref``, ``n_cur``, ``jsd``.
    """
    key_cols = list(key_cols)
    ref = is_reference.cast("long")
    per_bucket = (
        df.groupBy(*key_cols, bucket_col)
          .agg(F.sum(ref).alias("__cr"),
               F.sum(1 - ref).alias("__cc"))
    )
    per_key = (
        per_bucket
        .groupBy(*key_cols)
        .agg(F.sum("__cr").alias("n_ref"),
             F.sum("__cc").alias("n_cur"),
             F.count(F.lit(1)).alias("__nb"),
             F.array_sort(F.collect_list(
                 F.struct(F.col(bucket_col).alias("b"),
                          F.col("__cr").alias("cr"),
                          F.col("__cc").alias("cc")))).alias("__b"))
    )

    def share(count, total):
        return (count.cast("double") + 1.0) / (
            total.cast("double") + F.col("__nb").cast("double"))

    def term(acc, b):
        p = share(b["cr"], F.col("n_ref"))
        q = share(b["cc"], F.col("n_cur"))
        m = (p + q) / 2.0
        return acc + (0.5 * (p * F.log(p / m)) + 0.5 * (q * F.log(q / m)))

    return (per_key
            .withColumn(jsd_col, F.aggregate("__b", F.lit(0.0), term))
            .drop("__b", "__nb"))


def ks_statistic(
    df: DataFrame,
    value_col: str,
    is_reference,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the rows
    where ``is_reference`` holds and the rest:
    ``D = max over values of |F_ref(v) − F_cur(v)|`` — the
    distribution-shift metric that, unlike PSI, needs no binning
    choices (it IS the sup-norm of the empirical CDF gap).

    Same scale shape as the exact-AUC machinery: one
    ``groupBy(value)`` over the (integer-quantized) column reduces the
    data to its distinct-value table; cumulative counts and the max
    run over that bounded table.  Every term is an exact integer ratio
    — engine-reproducible.  Returns one row ``(ks, at_value, n_ref,
    n_cur)`` with the (lowest) value where the gap is attained.

    NULL ``value_col`` rows are excluded here (a NULL would otherwise
    form its own group, sort first in the cumulative window, and shift
    both ECDFs) — the same handle-NULLs-upstream contract
    :func:`corr_matrix` documents, enforced rather than assumed."""
    ref = is_reference.cast("long")
    per = (df.filter(F.col(value_col).isNotNull())
             .groupBy(value_col)
             .agg(F.sum(ref).alias("a"),
                  (F.count(ref) - F.sum(ref)).alias("b")))
    w = (Window.orderBy(value_col)
               .rowsBetween(Window.unboundedPreceding,
                            Window.currentRow))
    g = Window.partitionBy()
    gap = F.abs(F.sum("a").over(w) / F.sum("a").over(g)
                - F.sum("b").over(w) / F.sum("b").over(g))
    t = (per.withColumn("gap", gap)
            .withColumn("best", F.max("gap").over(g))
            .withColumn("na", F.sum("a").over(g))
            .withColumn("nb", F.sum("b").over(g)))
    return (t.filter(F.col("gap") == F.col("best"))
             .groupBy()
             .agg(F.max("best").alias("ks"),
                  F.min(value_col).alias("at_value"),
                  F.max("na").alias("n_ref"),
                  F.max("nb").alias("n_cur")))


def wasserstein_1(
    df: DataFrame,
    value_col: str,
    is_reference,
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between the two
    populations of an INTEGER-quantized column:

        W1 = ∫ |F_ref(v) − F_cur(v)| dv
           = Σ_i |F_ref(v_i) − F_cur(v_i)| · (v_{i+1} − v_i)

    over the sorted distinct values — the drift metric that, unlike KS
    (sup norm) weights HOW FAR mass moved, and unlike PSI needs no
    binning.  Same count-table shape as :func:`ks_statistic`: one
    ``groupBy(value)`` reduces the data to its distinct-value table;
    the CDF gaps run over that bounded table.

    Exactness discipline (the trimmed-mean trick): the float division
    is deferred to the very end — the summed quantity is the exact
    integer ``S = Σ |a_cum·n_cur − b_cum·n_ref| · Δv`` and
    ``W1 = S / (n_ref · n_cur)`` is ONE division, so the result is
    bit-identical across layouts and engines.  Bound: ``S`` must fit
    int64 — |values| · n_ref · n_cur · range; at 10^12 rows quantize
    coarser or swap the sum to DECIMAL(38).  NULLs excluded as in
    :func:`ks_statistic`.  Returns ``(w1, n_ref, n_cur)``."""
    ref = is_reference.cast("long")
    per = (df.filter(F.col(value_col).isNotNull())
             .groupBy(value_col)
             .agg(F.sum(ref).alias("a"),
                  (F.count(ref) - F.sum(ref)).alias("b")))
    w = (Window.orderBy(value_col)
               .rowsBetween(Window.unboundedPreceding,
                            Window.currentRow))
    g = Window.partitionBy()
    nxt = F.lead(value_col).over(Window.orderBy(value_col))
    t = (per.withColumn("acum", F.sum("a").over(w))
            .withColumn("bcum", F.sum("b").over(w))
            .withColumn("na", F.sum("a").over(g))
            .withColumn("nb", F.sum("b").over(g))
            .withColumn("dv", F.coalesce(nxt - F.col(value_col),
                                         F.lit(0))))
    term = (F.abs(F.col("acum") * F.col("nb")
                  - F.col("bcum") * F.col("na")) * F.col("dv"))
    return (t.groupBy()
             .agg(F.sum(term).alias("s"),
                  F.max("na").alias("n_ref"),
                  F.max("nb").alias("n_cur"))
             .select((F.col("s").cast("double")
                      / (F.col("n_ref") * F.col("n_cur")).cast("double"))
                     .alias("w1"),
                     "n_ref", "n_cur"))


def ks_by_feature(
    df: DataFrame,
    feature_cols: Sequence[str],
    is_reference,
) -> DataFrame:
    """Exact two-sample KS for EVERY feature at once — the drift
    dashboard in one unpivoted count shuffle: features stack to
    (feature, value) rows, one ``groupBy(feature, value)`` builds all
    the distinct-value tables, and the per-feature cumulative windows
    run on that bounded table.  Same exact-integer-ratio math as
    :func:`ks_statistic`; NULL values are excluded per its documented
    contract.  Returns one row per feature:
    (feature, ks, at_value, n_ref, n_cur)."""
    pairs = ", ".join(f"'{c}', CAST({c} AS LONG)"
                      for c in feature_cols)
    long_df = df.selectExpr(
        f"stack({len(feature_cols)}, {pairs}) AS (feature, value)",
        "*")
    ref = is_reference.cast("long")
    per = (long_df.filter(F.col("value").isNotNull())
           .groupBy("feature", "value")
           .agg(F.sum(ref).alias("a"),
                (F.count(ref) - F.sum(ref)).alias("b")))
    w = (Window.partitionBy("feature").orderBy("value")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = Window.partitionBy("feature")
    gap = F.abs(F.sum("a").over(w) / F.sum("a").over(g)
                - F.sum("b").over(w) / F.sum("b").over(g))
    t = (per.withColumn("gap", gap)
         .withColumn("best", F.max("gap").over(g))
         .withColumn("na", F.sum("a").over(g))
         .withColumn("nb", F.sum("b").over(g)))
    return (t.filter(F.col("gap") == F.col("best"))
            .groupBy("feature")
            .agg(F.max("best").alias("ks"),
                 F.min("value").alias("at_value"),
                 F.max("na").alias("n_ref"),
                 F.max("nb").alias("n_cur")))


def bh_adjust(df: DataFrame, key_col: str, p_col: str,
              alpha: float = 0.05) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over m hypotheses (one
    row each): sort p ascending (ties by key), find the largest rank
    k* with p_(i) ≤ i·α/m, reject hypotheses ranked ≤ k*.

    The m hypotheses are a bounded analysis frame (features, not
    rows), so the rank window is a single tiny partition by contract.
    The threshold comparison mirrors exactly in SQL: i·α/m is one
    float expression per row and k* is a windowed max over the
    comparison flags.  Returns (key, p, rank, m, bh_threshold,
    reject).
    """
    w = Window.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    g = Window.partitionBy()
    m = F.count(F.lit(1)).over(g)
    ranked = df.select(
        F.col(key_col).alias("key"),
        F.col(p_col).cast("double").alias("p"),
        F.row_number().over(w).alias("rank"))
    thr = (F.col("rank").cast("double") * F.lit(float(alpha))
           / m.cast("double"))
    flagged = (ranked
               .withColumn("m", m.cast("long"))
               .withColumn("bh_threshold", thr)
               .withColumn("__hit",
                           F.when(F.col("p") <= thr, F.col("rank"))))
    kstar = F.max("__hit").over(g)
    return (flagged
            .withColumn("reject",
                        F.when(kstar.isNull(), F.lit(False))
                        .otherwise(F.col("rank") <= kstar))
            .drop("__hit"))


def ks_drift_fdr(df: DataFrame, feature_cols: Sequence[str],
                 is_reference, alpha: float = 0.05) -> DataFrame:
    """The drift dashboard with error control: every feature's exact
    two-sample KS (:func:`ks_by_feature`), the asymptotic Smirnov
    p-value

        p = min(1, 2·exp(−2·(n_a·n_b/(n_a+n_b))·D²))

    and Benjamini-Hochberg rejection at FDR ``alpha`` — the standard
    way to read "which of my 500 features actually drifted" without
    500 independent α-level tests lighting up by chance.

    The exp/ln pair is the engine's declared libm dependency (same as
    every MI/entropy fold); D and the counts are exact, the p-value
    is one mirrored float expression.  Returns one row per feature:
    (key, ks, p, rank, m, bh_threshold, reject).
    """
    ks = ks_by_feature(df, feature_cols, is_reference)
    d = F.col("ks")
    na, nb = F.col("n_ref").cast("double"), F.col("n_cur").cast("double")
    p = F.least(
        F.lit(1.0),
        F.lit(2.0) * F.exp(F.lit(-2.0) * (na * nb / (na + nb))
                           * d * d))
    scored = ks.select(F.col("feature"), F.col("ks"), p.alias("p"))
    out = bh_adjust(scored, "feature", "p", alpha=alpha)
    return (out.join(scored.select(F.col("feature").alias("key"),
                                   "ks"), "key")
            .select("key", "ks", "p", "rank", "m", "bh_threshold",
                    "reject"))


def ks_test(
    df: DataFrame,
    value_col: str,
    is_reference,
    terms: int = 20,
) -> DataFrame:
    """Two-sample KS test: the exact statistic of
    :func:`ks_statistic` plus the asymptotic p-value via the
    Kolmogorov distribution (Smirnov 1948 approximation with
    Stephens' small-sample correction):

        n_e = n_ref·n_cur / (n_ref + n_cur)
        λ   = (√n_e + 0.12 + 0.11/√n_e) · D
        p   = 2 Σ_{k=1..terms} (−1)^{k−1} e^{−2k²λ²}   (clamped to
              [0, 1])

    The series is evaluated as a FIXED-LENGTH left fold in ascending
    ``k``, so the double is reproducible and the SQL oracle replays
    it term-for-term.  Below λ = 0.25 the truncated alternating
    series is unusable (every term ≈ 1; at λ = 0 twenty terms cancel
    to exactly 0 while the true p is 1) — there p is pinned to 1.0,
    the correct value to well below double noise (the Kolmogorov CDF
    at 0.25 is ~4e-11); at λ ≥ 0.25 the k=20 tail is ≤ e⁻⁵⁰.  The
    asymptotic p-value is the standard large-sample approximation —
    quote it with that caveat below ~25 effective samples.

    Returns one row: (ks, at_value, n_ref, n_cur, lambda, p_value).
    """
    base = ks_statistic(df, value_col, is_reference)
    ne = (F.col("n_ref").cast("double") * F.col("n_cur").cast("double")
          / (F.col("n_ref") + F.col("n_cur")).cast("double"))
    lam = ((F.sqrt(ne) + 0.12 + 0.11 / F.sqrt(ne))
           * F.col("ks")).alias("lam")
    base = base.withColumn("lam", lam)
    p = F.lit(0.0)
    for k in range(1, int(terms) + 1):
        sign = 1.0 if k % 2 == 1 else -1.0
        p = p + F.lit(sign) * F.exp(F.lit(-2.0 * k * k)
                                    * F.col("lam") * F.col("lam"))
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), 2.0 * p))
    p = F.when(F.col("lam") < 0.25, F.lit(1.0)).otherwise(p)
    return base.select("ks", "at_value", "n_ref", "n_cur",
                       F.col("lam").alias("lambda"),
                       p.alias("p_value"))


def energy_distance(df: DataFrame, group_col: str, value_col: str,
                    a_label, b_label) -> DataFrame:
    """Székely's energy distance between the ``value_col``
    distributions of two groups: ``E = 2·E|X−Y| − E|X−X'| − E|Y−Y'|``
    (Székely & Rizzo 2004) — a drift statistic sensitive to ANY
    distributional difference, complementing the CDF-supremum KS and
    the binned PSI/JSD in this module.

    ``value_col`` must be integer-quantized.  The naive estimator is
    O(n·m) pairwise; here every pairwise absolute-sum collapses onto
    the distinct-value count table: with per-value counts and
    cumulative (count, sum) prefixes ordered by value, ``Σᵢⱼ|pᵢ−qⱼ| =
    Σ_v q(v)·[v·cP≤(v) − sP≤(v) + (sP − sP≤(v)) − v·(cP − cP≤(v))]``
    — one groupBy to the count table (bounded by the distinct-value
    domain), one ordered window over it, all three pairwise sums as
    exact int64 (int64-safe to ~n·m·|v|max ≈ 9e18; quantize coarser or
    DECIMAL beyond).  The statistic itself is the single mirrored
    float expression at the end.  Ordered pairs include i=j (a zero
    term), matching the V-statistic form."""
    v = F.col(value_col).cast("long")
    isa = (F.col(group_col) == a_label).cast("long")
    isb = (F.col(group_col) == b_label).cast("long")
    per = (df.filter(F.col(value_col).isNotNull()
                     & F.col(group_col).isin([a_label, b_label]))
             .groupBy(v.alias("v"))
             .agg(F.sum(isa).alias("ca"), F.sum(isb).alias("cb")))
    w = (Window.orderBy("v")
               .rowsBetween(Window.unboundedPreceding,
                            Window.currentRow))
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    per = (per
           .withColumn("ca_le", F.sum("ca").over(w))
           .withColumn("cb_le", F.sum("cb").over(w))
           .withColumn("sa_le", F.sum(F.col("ca") * F.col("v")).over(w))
           .withColumn("sb_le", F.sum(F.col("cb") * F.col("v")).over(w))
           .withColumn("ca_t", F.sum("ca").over(wt))
           .withColumn("cb_t", F.sum("cb").over(wt))
           .withColumn("sa_t", F.sum(F.col("ca") * F.col("v")).over(wt))
           .withColumn("sb_t", F.sum(F.col("cb") * F.col("v")).over(wt)))

    def absum(q_cnt, c_le, s_le, c_t, s_t):
        # Σ over this row's q-values of Σ_p |p − v|, all int64
        return q_cnt * (F.col("v") * c_le - s_le
                        + (s_t - s_le) - F.col("v") * (c_t - c_le))

    agg = per.agg(
        F.max("ca_t").alias("n_a"), F.max("cb_t").alias("n_b"),
        F.sum(absum(F.col("cb"), F.col("ca_le"), F.col("sa_le"),
                    F.col("ca_t"), F.col("sa_t"))).alias("s_ab"),
        F.sum(absum(F.col("ca"), F.col("ca_le"), F.col("sa_le"),
                    F.col("ca_t"), F.col("sa_t"))).alias("s_aa"),
        F.sum(absum(F.col("cb"), F.col("cb_le"), F.col("sb_le"),
                    F.col("cb_t"), F.col("sb_t"))).alias("s_bb"))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    energy = (2.0 * F.col("s_ab").cast("double") / (na * nb)
              - F.col("s_aa").cast("double") / (na * na)
              - F.col("s_bb").cast("double") / (nb * nb))
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("s_ab").cast("long").alias("s_ab"),
        F.col("s_aa").cast("long").alias("s_aa"),
        F.col("s_bb").cast("long").alias("s_bb"),
        energy.alias("energy_d"))


def hellinger_drift(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    is_reference: Column,
) -> DataFrame:
    """Hellinger distance per ``key_cols`` group between the reference
    and current populations over discrete ``bucket_col`` values:

        H = sqrt(1 − BC),   BC = Σ √(p·q)   (Bhattacharyya coefficient)

    H ∈ [0, 1] — a proper metric, unlike PSI (unbounded) and JSD
    (bounded but not a metric); the right choice when drift magnitudes
    must be comparable across features.  No smoothing is needed:
    buckets one side never saw contribute √(p·0) = 0 exactly.  Same
    two map-side-combined shuffles and sorted-bucket float fold as
    :func:`psi_drift` (module docstring: the order is load-bearing).
    Returns one row per key: ``n_ref``, ``n_cur``, ``bc``,
    ``hellinger`` — NULL when either period is empty.
    """
    key_cols = list(key_cols)
    ref = is_reference.cast("long")
    per_bucket = (
        df.groupBy(*key_cols, bucket_col)
          .agg(F.sum(ref).alias("__cr"),
               F.sum(1 - ref).alias("__cc"))
    )
    per_key = (
        per_bucket
        .groupBy(*key_cols)
        .agg(F.sum("__cr").alias("n_ref"),
             F.sum("__cc").alias("n_cur"),
             F.array_sort(F.collect_list(
                 F.struct(F.col(bucket_col).alias("b"),
                          F.col("__cr").alias("cr"),
                          F.col("__cc").alias("cc")))).alias("__b"))
    )

    def term(acc, b):
        p = b["cr"].cast("double") / F.col("n_ref").cast("double")
        q = b["cc"].cast("double") / F.col("n_cur").cast("double")
        return acc + F.sqrt(p * q)

    ok = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    bc = F.when(ok, F.aggregate("__b", F.lit(0.0), term))
    return (per_key
            .withColumn("bc", bc)
            .withColumn("hellinger",
                        F.sqrt(F.greatest(F.lit(0.0),
                                          F.lit(1.0) - F.col("bc"))))
            .drop("__b"))


def tv_drift(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    is_reference: Column,
) -> DataFrame:
    """Total-variation distance per ``key_cols`` group between the
    reference and current populations over discrete ``bucket_col``:

        TV = ½ Σ |p − q| = Σ|cr·n_cur − cc·n_ref| / (2·n_ref·n_cur)

    The numerator is an EXACT int64 integer fold of the bucket count
    table (cross-multiplying clears both denominators; order-
    independent because integer addition is associative), so TV is
    one mirrored float division — the only drift metric here that is
    exact up to a single rounding.  Overflow: cr·n_cur ≤ n², int64-
    safe to n ~ 3·10⁹ rows per key (DECIMAL(38,0) beyond, same plan).
    Returns one row per key: ``n_ref``, ``n_cur``, ``tv_num``, ``tv``
    — NULL tv when either period is empty.
    """
    key_cols = list(key_cols)
    ref = is_reference.cast("long")
    per_bucket = (
        df.groupBy(*key_cols, bucket_col)
          .agg(F.sum(ref).alias("__cr"),
               F.sum(1 - ref).alias("__cc"))
    )
    per_key = (
        per_bucket
        .groupBy(*key_cols)
        .agg(F.sum("__cr").alias("n_ref"),
             F.sum("__cc").alias("n_cur"),
             F.collect_list(F.struct(F.col("__cr").alias("cr"),
                                     F.col("__cc").alias("cc")))
             .alias("__b"))
    )
    num = F.aggregate(
        "__b", F.lit(0).cast("long"),
        lambda acc, b: acc + F.abs(b["cr"] * F.col("n_cur")
                                   - b["cc"] * F.col("n_ref")))
    ok = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    per_key = per_key.withColumn("tv_num", num).drop("__b")
    tv = F.when(ok, F.col("tv_num").cast("double")
                / (F.lit(2.0) * F.col("n_ref").cast("double")
                   * F.col("n_cur").cast("double")))
    return per_key.withColumn("tv", tv)


def mmd_rbf_drift(
    df: DataFrame,
    bucket_col: str,
    is_reference: Column,
    gamma: float = 1.0 / 128.0,
) -> DataFrame:
    """Biased two-sample Maximum Mean Discrepancy with an RBF kernel
    over a QUANTIZED value column — the kernel-space drift metric
    completing the PSI/JSD/Hellinger/TV family (and the two-sample
    face of the HSIC machinery this engine is built around):

        MMD² = S_rr/n_r² + S_cc/n_c² − 2·S_rc/(n_r·n_c)
        S_ab = Σ_{v,v'} a_v·b_{v'}·exp(−γ(v−v')²)

    Computed on the per-value count table: one O(V²) pair fold (the
    quantized-domain contract bounds V) accumulating all three sums
    in a single struct-accumulator pass, sorted pair order inside and
    out — mirrored by the oracle's nested list_reduce.  γ defaults to
    an exact binary fraction; the final round-6 absorbs last-ulp libm
    exp differences (the psi/ln convention).  Returns one row:
    (n_ref, n_cur, n_values, mmd2)."""
    g = F.lit(float(gamma))
    ref = is_reference.cast("long")
    per_v = (df.groupBy(F.col(bucket_col).alias("v"))
               .agg(F.sum(ref).alias("cr"),
                    F.sum(1 - ref).alias("cc")))
    one = per_v.agg(
        F.sum("cr").alias("n_ref"),
        F.sum("cc").alias("n_cur"),
        F.count(F.lit(1)).alias("n_values"),
        F.array_sort(F.collect_list(F.struct(
            F.col("v").alias("v"), F.col("cr").alias("cr"),
            F.col("cc").alias("cc")))).alias("cl"))
    cl = F.col("cl")

    def kern(a, b):
        d = (a - b)
        return F.exp(-g * (d * d).cast("double"))

    zero = F.struct(F.lit(0.0).alias("rr"), F.lit(0.0).alias("cc"),
                    F.lit(0.0).alias("rc"))

    def outer(acc, o):
        inner = F.aggregate(
            cl, zero,
            lambda a2, i: F.struct(
                (a2["rr"] + (o["cr"] * i["cr"]).cast("double")
                 * kern(o["v"], i["v"])).alias("rr"),
                (a2["cc"] + (o["cc"] * i["cc"]).cast("double")
                 * kern(o["v"], i["v"])).alias("cc"),
                (a2["rc"] + (o["cr"] * i["cc"]).cast("double")
                 * kern(o["v"], i["v"])).alias("rc")))
        return F.struct(
            (acc["rr"] + inner["rr"]).alias("rr"),
            (acc["cc"] + inner["cc"]).alias("cc"),
            (acc["rc"] + inner["rc"]).alias("rc"))

    s = F.aggregate(cl, zero, outer)
    nr = F.col("n_ref").cast("double")
    nc = F.col("n_cur").cast("double")
    ok = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    mmd2 = F.when(ok, s["rr"] / (nr * nr) + s["cc"] / (nc * nc)
                  - F.lit(2.0) * s["rc"] / (nr * nc))
    return one.select(
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.col("n_values").cast("long").alias("n_values"),
        mmd2.alias("mmd2"))


def by_adjust(df: DataFrame, key_col: str, p_col: str,
              alpha: float = 0.05) -> DataFrame:
    """Benjamini–Yekutieli step-up FDR control — :func:`bh_adjust`
    hardened for ARBITRARY dependence between the m hypotheses
    (BH's guarantee needs positive dependence) by spending
    α/c(m) with the harmonic correction c(m) = Σ_{i=1..m} 1/i:

        reject p_(i)  iff  ∃ k ≥ i with p_(k) ≤ k·α/(m·c(m))

    Same single-tiny-partition plan as bh_adjust; c(m) is an
    i-ordered float fold over the rank column so both engines sum
    the harmonic series in the identical order.  Returns (key, p,
    rank, m, by_threshold, reject)."""
    w = Window.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    g = Window.partitionBy()
    m = F.count(F.lit(1)).over(g)
    ranked = df.select(
        F.col(key_col).alias("key"),
        F.col(p_col).cast("double").alias("p"),
        F.row_number().over(w).alias("rank"))
    harm = F.aggregate(
        F.sort_array(F.collect_list(F.col("rank")).over(g)),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / i.cast("double"))
    thr = (F.col("rank").cast("double") * F.lit(float(alpha))
           / (m.cast("double") * harm))
    flagged = (ranked
               .withColumn("m", m.cast("long"))
               .withColumn("by_threshold", thr)
               .withColumn("__hit",
                           F.when(F.col("p") <= thr, F.col("rank"))))
    kstar = F.max("__hit").over(g)
    return (flagged
            .withColumn("reject",
                        F.when(kstar.isNull(), F.lit(False))
                        .otherwise(F.col("rank") <= kstar))
            .drop("__hit"))


def holm_adjust(df: DataFrame, key_col: str, p_col: str,
                alpha: float = 0.05) -> DataFrame:
    """Holm step-DOWN Bonferroni — FWER control (stronger guarantee
    than the BH/BY FDR pair, no dependence assumptions): sort p
    ascending, reject while p_(i) ≤ α/(m−i+1), stop at the first
    failure (everything after survives regardless of its p).

    The stop-at-first-failure rule is a windowed min over the failure
    flags: reject(i) ⟺ i < min rank failing.  Same single-tiny-
    partition plan as bh_adjust; thresholds mirrored.  Returns
    (key, p, rank, m, holm_threshold, reject)."""
    w = Window.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    g = Window.partitionBy()
    m = F.count(F.lit(1)).over(g)
    ranked = df.select(
        F.col(key_col).alias("key"),
        F.col(p_col).cast("double").alias("p"),
        F.row_number().over(w).alias("rank"))
    ranked = ranked.withColumn("m", m.cast("long"))
    thr = (F.lit(float(alpha))
           / (F.col("m") - F.col("rank") + 1).cast("double"))
    flagged = (ranked
               .withColumn("holm_threshold", thr)
               .withColumn("__fail",
                           F.when(F.col("p") > thr, F.col("rank"))))
    first_fail = F.min("__fail").over(g)
    return (flagged
            .withColumn("reject",
                        F.when(first_fail.isNull(), F.lit(True))
                        .otherwise(F.col("rank") < first_fail))
            .drop("__fail"))


def cramer_von_mises(df: DataFrame, group_col: str, value_col: str,
                     a_label, b_label) -> DataFrame:
    """Two-sample Cramér–von Mises statistic — the INTEGRATED-squared
    CDF-gap companion of the supremum-based KS in this module (more
    power against diffuse, many-small-gaps alternatives):

        T = n·m/N² · Σ_z (F_n(z) − G_m(z))²   summed over the POOLED
                                               sample (with multiplicity)

    Collapsed onto the distinct-value count table: with per-value
    counts (a, b) and INCLUSIVE prefixes (A, B) ordered by value,

        T = Σ_v (a+b)·(m·A_v − n·B_v)² / (N²·n·m)

    The numerator terms are exact integers accumulated in
    DECIMAL(38,0) / HUGEINT ((m·A)² alone reaches ~8·10¹⁷ at the
    6·10⁴-row gate scale; int64 would overflow the sum), so both
    engines produce the identical single division.  Also emitted:
    the Anderson (1962) null mean  E[T] = 1/6 + 1/(6N)  and the
    variance-normalized  z = (T − E)/√Var  with

        Var = (N+1)/(45·N²) · (4·n·m·N − 3(n²+m²) − 2·n·m)/(4·n·m)

    — fixed closed-form expressions of (n, m).  NULL when either
    sample is empty.  Returns one row: (n_a, n_b, t_stat, t_null_mean,
    z)."""
    v = F.col(value_col).cast("long")
    isa = (F.col(group_col) == a_label).cast("long")
    isb = (F.col(group_col) == b_label).cast("long")
    per = (df.filter(F.col(value_col).isNotNull()
                     & F.col(group_col).isin([a_label, b_label]))
             .groupBy(v.alias("v"))
             .agg(F.sum(isa).alias("a"), F.sum(isb).alias("b")))
    w = (Window.orderBy("v")
               .rowsBetween(Window.unboundedPreceding,
                            Window.currentRow))
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    dec = "decimal(38,0)"
    per = (per
           .withColumn("a_le", F.sum("a").over(w))
           .withColumn("b_le", F.sum("b").over(w))
           .withColumn("na", F.sum("a").over(wt))
           .withColumn("nb", F.sum("b").over(wt)))
    gap = (F.col("nb") * F.col("a_le")
           - F.col("na") * F.col("b_le")).cast(dec)
    agg = per.agg(
        F.max("na").alias("na"), F.max("nb").alias("nb"),
        F.sum((F.col("a") + F.col("b")).cast(dec) * gap * gap)
        .alias("num"))

    def dd(c):
        return F.col(c).cast("double")

    n, m = dd("na"), dd("nb")
    nn = n + m
    ok = (F.col("na") > 0) & (F.col("nb") > 0)
    t = F.when(ok, F.col("num").cast("double")
               / (nn * nn * n * m))
    mean = F.when(ok, F.lit(1.0 / 6.0) + 1.0 / (6.0 * nn))
    var = ((nn + 1.0) / (45.0 * nn * nn)
           * (4.0 * n * m * nn - 3.0 * (n * n + m * m) - 2.0 * n * m)
           / (4.0 * n * m))
    z = F.when(ok & (var > 0.0), (t - mean) / F.sqrt(var))
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        t.alias("t_stat"), mean.alias("t_null_mean"), z.alias("z"))


def sliced_w1(
    df: DataFrame,
    vec_col: str,
    is_reference,
    n_planes: int = 4,
    dim: int = 64,
    grid: int = 8,
) -> DataFrame:
    """Sliced 1-Wasserstein EMBEDDING drift — the vector-space member
    of this module's drift family (PSI/JSD/KS/W1/MMD are scalar): the
    Rabin et al. sliced-Wasserstein idea with the engine's
    determinism conventions — project every embedding onto k FIXED
    ±1 hyperplanes (the Carter-Wegman literal grid of
    ``similarity.srp_signs``, shared verbatim with any oracle), grid
    each projection to an integer bucket (floor(dot·grid) — float
    in, exact int out, identical in any engine because the dot is an
    index-ordered fixed chain), and run the exact count-table W1 of
    :func:`wasserstein_1` per plane.

    One narrow map stage per plane (no Python), ONE (plane, bucket)
    shuffle for all planes, windows over the bounded bucket table.
    W1 is in BUCKET units (1/grid of projection units) — comparable
    across runs with the same grid.  Returns one row per plane:
    (plane, n_ref, n_cur, w1); the scalar drift summary is the mean
    over planes (derivable — per-plane rows are the checkable form).
    """
    from .similarity import srp_signs
    signs = srp_signs(int(n_planes), int(dim))
    base = df.select(
        F.col(vec_col).cast("array<double>").alias("e"),
        is_reference.cast("long").alias("ref"))
    parts = []
    for p in range(int(n_planes)):
        dot = " + ".join(f"element_at(e, {d + 1}) * {s}.0D"
                         for d, s in enumerate(signs[p]))
        parts.append(base.selectExpr(
            f"CAST({p} AS BIGINT) AS plane",
            f"CAST(floor(({dot}) * {float(grid)!r}D) AS BIGINT) AS b",
            "ref"))
    long_df = parts[0]
    for q in parts[1:]:
        long_df = long_df.unionAll(q)
    per = long_df.groupBy("plane", "b").agg(
        F.sum("ref").alias("a"),
        (F.count(F.lit(1)) - F.sum("ref")).alias("bb"))
    w = (Window.partitionBy("plane").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = Window.partitionBy("plane")
    nxt = F.lead("b").over(Window.partitionBy("plane").orderBy("b"))
    t = (per.withColumn("acum", F.sum("a").over(w))
            .withColumn("bcum", F.sum("bb").over(w))
            .withColumn("na", F.sum("a").over(g))
            .withColumn("nb", F.sum("bb").over(g))
            .withColumn("dv", F.coalesce(nxt - F.col("b"), F.lit(0))))
    term = (F.abs(F.col("acum") * F.col("nb")
                  - F.col("bcum") * F.col("na")) * F.col("dv"))
    return (t.groupBy("plane")
             .agg(F.sum(term).alias("s"),
                  F.max("na").alias("n_ref"),
                  F.max("nb").alias("n_cur"))
             .select("plane",
                     F.col("n_ref").cast("long").alias("n_ref"),
                     F.col("n_cur").cast("long").alias("n_cur"),
                     (F.col("s").cast("double")
                      / (F.col("n_ref") * F.col("n_cur"))
                      .cast("double")).alias("w1")))


def combine_pvalues(df: DataFrame, key_col: str,
                    p_col: str) -> DataFrame:
    """Meta-analysis combination of a dashboard's per-test p-values —
    the "did ANYTHING drift" single number over :func:`ks_drift_fdr`'s
    per-feature tests:

        Fisher (1925):  X² = −2 Σ ln pᵢ   ~ χ²(2m) under the null
        harmonic-mean p (Wilson 2019):  p̊ = m / Σ (1/pᵢ)

    Fisher is the classical sensitive-to-one-small-p combiner (exact
    under independence); the HMP is robust to dependence (valid up to
    a small constant).  Both are folds over the (key, p) pairs in
    key order — the engine's ordered-float-fold discipline.  p-values
    must be in (0, 1] (Smirnov p's are).  Returns one row:
    (m, fisher_x2, fisher_df, hmp)."""
    base = df.select(F.col(key_col).alias("k"),
                     F.col(p_col).cast("double").alias("p"))
    agg = base.agg(
        F.count(F.lit(1)).alias("m"),
        F.array_sort(F.collect_list(F.struct(
            F.col("k").alias("k"), F.col("p").alias("p"))))
        .alias("cells"))
    fisher = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc - F.lit(2.0) * F.log(e["p"]))
    inv = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc + F.lit(1.0) / e["p"])
    return agg.select(
        F.col("m").cast("long").alias("m"),
        fisher.alias("fisher_x2"),
        (F.lit(2) * F.col("m")).cast("long").alias("fisher_df"),
        F.when(inv > 0.0,
               F.col("m").cast("double") / inv).alias("hmp"))
