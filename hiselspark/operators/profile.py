"""Table profiling and table diffing — the operational endpoints a
snapshot-based pipeline runs before/after every big write.

* :func:`profile_table` — one pass over the table producing one
  metrics row PER COLUMN (nulls, distincts, min/max where ordered) —
  the input to data-quality dashboards and to
  ``operators/expectations`` rule tuning.
* :func:`table_diff` — key-based reconciliation of two table versions
  (old snapshot vs new): counts of added / removed / changed /
  unchanged rows, with change detection over all non-key columns via
  a null-safe struct comparison.  This is how a copy-on-write upsert
  or a backfill is AUDITED: the expected delta, stated as four
  integers any engine can recompute.

Both are pure aggregates: profile is ONE map-side-combined pass
(approx distinct per column rides the same pass as HLL sketches);
diff is one full-outer join on the key — the unavoidable shuffle —
followed by conditional counts.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

_ORDERED = ("byte", "short", "int", "bigint", "float", "double",
            "decimal", "date", "timestamp", "timestamp_ntz", "string")


def profile_table(df: DataFrame,
                  columns: Optional[Sequence[str]] = None) -> DataFrame:
    """One row per column: ``(column, n_rows, n_null, n_distinct_approx,
    min_repr, max_repr)`` — min/max as strings so every column type
    fits one schema; NULL for unordered types (arrays, maps,
    structs, binary)."""
    columns = list(columns) if columns is not None else df.columns
    types = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"__null{i}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__dist{i}"))
        ordered = any(types[c].startswith(t) for t in _ORDERED)
        if ordered:
            aggs.append(F.min(c).cast("string").alias(f"__min{i}"))
            aggs.append(F.max(c).cast("string").alias(f"__max{i}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max{i}"))
    row = df.agg(*aggs)
    parts = [
        row.select(F.lit(c).alias("column"),
                   F.col("__n").alias("n_rows"),
                   F.col(f"__null{i}").alias("n_null"),
                   F.col(f"__dist{i}").alias("n_distinct_approx"),
                   F.col(f"__min{i}").alias("min_repr"),
                   F.col(f"__max{i}").alias("max_repr"))
        for i, c in enumerate(columns)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def table_diff(old: DataFrame, new: DataFrame,
               key_cols: Sequence[str],
               compare_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Reconcile two versions of a keyed table: one summary row with
    ``n_added`` (key only in new), ``n_removed`` (key only in old),
    ``n_changed`` (key in both, any compared column differs —
    null-safe), ``n_unchanged``.  Keys must be unique per side (the
    caller's contract for a keyed table; duplicate keys make
    'changed' ill-posed)."""
    key_cols = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]
    compare_cols = list(compare_cols)

    def packed(df, side):
        return df.select(
            *key_cols,
            F.struct(*[F.col(c) for c in compare_cols]).alias(side))

    j = packed(old, "__o").join(packed(new, "__n"), key_cols, "full_outer")
    in_old = F.col("__o").isNotNull()
    in_new = F.col("__n").isNotNull()
    same = F.col("__o").eqNullSafe(F.col("__n"))
    return j.agg(
        F.sum((~in_old & in_new).cast("long")).alias("n_added"),
        F.sum((in_old & ~in_new).cast("long")).alias("n_removed"),
        F.sum((in_old & in_new & ~same).cast("long")).alias("n_changed"),
        F.sum((in_old & in_new & same).cast("long")).alias("n_unchanged"),
    )


def corr_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pearson correlation of every column pair from ONE aggregation
    pass of exact integer sufficient statistics:
    ``corr = (Sxy − Sx·Sy/n) / sqrt((Sxx − Sx²/n) · (Syy − Sy²/n))``
    with each exact sum cast to double before the (IEEE-deterministic)
    combination — the same expression tree a SQL oracle replays, so
    the matrix is bit-reproducible across partitionings and engines.

    Columns must be integer-quantized upstream (cents / basis points —
    the engine's cross-engine convention) so every sum is exact; the
    single ``agg`` is map-side partial-reduced, so the full pass over
    10^12 rows produces one O(k²) row.  Output: one row per unordered
    pair (i < j).  NULLs must be handled upstream (filter or fill) —
    sums here are over all rows.  Keep magnitudes in mind: each sum
    must stay below 2^53 for the double cast to be exact — choose the
    quantization unit accordingly."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    stats = df.agg(*aggs)

    def d(name):
        return F.col(name).cast("double")

    pairs = None
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            n = d("n")
            num = d(f"sp_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}") / n
            vx = d(f"ss_{a}") - d(f"s_{a}") * d(f"s_{a}") / n
            vy = d(f"ss_{b}") - d(f"s_{b}") * d(f"s_{b}") / n
            row = stats.select(
                F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
                F.col("n").cast("long").alias("n"),
                F.when((vx > 0) & (vy > 0),
                       num / F.sqrt(vx * vy)).alias("corr"))
            pairs = row if pairs is None else pairs.unionAll(row)
    return pairs


def benford_digits(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution of a positive integer
    column vs Benford's law — the classic fabricated-data /
    unit-mixing smoke alarm for financial-style columns.  Returns one
    row per digit 1–9: observed count, observed share, Benford's
    expected share ``log10(1 + 1/d)`` and the χ² contribution
    ``(obs − n·p)² / (n·p)``; sum the last column for the test
    statistic.  Rows with non-positive values are excluded (no first
    significant digit).

    The first digit is string arithmetic on the integer
    (``substr(cast(x as string), 1, 1)``) — exact, engine-agnostic;
    one ``groupBy`` over ≤ 9 groups."""
    d = (df.filter(F.col(col) > 0)
           .withColumn("digit",
                       F.substring(F.col(col).cast("string"), 1, 1)
                        .cast("int")))
    per = d.groupBy("digit").agg(F.count(F.lit(1)).alias("obs"))
    n = F.sum("obs").over(Window.partitionBy())
    p = F.log10(1.0 + 1.0 / F.col("digit"))
    exp = n.cast("double") * p
    return (per.withColumn("share", F.col("obs") / n)
               .withColumn("benford_p", p)
               .withColumn("chi2",
                           (F.col("obs") - exp) * (F.col("obs") - exp)
                           / exp))


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson χ² test of independence between two categorical
    columns, from ONE ``groupBy(a, b)`` pass of exact integer counts:
    per contingency cell ``obs``, ``expected = row_tot · col_tot / n``
    and the χ² contribution — plus Cramér's V
    (``sqrt(χ² / (n · (min(R,C) − 1)))``) replicated on every row for
    effect size.  Sum the ``chi2`` column for the statistic; dof =
    (R−1)(C−1).

    The marginals are windows over the already-aggregated cell table
    (≤ R·C rows), so the input is scanned once and shuffled once on
    the pair key; all inputs to the double arithmetic are exact
    integers, and the χ² total behind Cramér's V is folded over the
    VALUE-SORTED contribution list (the engine's deterministic-float
    convention), making the result engine-bit-reproducible."""
    cells = (df.groupBy(col_a, col_b)
               .agg(F.count(F.lit(1)).alias("obs")))
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    wg = Window.partitionBy()
    n = F.sum("obs").over(wg)
    exp = (F.sum("obs").over(wa).cast("double")
           * F.sum("obs").over(wb).cast("double") / n)
    out = (cells.withColumn("expected", exp)
                .withColumn("chi2",
                            (F.col("obs") - F.col("expected"))
                            * (F.col("obs") - F.col("expected"))
                            / F.col("expected")))
    r = F.size(F.collect_set(col_a).over(wg))
    c = F.size(F.collect_set(col_b).over(wg))
    tot = F.aggregate(F.array_sort(F.collect_list("chi2").over(wg)),
                      F.lit(0.0), lambda acc, x: acc + x)
    v = F.sqrt(tot / (n.cast("double")
                      * (F.least(r, c) - F.lit(1)).cast("double")))
    return (out.withColumn("dof", ((r - 1) * (c - 1)).cast("long"))
               .withColumn("cramers_v", v))


def trimmed_mean(df: DataFrame, col: str,
                 trim_frac: float = 0.05) -> DataFrame:
    """Exact trimmed mean of an integer-quantized column: drop the
    lowest and highest ``⌊trim_frac·n⌋`` observations EXACTLY and
    average the rest — the robust location estimate that, at 10^12
    rows, everyone approximates by sampling and then can't reproduce.

    Count-table shape (same as the AUC/KS family): one
    ``groupBy(value)`` reduces the data to its distinct values; each
    value's kept multiplicity is pure interval arithmetic between its
    cumulative range ``[below, below+cnt)`` and the kept range
    ``[k, n−k)`` — so ties straddling the trim boundary are handled
    exactly, with no sort of the data rows.  All sums exact integers;
    one final division.  Returns ``(trimmed_mean, n_used, n_trimmed_
    each_side, raw_mean)``."""
    if not 0.0 <= trim_frac < 0.5:
        raise ValueError(
            f"trim_frac must satisfy 0 <= trim_frac < 0.5, got "
            f"{trim_frac!r} (>= 0.5 trims away every observation)")
    per = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    w = (Window.orderBy(col)
               .rowsBetween(Window.unboundedPreceding, -1))
    g = Window.partitionBy()
    t = (per.withColumn("below",
                        F.coalesce(F.sum("cnt").over(w), F.lit(0)))
            .withColumn("n", F.sum("cnt").over(g))
            .withColumn("k", F.floor(F.col("n") * float(trim_frac))
                        .cast("long")))
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("below") + F.col("cnt"),
                F.col("n") - F.col("k"))
        - F.greatest(F.col("below"), F.col("k")))
    t = t.withColumn("kept", kept)
    return t.agg(
        (F.sum(F.col(col) * F.col("kept")).cast("double")
         / F.sum("kept").cast("double")).alias("trimmed_mean"),
        F.sum("kept").alias("n_used"),
        F.max("k").alias("n_trimmed_each_side"),
        (F.sum(F.col(col) * F.col("cnt")).cast("double")
         / F.sum("cnt").cast("double")).alias("raw_mean"))


def winsorized_mean(df: DataFrame, col: str,
                    trim_frac: float = 0.05) -> DataFrame:
    """Exact winsorized mean: instead of DROPPING the ``⌊trim·n⌋``
    tail observations (:func:`trimmed_mean`), CLAMP them to the tail
    boundary values — the robust mean that keeps n constant (the
    estimator behind `winsorize_pit`'s global, exact counterpart).

    Same count-table interval arithmetic: per distinct value the kept
    multiplicity, plus the two boundary values located by conditional
    aggregates over the cumulative ranges (``lo = min v with
    below+cnt > k``, ``hi = max v with below < n−k``), all exact
    integers; ``mean = (Σ v·kept + k·(lo+hi)) / n``.  Returns
    ``(winsorized_mean, lo_clamp, hi_clamp, n)``."""
    if not 0.0 <= trim_frac < 0.5:
        raise ValueError(
            f"trim_frac must satisfy 0 <= trim_frac < 0.5, got "
            f"{trim_frac!r} (>= 0.5 clamps away every observation)")
    per = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    w = (Window.orderBy(col)
               .rowsBetween(Window.unboundedPreceding, -1))
    g = Window.partitionBy()
    t = (per.withColumn("below",
                        F.coalesce(F.sum("cnt").over(w), F.lit(0)))
            .withColumn("n", F.sum("cnt").over(g))
            .withColumn("k", F.floor(F.col("n") * float(trim_frac))
                        .cast("long")))
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("below") + F.col("cnt"),
                F.col("n") - F.col("k"))
        - F.greatest(F.col("below"), F.col("k")))
    t = t.withColumn("kept", kept)
    lo = F.min(F.when(F.col("below") + F.col("cnt") > F.col("k"),
                      F.col(col)))
    hi = F.max(F.when(F.col("below") < F.col("n") - F.col("k"),
                      F.col(col)))
    return t.agg(
        ((F.sum(F.col(col) * F.col("kept"))
          + F.max("k") * (lo + hi)).cast("double")
         / F.max("n").cast("double")).alias("winsorized_mean"),
        lo.alias("lo_clamp"),
        hi.alias("hi_clamp"),
        F.max("n").alias("n"))


def fk_orphans(fact: DataFrame, dim: DataFrame, fk: str,
               pk: str) -> DataFrame:
    """Referential-integrity audit of a foreign key: one row with
    ``(n_fact, n_null_fk, n_orphan, orphan_rate)`` where an orphan is
    a non-NULL ``fact[fk]`` with no matching ``dim[pk]`` — the join
    health check every warehouse runs after ingest (orphans silently
    become dropped rows in inner joins and NULL features in left
    joins).

    One anti-join of the DISTINCT fact keys against the dim keys,
    then the orphan key set joins back to the fact counts — so the
    heavy side is scanned once for a count table and the join work is
    bounded by distinct key counts.  Exact integers, one division.
    """
    keys = (fact.groupBy(F.col(fk).alias("k"))
                .agg(F.count(F.lit(1)).alias("cnt")))
    null_cnt = F.sum(F.when(F.col("k").isNull(), F.col("cnt"))
                     .otherwise(0))
    orphan = (keys.filter(F.col("k").isNotNull())
                  .join(dim.select(F.col(pk).alias("k")).distinct(),
                        "k", "left_anti")
                  .agg(F.coalesce(F.sum("cnt"), F.lit(0))
                       .alias("n_orphan"),
                       F.count(F.lit(1)).alias("n_orphan_keys")))
    totals = keys.agg(F.sum("cnt").alias("n_fact"),
                      null_cnt.alias("n_null_fk"))
    out = totals.crossJoin(F.broadcast(orphan))
    return out.select(
        F.col("n_fact").cast("long").alias("n_fact"),
        F.col("n_null_fk").cast("long").alias("n_null_fk"),
        F.col("n_orphan").cast("long").alias("n_orphan"),
        F.col("n_orphan_keys").cast("long").alias("n_orphan_keys"),
        (F.col("n_orphan").cast("double")
         / F.col("n_fact").cast("double")).alias("orphan_rate"))


def jarque_bera(df: DataFrame, group_col: str,
                value_col: str) -> DataFrame:
    """Jarque–Bera normality test (Jarque & Bera 1980) per group —
    the moment-based distribution-shape gate a feature pipeline runs
    before assuming Gaussian errors:

        JB = n/6 · (S² + (K−3)²/4),   S = m₃/m₂^{3/2},  K = m₄/m₂²

    with mₖ the central moments.  ``value_col`` must be
    integer-valued (cents convention); the four raw power sums are
    exact — Σv in int64; v³/v⁴ are formed in DECIMAL(38,0) (v⁴ alone
    EXCEEDS int64 per row once |v| > 55108 — observed in the cents
    data) and Σv²/Σv³/Σv⁴ accumulate as DECIMAL(38,0), matching the
    oracle's exact int128 sums to ~10¹⁴ rows at that magnitude.
    Central moments, skewness, kurtosis and JB are then ONE mirrored
    float expression each (m₂^{3/2} written as m₂·√m₂ — no pow).
    Groups with m₂ ≤ 0 (constant value) yield NULL S/K/JB.  Returns
    one row per group: (group, n, mean, m2, skewness, kurtosis, jb).
    """
    v = F.col(value_col).cast("long")
    dec = "decimal(38,0)"
    per = (df.filter(F.col(value_col).isNotNull())
             .select(F.col(group_col).alias("__g"), v.alias("__v"),
                     (v * v).alias("__v2"))
             .select("__g", "__v", "__v2",
                     (F.col("__v2").cast(dec)
                      * F.col("__v")).alias("__v3"),
                     (F.col("__v2").cast(dec)
                      * F.col("__v2")).alias("__v4"))
             .groupBy("__g")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("__v").alias("s1"),
                  F.sum(F.col("__v2").cast(dec)).alias("s2"),
                  F.sum(F.col("__v3").cast(dec)).alias("s3"),
                  F.sum(F.col("__v4").cast(dec)).alias("s4")))
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - mean * mean
    m3 = r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean
    m4 = (r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
          - 3.0 * mean * mean * mean * mean)
    ok = m2 > 0.0
    skew = F.when(ok, m3 / (m2 * F.sqrt(m2)))
    kurt = F.when(ok, m4 / (m2 * m2))
    jb = F.when(ok, n / 6.0 * (skew * skew
                               + (kurt - 3.0) * (kurt - 3.0) / 4.0))
    return per.select(
        F.col("__g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        mean.alias("mean"), m2.alias("m2"),
        skew.alias("skewness"), kurt.alias("kurtosis"),
        jb.alias("jb"))


def grubbs_test(df: DataFrame, group_col: str,
                value_col: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviation outlier statistic per
    group (Grubbs 1950):

        G = max|vᵢ − v̄| / s

    The key exactness trick: max|vᵢ − v̄| = max(v_max − v̄, v̄ − v_min),
    so G needs ONLY the one-pass sufficient statistics (n, Σv, Σv²,
    min, max) — exact int64 with integer-quantized ``value_col`` —
    and G is one mirrored float expression; no second scan, no join
    back.  The flagged value (the endpoint further from the mean, in
    original units) is emitted for triage; comparing G against the
    t-based critical value is the caller's job (no t quantiles here
    by design — the engine emits exact statistics, not p-values
    needing special functions).  NULL G when n < 3 or s = 0.
    Returns one row per group: (group, n, v_min, v_max, outlier_value,
    g_stat)."""
    v = F.col(value_col).cast("long")
    agg = (df.filter(v.isNotNull())
             .groupBy(F.col(group_col).alias("grp"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(v).alias("sv"),
                  F.sum(v * v).alias("ssv"),
                  F.min(v).alias("v_min"),
                  F.max(v).alias("v_max")))
    nd = F.col("n").cast("double")
    m = F.col("sv").cast("double") / nd
    var = ((F.col("ssv").cast("double")
            - F.col("sv").cast("double") * F.col("sv").cast("double")
            / nd) / (nd - 1.0))
    dev_hi = F.col("v_max").cast("double") - m
    dev_lo = m - F.col("v_min").cast("double")
    g = F.when((F.col("n") >= 3) & (var > 0.0),
               F.greatest(dev_hi, dev_lo) / F.sqrt(var))
    outlier = F.when(dev_hi >= dev_lo, F.col("v_max")) \
               .otherwise(F.col("v_min"))
    return agg.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("v_min").cast("long").alias("v_min"),
        F.col("v_max").cast("long").alias("v_max"),
        outlier.cast("long").alias("outlier_value"),
        g.alias("g_stat"))


def concentration_profile(df: DataFrame, group_col: str,
                          category_col: str) -> DataFrame:
    """Concentration / diversity profile of a categorical column per
    group — the triple a corpus-mixing dashboard wants for every
    source dimension:

        HHI = Σ (cᵢ/n)² = Σcᵢ² / n²       (Herfindahl–Hirschman)
        top_share = max(cᵢ)/n
        entropy = Σ (cᵢ/n)·ln(n/cᵢ)        (nats)

    Category counts cᵢ are exact int64; Σcᵢ² is an exact int64 sum
    (cᵢ² ≤ n² — int64-safe to n ~ 3·10⁹ per group), so HHI and
    top_share are single mirrored divisions; the entropy is the
    category-key-ordered float fold every entropy in this engine
    uses.  NULL categories count as their own category (they are a
    real mass in a mixing decision).  Returns one row per group:
    (group, n, n_categories, sum_c2, hhi, top_share, entropy)."""
    per_c = (df.groupBy(F.col(group_col).alias("grp"),
                        F.col(category_col).alias("__c"))
               .agg(F.count(F.lit(1)).alias("c")))
    agg = per_c.groupBy("grp").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.max("c").alias("c_max"),
        F.array_sort(F.collect_list(F.struct(
            F.col("__c").alias("k"),
            F.col("c").alias("c")))).alias("__cells"))
    nd = F.col("n").cast("double")
    ent = F.aggregate(
        "__cells", F.lit(0.0),
        lambda acc, s: acc + (s["c"].cast("double") / nd)
        * F.log(nd / s["c"].cast("double")))
    return agg.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("n_categories").cast("long").alias("n_categories"),
        F.col("sum_c2").cast("long").alias("sum_c2"),
        (F.col("sum_c2").cast("double") / (nd * nd)).alias("hhi"),
        (F.col("c_max").cast("double") / nd).alias("top_share"),
        ent.alias("entropy"))


def inequality_profile(df: DataFrame, group_col: str,
                       value_col: str) -> DataFrame:
    """Theil-T and Atkinson(ε=1) inequality indices of a POSITIVE
    integer column per group — the decomposable complements of the
    Lorenz/Gini operator:

        Theil T   = (Σ x·ln x)/(n·μ) − ln μ
        Atkinson₁ = 1 − exp((Σ ln x)/n) / μ       (1 − geomean/mean)

    Both reduce to two log-moment sums over the per-value COUNT table
    (Σ c·v·ln v and Σ c·ln v — value-key-ordered float folds, the
    engine's entropy convention) plus the exact int64 (n, Σv).
    Non-positive values carry no defined log-share: they are DROPPED
    and counted (``n_nonpos``).  NULL indices when no positive values
    remain.  Returns one row per group:
    (group, n, n_nonpos, sum_v, theil_t, atkinson)."""
    v = F.col(value_col).cast("long")
    base = df.select(F.col(group_col).alias("grp"), v.alias("__v"))
    nonpos = (base.groupBy("grp")
              .agg(F.sum(((F.col("__v") <= 0)
                          | F.col("__v").isNull()).cast("long"))
                   .alias("n_nonpos")))
    per_v = (base.filter(F.col("__v") > 0)
                 .groupBy("grp", "__v")
                 .agg(F.count(F.lit(1)).alias("c")))
    agg = per_v.groupBy("grp").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("__v")).alias("sum_v"),
        F.array_sort(F.collect_list(F.struct(
            F.col("__v").alias("v"), F.col("c").alias("c"))))
        .alias("__cells"))
    nd = F.col("n").cast("double")
    sxlnx = F.aggregate(
        "__cells", F.lit(0.0),
        lambda acc, s: acc + (s["c"] * s["v"]).cast("double")
        * F.log(s["v"].cast("double")))
    slnx = F.aggregate(
        "__cells", F.lit(0.0),
        lambda acc, s: acc + s["c"].cast("double")
        * F.log(s["v"].cast("double")))
    mu = F.col("sum_v").cast("double") / nd
    theil = sxlnx / (nd * mu) - F.log(mu)
    atk = F.lit(1.0) - F.exp(slnx / nd) / mu
    out = (agg.join(nonpos, "grp", "right")
           .select("grp",
                   F.coalesce(F.col("n"), F.lit(0)).cast("long")
                    .alias("n"),
                   F.col("n_nonpos").cast("long").alias("n_nonpos"),
                   F.coalesce(F.col("sum_v"), F.lit(0)).cast("long")
                    .alias("sum_v"),
                   F.when(F.col("n") > 0, theil).alias("theil_t"),
                   F.when(F.col("n") > 0, atk).alias("atkinson")))
    return out


def hbos_score(df: DataFrame, id_col: str, feature_cols: Sequence[str],
               n_bins: int = 10) -> DataFrame:
    """Histogram-Based Outlier Score (Goldstein & Dengel 2012) — the
    standard cheap anomaly baseline with DYNAMIC-WIDTH bins: per
    feature, equal-frequency bins whose density is count/width (an
    equal-frequency bin stretched over a huge value range IS the
    sparse region — raw counts alone cannot see tail outliers); per
    row,

        HBOS = Σ_f ln(max_density_f / density_f(row))   ≥ 0

    Bins come from the exact integer CDF split ``bin = (B·below)
    DIV n`` per feature (the quantile_bin plan — ties share a bin);
    bin count and integer width (max − min + 1) are exact int64, the
    density ratio and its ln are mirrored float expressions, and the
    per-row sum folds over the FIXED caller order of
    ``feature_cols``.  NULL feature values contribute 0 (documented;
    no density evidence).  Returns one row per input row:
    (id, bin_i…, hbos)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    out = df.select(F.col(id_col).alias("id"),
                    *[F.col(c).cast("long").alias(f"__f{i}")
                      for i, c in enumerate(feature_cols)])
    score = F.lit(0.0)
    for i, _ in enumerate(feature_cols):
        c = f"__f{i}"
        per_v = (out.filter(F.col(c).isNotNull())
                 .groupBy(F.col(c).alias("__v"))
                 .agg(F.count(F.lit(1)).alias("__t")))
        w_run = (Window.orderBy("__v")
                 .rowsBetween(Window.unboundedPreceding, -1))
        w_all = Window.partitionBy()
        binmap = (per_v
                  .select("__v",
                          F.coalesce(F.sum("__t").over(w_run),
                                     F.lit(0)).alias("below"),
                          F.sum("__t").over(w_all).alias("nn"))
                  .select("__v",
                          F.expr(f"({int(n_bins)} * below) DIV nn")
                          .alias("__b")))
        dens = (per_v.join(binmap, "__v")
                .groupBy("__b").agg(
                    F.sum("__t").alias("__c"),
                    (F.max("__v") - F.min("__v") + 1).alias("__w")))
        dens = dens.withColumn(
            "__d", F.col("__c").cast("double")
            / F.col("__w").cast("double"))
        dmax = dens.agg(F.max("__d").alias("__dm"))
        lut = (binmap.join(dens, "__b")
               .crossJoin(F.broadcast(dmax))
               .select(F.col("__v").alias(f"__v{i}"),
                       F.col("__b").alias(f"__f{i}_bin"),
                       F.log(F.col("__dm") / F.col("__d"))
                       .alias(f"__s{i}")))
        out = out.join(F.broadcast(lut),
                       out[c] == lut[f"__v{i}"], "left") \
                 .drop(f"__v{i}")
        score = score + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
    return out.select(
        "id", *[F.col(f"__f{i}_bin").cast("long")
                .alias(f"bin_{i}") for i in
                range(len(feature_cols))],
        score.alias("hbos"))


def mahalanobis2(df: DataFrame, id_col: str, x_col: str,
                 y_col: str) -> DataFrame:
    """Squared Mahalanobis distance of every row from the corpus
    centroid under the 2-feature sample covariance — the classic
    correlated-outlier score a univariate z misses, in CLOSED FORM
    (2×2 inverse by Cramer, the linear_shap convention):

        d²(r) = [dx, dy] · Σ⁻¹ · [dx, dy]ᵀ
              = (Syy·dx² − 2·Sxy·dx·dy + Sxx·dy²) · (n−1) / det

    with Sxx/Syy/Sxy the centered sums and det = Sxx·Syy − Sxy².
    Raw moments (n, Σx, Σy, Σx², Σy², Σxy) are exact int64 from one
    aggregate; per-row dx = x − x̄ and the quadratic form are mirrored
    float expressions.  NULL d² when det ≤ 0 (degenerate covariance).
    Returns one row per input row: (id, x, y, d2)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    d = (df.filter(x.isNotNull() & y.isNotNull())
           .select(F.col(id_col).alias("id"), x.alias("x"),
                   y.alias("y")))
    agg = d.agg(F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"))
    j = d.crossJoin(F.broadcast(agg))
    nd = F.col("n").cast("double")
    cxx = (F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double")
           / nd)
    cyy = (F.col("syy").cast("double")
           - F.col("sy").cast("double") * F.col("sy").cast("double")
           / nd)
    cxy = (F.col("sxy").cast("double")
           - F.col("sx").cast("double") * F.col("sy").cast("double")
           / nd)
    det = cxx * cyy - cxy * cxy
    dx = F.col("x").cast("double") - F.col("sx").cast("double") / nd
    dy = F.col("y").cast("double") - F.col("sy").cast("double") / nd
    quad = cyy * dx * dx - 2.0 * cxy * dx * dy + cxx * dy * dy
    d2 = F.when((F.col("n") >= 3) & (det > 0.0),
                quad * (nd - 1.0) / det)
    return j.select("id", F.col("x").cast("long").alias("x"),
                    F.col("y").cast("long").alias("y"),
                    d2.alias("d2"))


def hill_diversity(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Hill diversity numbers of order q = 0, 1, 2 per group (Hill
    1973) — the effective-number-of-categories ladder unifying this
    module's :func:`concentration` ingredients on ONE scale
    ("how many equally-common categories would look like this"):

        H0 = richness (distinct categories)
        H1 = exp(Shannon entropy)          (frequency-weighted)
        H2 = n² / Σ c_k²   = 1/Simpson     (dominance-weighted)

    H0 and the H2 ratio are exact integer arithmetic (Σc² int64);
    H1's entropy is the category-ordered float fold this module
    already uses, exponentiated once.  H0 ≥ H1 ≥ H2 always — the gap
    pattern reads skew at a glance (asserted in pytest).  Returns one
    row per group: (group, n, h0_richness, h1_shannon, h2_simpson).
    """
    cells = (df.groupBy(F.col(group_col).alias("g"),
                        F.col(value_col).alias("v"))
               .agg(F.count(F.lit(1)).alias("c")))
    agg = cells.groupBy("g").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("h0"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
        F.array_sort(F.collect_list(F.struct(
            F.col("v").alias("v"), F.col("c").alias("c"))))
        .alias("cells"))

    def dd(x):
        return x.cast("double")

    ent = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc
        + (dd(e["c"]) / dd(F.col("n")))
        * F.log(dd(F.col("n")) / dd(e["c"])))
    h2 = dd(F.col("n")) * dd(F.col("n")) / dd(F.col("sq"))
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("h0").cast("long").alias("h0_richness"),
        F.exp(ent).alias("h1_shannon"),
        h2.alias("h2_simpson"))


def lorenz_curve(df: DataFrame, id_col: str, value_col: str,
                 n_buckets: int = 10) -> DataFrame:
    """Lorenz curve table — the distributional picture behind the
    scalar Gini: deterministic equal-count buckets in ASCENDING value
    order (NTILE over (value, id) — the unique tiebreaker makes the
    cut layout-independent), then exact cumulative population and
    value masses per bucket:

        share_pop_k = cum_n_k / N,   share_value_k = cum_v_k / V

    Every count/sum is an exact int64 (value integer-valued, cents
    convention, non-negative for the curve to be monotone); the two
    shares are one division each.  The familiar inequality read-outs
    fall out directly: bottom-decile share, top-decile share
    (1 − share_value_9), and the Gini as 1 − 2·Σ trapezoids if
    wanted — this operator emits the checkable TABLE.  Returns
    n_buckets rows: (bucket, n, cum_n, v, cum_v, share_pop,
    share_value)."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(value_col).cast("long").alias("v"))
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    t = base.withColumn("bucket", F.ntile(int(n_buckets)).over(w))
    per = (t.groupBy("bucket")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("vv")))
    wc = (Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    out = (per.withColumn("cum_n", F.sum("n").over(wc))
              .withColumn("cum_v", F.sum("vv").over(wc))
              .withColumn("nn", F.sum("n").over(wt))
              .withColumn("vt", F.sum("vv").over(wt)))
    return out.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n").cast("long").alias("n"),
        F.col("cum_n").cast("long").alias("cum_n"),
        F.col("vv").cast("long").alias("v"),
        F.col("cum_v").cast("long").alias("cum_v"),
        (F.col("cum_n").cast("double")
         / F.col("nn").cast("double")).alias("share_pop"),
        F.when(F.col("vt") > 0,
               F.col("cum_v").cast("double")
               / F.col("vt").cast("double")).alias("share_value"))


def hill_tail(df: DataFrame, value_col: str, k: int = 100) -> DataFrame:
    """Hill tail-index estimator (Hill 1975) — "how heavy is this
    distribution's tail" next to :func:`lorenz_curve` and the zipf
    fit: over the values STRICTLY above the (k+1)-th largest order
    statistic x_min,

        alpha = n_tail / Σ ln(x / x_min)

    (small alpha = heavy tail; alpha ≈ 1.7 for Zipfy web counts).
    Everything runs on the distinct-value count table: x_min is the
    exact order statistic (the largest v whose ≥-cumulative count
    reaches k+1 — no row sort), n_tail an exact int64, and the ln
    fold runs value-ordered with multiplicities.  Values ≤ 0 are
    dropped AND counted (logs need positives).  alpha is NULL when
    the tail is empty or degenerate (all tail mass at x_min).
    Returns one row: (n, n_dropped, x_min, n_tail, alpha)."""
    v = F.col(value_col).cast("long")
    base = df.select(v.alias("v"))
    n_all = base.agg(
        F.count(F.lit(1)).alias("n_tot"),
        F.sum((F.col("v") <= 0).cast("long")).alias("n_dropped"))
    cells = (base.filter(F.col("v") > 0)
             .groupBy("v").agg(F.count(F.lit(1)).alias("c")))
    wd = (Window.orderBy(F.col("v").desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = cells.withColumn("cge", F.sum("c").over(wd))
    xmin = (cum.filter(F.col("cge") >= int(k) + 1)
            .agg(F.max("v").alias("x_min")))
    j = cells.crossJoin(F.broadcast(xmin)).filter(
        F.col("v") > F.col("x_min"))
    agg = j.groupBy("x_min").agg(
        F.sum("c").alias("n_tail"),
        F.array_sort(F.collect_list(F.struct(
            F.col("v").alias("v"), F.col("c").alias("c"))))
        .alias("cells"))
    lsum = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc + e["c"].cast("double")
        * F.log(e["v"].cast("double")
                / F.col("x_min").cast("double")))
    out = agg.select(
        F.col("x_min").cast("long").alias("x_min"),
        F.col("n_tail").cast("long").alias("n_tail"),
        F.when((F.col("n_tail") > 0) & (lsum > 0.0),
               F.col("n_tail").cast("double") / lsum).alias("alpha"))
    return n_all.crossJoin(F.broadcast(out)).select(
        F.col("n_tot").cast("long").alias("n"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        "x_min", "n_tail", "alpha")


def boxplot_profile(df: DataFrame, group_col: str, value_col: str,
                    whisker: float = 1.5) -> DataFrame:
    """Tukey boxplot table per group — the five-number + fence
    summary every distribution dashboard starts from:

        q1/med/q3 by the exact interpolated q·(n−1) rule (Spark
        ``percentile`` ≡ DuckDB ``quantile_cont``, the engine's
        established identity), iqr = q3 − q1, fences q1 ∓ w·iqr /
        q3 ± w·iqr, and EXACT outlier counts below/above the fences
        (integer values compared to the identical fence doubles in
        both engines).

    Two aggregations: the quantile pass, then fence counts with the
    tiny quantile table broadcast back.  Returns one row per group:
    (group, n, q1, med, q3, iqr, lo_fence, hi_fence, n_low, n_high).
    """
    v = F.col(value_col).cast("long")
    base = df.select(F.col(group_col).alias("g"), v.alias("v"))
    qs = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(v, 0.25)").alias("q1"),
        F.expr("percentile(v, 0.5)").alias("med"),
        F.expr("percentile(v, 0.75)").alias("q3"))
    wl = F.lit(float(whisker))
    qs = (qs.withColumn("iqr", F.col("q3") - F.col("q1"))
          .withColumn("lo_fence", F.col("q1") - wl * F.col("iqr"))
          .withColumn("hi_fence", F.col("q3") + wl * F.col("iqr")))
    j = base.join(F.broadcast(qs.select(
        "g", "lo_fence", "hi_fence")), "g")
    cnts = j.groupBy("g").agg(
        F.sum((F.col("v").cast("double") < F.col("lo_fence"))
              .cast("long")).alias("n_low"),
        F.sum((F.col("v").cast("double") > F.col("hi_fence"))
              .cast("long")).alias("n_high"))
    out = qs.join(cnts, "g")
    return out.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        "q1", "med", "q3", "iqr", "lo_fence", "hi_fence",
        F.col("n_low").cast("long").alias("n_low"),
        F.col("n_high").cast("long").alias("n_high"))
