"""Count-based mutual-information feature ranking and greedy mRMR.

The reference's selection stack ranks features by HSIC (kernel
dependence, ``/root/reference/hisel/select.py``) after an MI-based
preselection (``ksgmi``, ``select.py:45-75``).  This module is the
discrete, exactly-replayable sibling of that preselection: the plug-in
mutual information

    MI(X; Y) = Σ_{x,y} (c_xy / n) · ln( c_xy · n / (c_x · c_y) )

computed from integer contingency counts, and the classic mRMR greedy
(Peng et al., "Feature selection based on mutual information", TPAMI
2005): repeatedly pick the feature maximizing

    score(f) = MI(f; y) − (1/|S|) · Σ_{s ∈ S} MI(f; s)

i.e. max-relevance-minus-mean-redundancy against the already-selected
set S.

Scale shape: ONE map-side-combined count shuffle builds every
contingency cell — features are unpivoted row-wise (``stack``), so a
row of d features becomes d cells for relevance and d(d−1)/2 cells for
pairwise redundancy BEFORE the partial aggregation collapses them; the
multiplier is bounded by the feature count, never the row count.  The
greedy itself runs on the driver over the d + d²/2 MI numbers — a few
hundred doubles even for wide tables — so no iteration touches the
cluster twice.

Determinism: counts stay integers until the final fold; the per-key
cell terms are summed in sorted (x, y) order via ``array_sort`` +
``F.aggregate`` (float addition is not associative), which a second
engine can mirror bit-for-bit (DuckDB ``list_sort``/``list_reduce``)
modulo libm's ``ln`` ulp.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def mutual_info_table(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact plug-in MI between integer columns ``x_col`` and ``y_col``,
    one row per ``key_cols`` group: ``n`` (rows) and ``mi`` (nats).

    Both value columns must be integral (cast upstream): integer cell
    counts and integer marginal products keep every input to the float
    fold exact, and the struct sort gives the fold a total order.
    """
    key_cols = list(key_cols)
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    cells = (df.select(*key_cols, x.alias("__x"), y.alias("__y"))
               .groupBy(*key_cols, "__x", "__y")
               .agg(F.count(F.lit(1)).alias("__c")))
    from pyspark.sql import Window
    wx = Window.partitionBy(*key_cols, "__x")
    wy = Window.partitionBy(*key_cols, "__y")
    cells = (cells
             .withColumn("__cx", F.sum("__c").over(wx))
             .withColumn("__cy", F.sum("__c").over(wy)))
    per_key = (cells.groupBy(*key_cols)
               .agg(F.sum("__c").alias("n"),
                    F.array_sort(F.collect_list(F.struct(
                        F.col("__x").alias("x"),
                        F.col("__y").alias("y"),
                        F.col("__c").alias("c"),
                        F.col("__cx").alias("cx"),
                        F.col("__cy").alias("cy")))).alias("__cells")))

    def term(acc, s):
        return acc + (
            s["c"].cast("double") / F.col("n").cast("double")
        ) * F.log(
            (s["c"] * F.col("n")).cast("double")
            / (s["cx"] * s["cy"]).cast("double")
        )

    return (per_key
            .withColumn("mi", F.aggregate("__cells", F.lit(0.0), term))
            .drop("__cells"))


def _unpivot(df: DataFrame, feature_cols: Sequence[str]) -> DataFrame:
    """(feature, value) long form via one ``stack`` projection — a
    single narrow map stage, no shuffle."""
    pairs = ", ".join(f"'{c}', CAST({c} AS LONG)" for c in feature_cols)
    return df.selectExpr(
        f"stack({len(feature_cols)}, {pairs}) AS (feature, value)",
        "*")


def info_gain_rank(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Rank features by information gain about ``label_col`` — for
    discrete variables IG(f; y) = H(y) − H(y|f) IS the mutual
    information, so this is the exact count-based MI of each feature
    with the label, ranked descending (ties to the feature name).

    Returns (feature, n, mi, rank).  One unpivoted count shuffle for
    every feature at once; the reference runs this shape per-feature
    through sklearn (``ksgmi``) — here it is a single pass.
    """
    from pyspark.sql import Window
    long_df = _unpivot(df, feature_cols).select(
        "feature", "value", F.col(label_col).cast("long").alias("__y"))
    mi = mutual_info_table(long_df, "value", "__y",
                           key_cols=["feature"])
    w = Window.orderBy(F.col("mi").desc(), F.col("feature").asc())
    return mi.select("feature", "n", "mi",
                     F.row_number().over(w).alias("rank"))


def pairwise_mi(
    df: DataFrame,
    feature_cols: Sequence[str],
) -> DataFrame:
    """MI for every unordered feature pair (fa < fb by name):
    (fa, fb, n, mi).  One count shuffle over d(d−1)/2 cells per row —
    the blowup is bounded by the feature count, and the partial
    aggregation collapses it map-side."""
    cols = sorted(feature_cols)
    triples = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            triples.append(
                f"'{a}', '{b}', CAST({a} AS LONG), CAST({b} AS LONG)")
    n_pairs = len(triples)
    long_df = df.selectExpr(
        f"stack({n_pairs}, {', '.join(triples)})"
        " AS (fa, fb, va, vb)")
    return mutual_info_table(long_df, "va", "vb", key_cols=["fa", "fb"])


def mrmr_select(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    k: int,
) -> DataFrame:
    """Greedy mRMR selection of ``k`` features: step 1 takes the
    max-relevance feature; step t takes argmax of
    relevance − mean-redundancy-to-selected (ties to the feature
    name).  Returns the selection trace (rk, feature, relevance,
    redundancy, score).

    The cluster computes the d relevance MIs and d(d−1)/2 redundancy
    MIs in two count shuffles; the greedy runs on the driver over that
    tiny matrix (never the data).  Reference parity target: the greedy
    search loop shape of ``/root/reference/hisel/hsic.py:41-65``
    (score-and-pick-best per round) with MI standing in for HSIC.
    """
    if k < 1 or k > len(feature_cols):
        raise ValueError("k must be in [1, n_features]")
    rel_rows = info_gain_rank(df, feature_cols, label_col).collect()
    rel: Dict[str, float] = {r["feature"]: r["mi"] for r in rel_rows}
    red_rows = pairwise_mi(df, feature_cols).collect()
    red: Dict[Tuple[str, str], float] = {}
    for r in red_rows:
        red[(r["fa"], r["fb"])] = r["mi"]
        red[(r["fb"], r["fa"])] = r["mi"]

    remaining = sorted(feature_cols)
    selected: List[str] = []
    trace = []
    for step in range(1, k + 1):
        best = None
        for f in remaining:
            if selected:
                # sorted-name fold order -> deterministic float sum a
                # second engine can replay (list_sort + list_reduce)
                r = 0.0
                for s in sorted(selected):
                    r += red[(f, s)]
                r /= len(selected)
            else:
                r = 0.0
            score = rel[f] - r
            # ties to the lexicographically first feature: `remaining`
            # is sorted, strict > keeps the earliest
            if best is None or score > best[0]:
                best = (score, f, r)
        score, f, r = best
        trace.append((step, f, float(rel[f]), float(r), float(score)))
        selected.append(f)
        remaining.remove(f)

    spark = df.sparkSession
    schema = T.StructType([
        T.StructField("rk", T.IntegerType()),
        T.StructField("feature", T.StringType()),
        T.StructField("relevance", T.DoubleType()),
        T.StructField("redundancy", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
    ])
    return spark.createDataFrame(trace, schema)


def delta_hsic_table(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact biased-HSIC with DELTA kernels between integer columns —
    the closed count form of the reference's delta-kernel HSIC
    (``/root/reference/hisel/kernels.py`` delta featwise +
    ``hsic_b``): with contingency counts ``c_xy`` and marginals
    ``c_x = Σ_y c_xy``, ``c_y``,

        HSIC_b = tr(KHLH)/n²
               = A/n² − 2B/n³ + (Cx/n²)·(Cy/n²)

    where A = Σ c_xy², B = Σ c_xy·c_x·c_y, Cx = Σ c_xy·c_x = Σ_x c_x²
    and Cy = Σ c_xy·c_y — every sum an EXACT integer from one count
    shuffle, so (unlike the RBF path, whose float Grams need parity
    oracles) the statistic replays digit-for-digit in SQL: the three
    divisions and the fixed-order two-op sum are deterministic IEEE on
    exact int64 inputs.  Returns one row per ``key_cols`` group:
    (n, a_sum, b_sum, cx_sum, cy_sum, hsic)."""
    key_cols = list(key_cols)
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    cells = (df.select(*key_cols, x.alias("__x"), y.alias("__y"))
               .groupBy(*key_cols, "__x", "__y")
               .agg(F.count(F.lit(1)).alias("__c")))
    from pyspark.sql import Window
    wx = Window.partitionBy(*key_cols, "__x")
    wy = Window.partitionBy(*key_cols, "__y")
    cells = (cells
             .withColumn("__cx", F.sum("__c").over(wx))
             .withColumn("__cy", F.sum("__c").over(wy)))
    per_key = (cells.groupBy(*key_cols).agg(
        F.sum("__c").alias("n"),
        F.sum(F.col("__c") * F.col("__c")).alias("a_sum"),
        F.sum(F.col("__c") * F.col("__cx") * F.col("__cy"))
         .alias("b_sum"),
        F.sum(F.col("__c") * F.col("__cx")).alias("cx_sum"),
        F.sum(F.col("__c") * F.col("__cy")).alias("cy_sum")))
    nd = F.col("n").cast("double")
    d2 = nd * nd
    hsic = (F.col("a_sum").cast("double") / d2
            - F.lit(2.0) * F.col("b_sum").cast("double")
              / (d2 * nd)
            + (F.col("cx_sum").cast("double") / d2)
              * (F.col("cy_sum").cast("double") / d2))
    return per_key.withColumn("hsic", hsic)


def hsic_rank(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Rank features by exact delta-kernel HSIC dependence with the
    label — the count-closed sibling of the reference's featurewise
    HSIC ranking (``hisel/select.py`` projection scores with delta
    kernels), and the first member of that family whose gate oracle
    recomputes the statistic itself rather than pinning parity.
    Returns (feature, n, hsic, rank); one unpivoted count shuffle for
    all features at once."""
    from pyspark.sql import Window
    long_df = _unpivot(df, feature_cols).select(
        "feature", "value", F.col(label_col).cast("long").alias("__y"))
    h = delta_hsic_table(long_df, "value", "__y",
                         key_cols=["feature"])
    w = Window.orderBy(F.col("hsic").desc(), F.col("feature").asc())
    return h.select("feature", "n", "hsic",
                    F.row_number().over(w).alias("rank"))


def hsic_perm_test(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_perms: int = 20,
    seed: int = 6011,
) -> DataFrame:
    """Permutation independence test on the exact delta-kernel HSIC —
    the inference step the reference's statistic feeds (is the
    observed dependence real, or within the exchangeable null?):

        p = (1 + #{b : HSIC(x, π_b(y)) ≥ HSIC(x, y)}) / (B + 1)

    with each permutation π_b the rank order of a Carter-Wegman hash
    of the row id — NO RNG stream: the (a_b, c_b) constants are
    reproducible literals, so a second engine rebuilds every
    permutation, every permuted statistic and the exact p-value
    (observed and permuted HSICs are the count-closed form —
    bit-identical doubles, so even the ≥ comparisons replay).

    Returns one row: (n, hsic, n_perms, n_ge, p_value).

    Scale note: each permutation pairs two globally ranked streams —
    a total order, so this operator is for BOUNDED frames (a sampled
    or filtered slice, as the gate uses); at corpus scale you run the
    same test per partition block and combine p-values, which keeps
    every sort partition-local.
    """
    from pyspark.sql import Window
    from .bootstrap import _M31, cw_constants

    base = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
    obs = (delta_hsic_table(base, "x", "y")
           .select(F.col("n"), F.col("hsic").alias("obs")))
    w_id = Window.orderBy("id")
    left = base.select(F.row_number().over(w_id).alias("i"), "x")
    branches = []
    for b, (a, c) in enumerate(cw_constants(n_perms, seed)):
        # affine-then-SQUARE: the affine map alone sends consecutive
        # ids to an arithmetic progression mod M31 whose rank order is
        # a lattice (three-distance theorem), which can align with
        # periodic features; squaring mod the prime scrambles it
        k1 = (F.col("id") * F.lit(a) + F.lit(c)) % F.lit(_M31)
        key = (k1 * k1) % F.lit(_M31)
        w_k = Window.orderBy(key.asc(), F.col("id").asc())
        right = base.select(F.row_number().over(w_k).alias("i"), "y")
        perm = left.join(right, "i").select("x", "y")
        branches.append(delta_hsic_table(perm, "x", "y")
                        .select(F.col("hsic").alias("ph")))
    perms = branches[0]
    for br in branches[1:]:
        perms = perms.unionByName(br)
    tail = perms.crossJoin(obs).agg(
        F.sum(F.when(F.col("ph") >= F.col("obs"), 1).otherwise(0))
         .alias("n_ge"))
    out = obs.crossJoin(tail)
    p = ((F.lit(1) + F.col("n_ge")).cast("double")
         / F.lit(float(n_perms + 1)))
    return out.select("n", F.col("obs").alias("hsic"),
                      F.lit(n_perms).cast("long").alias("n_perms"),
                      F.col("n_ge").cast("long").alias("n_ge"),
                      p.alias("p_value"))


def hsic_stability(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    id_col: str,
    top_m: int = 3,
    n_replicates: int = 8,
    seed: int = 8011,
) -> DataFrame:
    """Stability selection (Meinshausen & Bühlmann 2010) over the
    exact delta-kernel HSIC ranking: rank the features on
    ``n_replicates`` Poisson(1) bootstrap resamples and report, per
    feature, how often it lands in the top ``top_m`` — the selection-
    robustness signal a one-shot ranking cannot give (a feature that
    wins once by a hair scores low; a feature that wins every
    resample is load-bearing).

    Exact end to end: resample weights are integer Poisson draws from
    the engine's replayable counter-hash ('poly' Carter-Wegman mode,
    ``operators/bootstrap``), weighted contingency counts stay exact
    integers, every replicate's HSIC is the count-closed form, so a
    second engine reproduces all B rankings and the exact stability
    fractions.

    Scale shape: ONE count shuffle for ALL features × replicates (the
    unpivoted stack explodes ×B before the map-side combine — the
    declared B× pre-combine cost of stability selection; the shuffle
    itself carries only collapsed cells).  Returns (feature,
    n_selected, n_replicates, stability).
    """
    if not (1 <= top_m <= len(feature_cols)):
        raise ValueError("top_m must be in [1, n_features]")
    from pyspark.sql import Window
    from .bootstrap import _poisson_weight, _poly_u
    u = _poly_u(id_col, n_replicates, seed)
    long_df = _unpivot(df, feature_cols).select(
        "feature", "value",
        F.col(label_col).cast("long").alias("__y"),
        F.col(id_col).cast("string").alias(id_col))
    expl = long_df.select(
        "*", F.explode(F.expr(f"sequence(0, {n_replicates - 1})"))
        .alias("__b"))
    w = _poisson_weight(u(F.col("__b")))
    cells = (expl.groupBy("feature", "__b",
                          F.col("value").alias("__x"), "__y")
             .agg(F.sum(w).alias("__c")))
    wx = Window.partitionBy("feature", "__b", "__x")
    wy = Window.partitionBy("feature", "__b", "__y")
    cells = (cells
             .withColumn("__cx", F.sum("__c").over(wx))
             .withColumn("__cy", F.sum("__c").over(wy)))
    per = (cells.groupBy("feature", "__b").agg(
        F.sum("__c").alias("n"),
        F.sum(F.col("__c") * F.col("__c")).alias("a_sum"),
        F.sum(F.col("__c") * F.col("__cx") * F.col("__cy"))
         .alias("b_sum"),
        F.sum(F.col("__c") * F.col("__cx")).alias("cx_sum"),
        F.sum(F.col("__c") * F.col("__cy")).alias("cy_sum")))
    nd = F.col("n").cast("double")
    d2 = nd * nd
    hsic = (F.col("a_sum").cast("double") / d2
            - F.lit(2.0) * F.col("b_sum").cast("double") / (d2 * nd)
            + (F.col("cx_sum").cast("double") / d2)
              * (F.col("cy_sum").cast("double") / d2))
    scored = per.withColumn("hsic", hsic)
    w_rank = Window.partitionBy("__b").orderBy(
        F.col("hsic").desc(), F.col("feature").asc())
    sel = (scored.withColumn("rk", F.row_number().over(w_rank))
           .withColumn("sel", (F.col("rk") <= top_m).cast("long")))
    return (sel.groupBy("feature").agg(
        F.sum("sel").alias("n_selected"),
        F.count(F.lit(1)).alias("n_replicates"))
        .withColumn("stability",
                    F.col("n_selected").cast("double")
                    / F.col("n_replicates").cast("double")))


def conditional_mi_table(
    df: DataFrame,
    triples: Sequence[Tuple[str, str, str]],
    keys: Sequence[Tuple[str, str]],
) -> DataFrame:
    """Exact plug-in CONDITIONAL mutual information I(X; Y | Z) for a
    list of (x_col, y_col, z_col) triples, labeled by ``keys``
    (parallel (fa, fb) string pairs):

        I(X;Y|Z) = Σ_{x,y,z} (c_xyz/n) · ln( c_xyz·c_z / (c_xz·c_yz) )

    The same integer-count discipline as :func:`mutual_info_table`,
    one dimension deeper: ONE count shuffle over the stacked triple
    cells, marginals as window sums over the same exchange, and the
    float fold in sorted (x, y, z) cell order.
    """
    parts = []
    for (xc, yc, zc), (fa, fb) in zip(triples, keys):
        parts.append(
            f"'{fa}', '{fb}', CAST({xc} AS LONG), "
            f"CAST({yc} AS LONG), CAST({zc} AS LONG)")
    long_df = df.selectExpr(
        f"stack({len(parts)}, {', '.join(parts)})"
        " AS (fa, fb, __x, __y, __z)")
    cells = (long_df.groupBy("fa", "fb", "__x", "__y", "__z")
             .agg(F.count(F.lit(1)).alias("__c")))
    from pyspark.sql import Window
    wz = Window.partitionBy("fa", "fb", "__z")
    wxz = Window.partitionBy("fa", "fb", "__x", "__z")
    wyz = Window.partitionBy("fa", "fb", "__y", "__z")
    cells = (cells
             .withColumn("__cz", F.sum("__c").over(wz))
             .withColumn("__cxz", F.sum("__c").over(wxz))
             .withColumn("__cyz", F.sum("__c").over(wyz)))
    per_key = (cells.groupBy("fa", "fb")
               .agg(F.sum("__c").alias("n"),
                    F.array_sort(F.collect_list(F.struct(
                        F.col("__x").alias("x"),
                        F.col("__y").alias("y"),
                        F.col("__z").alias("z"),
                        F.col("__c").alias("c"),
                        F.col("__cz").alias("cz"),
                        F.col("__cxz").alias("cxz"),
                        F.col("__cyz").alias("cyz")))).alias("__cells")))

    def term(acc, s):
        return acc + (
            s["c"].cast("double") / F.col("n").cast("double")
        ) * F.log(
            (s["c"] * s["cz"]).cast("double")
            / (s["cxz"] * s["cyz"]).cast("double")
        )

    return (per_key
            .withColumn("cmi", F.aggregate("__cells", F.lit(0.0), term))
            .drop("__cells"))


def cmim_select(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    k: int,
) -> DataFrame:
    """Greedy CMIM selection (Fleuret, "Fast Binary Feature Selection
    with Conditional Mutual Information", JMLR 2004): step 1 takes the
    max-relevance feature; step t takes

        argmax_f  min_{s ∈ selected}  I(f; y | s)

    — the candidate whose WORST-case conditional information (given
    any one already-picked feature) is largest, which kills both
    redundant features (CMI ≈ 0 given their twin) and irrelevant ones
    (all CMIs ≈ 0).  mRMR penalizes average redundancy; CMIM penalizes
    the single most-explaining selected feature — the sharper test.
    Ties go to the feature name.  Returns the trace
    (rk, feature, relevance, cmim_score).

    Shape: the d relevance MIs and d(d−1) conditional MIs are computed
    in two count shuffles (cells bounded by feature-pair count x value
    alphabet, never row count); the greedy runs on the driver over
    that tiny table.  The min over selected is order-independent
    (exact comparisons of identical doubles), so no fold-order
    discipline is needed beyond the per-CMI sorted cell fold.
    """
    if k < 1 or k > len(feature_cols):
        raise ValueError("k must be in [1, n_features]")
    rel_rows = info_gain_rank(df, feature_cols, label_col).collect()
    rel: Dict[str, float] = {r["feature"]: r["mi"] for r in rel_rows}
    feats = sorted(feature_cols)
    triples = [(f, label_col, s) for f in feats for s in feats
               if f != s]
    keys = [(f, s) for f in feats for s in feats if f != s]
    cmi_rows = conditional_mi_table(df, triples, keys).collect()
    cmi: Dict[Tuple[str, str], float] = {
        (r["fa"], r["fb"]): r["cmi"] for r in cmi_rows}

    remaining = list(feats)
    selected: List[str] = []
    trace = []
    for step in range(1, k + 1):
        best = None
        for f in remaining:
            score = (min(cmi[(f, s)] for s in selected)
                     if selected else rel[f])
            if best is None or score > best[0]:
                best = (score, f)
        score, f = best
        trace.append((step, f, float(rel[f]), float(score)))
        selected.append(f)
        remaining.remove(f)

    spark = df.sparkSession
    schema = T.StructType([
        T.StructField("rk", T.IntegerType()),
        T.StructField("feature", T.StringType()),
        T.StructField("relevance", T.DoubleType()),
        T.StructField("cmim_score", T.DoubleType()),
    ])
    return spark.createDataFrame(trace, schema)


def theils_u(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Theil's uncertainty coefficient U(X|Y) (Theil 1970) — the
    ASYMMETRIC normalized association "how much of X's entropy does
    knowing Y remove", the categorical-association companion of
    :func:`mutual_info_table`:

        U(X|Y) = (H(X) − H(X|Y)) / H(X) = MI(X;Y) / H(X)  ∈ [0, 1]

    Both columns must be integral (cast upstream).  MI comes from the
    exact count-table fold of :func:`mutual_info_table`; H(X) is its
    own x-marginal ordered float fold (Σ (cx/n)·ln(n/cx) in x-key
    order) off the same pass's marginal counts.  U is NULL when
    H(X) = 0 (constant X has nothing to explain).  Returns one row:
    (n, h_x, mi, u)."""
    d = df.select(F.col(x_col).cast("long").alias("__x"),
                  F.col(y_col).cast("long").alias("__y"))
    mi = mutual_info_table(d, "__x", "__y")
    hx_cells = (d.groupBy("__x")
                 .agg(F.count(F.lit(1)).alias("cx")))
    hx = (hx_cells
          .agg(F.sum("cx").alias("n2"),
               F.array_sort(F.collect_list(F.struct(
                   F.col("__x").alias("x"),
                   F.col("cx").alias("cx")))).alias("__m"))
          .withColumn(
              "h_x",
              F.aggregate(
                  "__m", F.lit(0.0),
                  lambda acc, s: acc
                  + (s["cx"].cast("double")
                     / F.col("n2").cast("double"))
                  * F.log(F.col("n2").cast("double")
                          / s["cx"].cast("double"))))
          .select("h_x"))
    j = mi.join(F.broadcast(hx))
    u = F.when(F.col("h_x") > 0.0, F.col("mi") / F.col("h_x"))
    return j.select(F.col("n").cast("long").alias("n"),
                    F.col("h_x").alias("h_x"), F.col("mi").alias("mi"),
                    u.alias("u"))


def g_test(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """G-test of independence (the likelihood-ratio χ² twin of the
    Pearson chi2 operator) on the (x, y) contingency table:

        G = 2 Σ Oᵢⱼ ln(Oᵢⱼ·n / (rᵢ·cⱼ)) = 2·n·MI(X;Y)   (nats)

    — the identity G = 2nMI means the statistic reuses
    :func:`mutual_info_table`'s exact sorted count-table fold
    verbatim; the only new work is the two marginal cardinalities for
    the degrees of freedom (R−1)(C−1).  Additive across partitions of
    the table (unlike Pearson χ²), which is why large-scale pipelines
    prefer it.  Both columns integral (cast upstream).  G is NULL
    when df = 0 (either variable constant).  Returns one row:
    (n, r, c, g_stat, df)."""
    d = df.select(F.col(x_col).cast("long").alias("__x"),
                  F.col(y_col).cast("long").alias("__y"))
    mi = mutual_info_table(d, "__x", "__y")
    dims = d.agg(F.countDistinct("__x").alias("r"),
                 F.countDistinct("__y").alias("c"))
    j = mi.join(F.broadcast(dims))
    dof = (F.col("r") - 1) * (F.col("c") - 1)
    g = F.when(dof > 0,
               F.lit(2.0) * F.col("n").cast("double") * F.col("mi"))
    return j.select(F.col("n").cast("long").alias("n"),
                    F.col("r").cast("long").alias("r"),
                    F.col("c").cast("long").alias("c"),
                    g.alias("g_stat"),
                    dof.cast("long").alias("df"))


def rbf_hsic_table(df: DataFrame, x_col: str, y_col: str,
                   gamma_x: float = 1.0 / 128.0,
                   gamma_y: float = 1.0 / 128.0) -> DataFrame:
    """Biased HSIC with RBF (Gaussian) kernels between two
    integer-QUANTIZED columns, computed in closed form on the joint
    count table — the continuous-kernel completion of
    :func:`delta_hsic_table` (the reference's other kernel family,
    ``/root/reference/hisel/kernels.py`` featwise RBF + ``hsic_b``):

        HSIC_b = T₁/n² − 2·T₂/n³ + (S_K/n²)·(S_L/n²)

        T₁  = Σ_{cells a,b} c_a c_b K(x_a,x_b) L(y_a,y_b)
        rK(x) = Σ_{x'} c_{x'} K(x,x')        (x-marginal fold)
        T₂  = Σ_cells c·rK(x)·rL(y)
        S_K = Σ_x c_x·rK(x)

    with K(x,x') = exp(−γₓ(x−x')²).  The quantized-domain contract
    (kendall_tau module note) bounds the joint alphabet, so T₁ is an
    O(cells²) DOUBLE-NESTED sorted fold — deterministic order inside
    and out, mirrored by the SQL oracle's nested list_reduce; the
    marginal folds are O(V²).  γ defaults are exact binary fractions
    so the exp argument is an exact double (the final round-6 absorbs
    the last-ulp libm exp differences across engines, the psi/ln
    convention).  Returns one row: (n, n_cells, hsic)."""
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    gx, gy = F.lit(float(gamma_x)), F.lit(float(gamma_y))
    cells = (df.filter(x.isNotNull() & y.isNotNull())
               .select(x.alias("__x"), y.alias("__y"))
               .groupBy("__x", "__y")
               .agg(F.count(F.lit(1)).alias("__c")))
    one = cells.agg(
        F.sum("__c").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.array_sort(F.collect_list(F.struct(
            F.col("__x").alias("x"), F.col("__y").alias("y"),
            F.col("__c").alias("c")))).alias("cl"))

    def k(d2, g):
        return F.exp(-g * d2.cast("double"))

    def kx(a, b):
        return k((a - b) * (a - b), gx)

    def ky(a, b):
        return k((a - b) * (a - b), gy)

    cl = F.col("cl")
    # T1: nested sorted fold over cell pairs
    t1 = F.aggregate(
        cl, F.lit(0.0),
        lambda acc, o: acc + F.aggregate(
            cl, F.lit(0.0),
            lambda a2, i: a2 + (o["c"] * i["c"]).cast("double")
            * kx(o["x"], i["x"]) * ky(o["y"], i["y"])))
    # rK(x) = Σ_cells c·K(x, cell.x) — cell counts sum to the
    # x-marginal, so this IS the marginal fold, in cell-sort order
    def rk_cells(xv):
        return F.aggregate(
            cl, F.lit(0.0),
            lambda a2, s: a2 + s["c"].cast("double")
            * kx(xv, s["x"]))

    def rl_cells(yv):
        return F.aggregate(
            cl, F.lit(0.0),
            lambda a2, s: a2 + s["c"].cast("double")
            * ky(yv, s["y"]))

    t2 = F.aggregate(
        cl, F.lit(0.0),
        lambda acc, o: acc + o["c"].cast("double")
        * rk_cells(o["x"]) * rl_cells(o["y"]))
    sk = F.aggregate(
        cl, F.lit(0.0),
        lambda acc, o: acc + o["c"].cast("double")
        * rk_cells(o["x"]))
    sl = F.aggregate(
        cl, F.lit(0.0),
        lambda acc, o: acc + o["c"].cast("double")
        * rl_cells(o["y"]))
    nd = F.col("n").cast("double")
    d2 = nd * nd
    hsic = (t1 / d2 - F.lit(2.0) * t2 / (d2 * nd)
            + (sk / d2) * (sl / d2))
    return one.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_cells").cast("long").alias("n_cells"),
        hsic.alias("hsic"))


def partial_corr(df: DataFrame, x_col: str, y_col: str,
                 z_col: str) -> DataFrame:
    """First-order partial correlation — the x↔y association with z
    "held fixed", the confounder-aware cousin of corr_matrix:

        r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²))

    All three pairwise correlations come from ONE aggregate of exact
    int64 moments (n, Σ, ΣΣ for every pair — the corr_matrix
    discipline), and each r plus the combination is a fixed float
    expression tree mirrored by the oracle.  NULL when any marginal
    is constant or either 1−r² factor ≤ 0.  Returns one row:
    (n, r_xy, r_xz, r_yz, r_xy_z)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    z = F.col(z_col).cast("long")
    d = (df.filter(x.isNotNull() & y.isNotNull() & z.isNotNull())
           .select(x.alias("x"), y.alias("y"), z.alias("z")))
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"))
    nd = F.col("n").cast("double")

    def cm(sab, sa, sb):
        return (F.col(sab).cast("double")
                - F.col(sa).cast("double") * F.col(sb).cast("double")
                / nd)

    cxx, cyy, czz = cm("sxx", "sx", "sx"), cm("syy", "sy", "sy"), \
        cm("szz", "sz", "sz")
    cxy, cxz, cyz = cm("sxy", "sx", "sy"), cm("sxz", "sx", "sz"), \
        cm("syz", "sy", "sz")
    ok0 = (cxx > 0.0) & (cyy > 0.0) & (czz > 0.0)
    rxy = F.when(ok0, cxy / F.sqrt(cxx * cyy))
    rxz = F.when(ok0, cxz / F.sqrt(cxx * czz))
    ryz = F.when(ok0, cyz / F.sqrt(cyy * czz))
    den2 = (F.lit(1.0) - rxz * rxz) * (F.lit(1.0) - ryz * ryz)
    pc = F.when(ok0 & (den2 > 0.0),
                (rxy - rxz * ryz) / F.sqrt(den2))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        rxy.alias("r_xy"), rxz.alias("r_xz"), ryz.alias("r_yz"),
        pc.alias("r_xy_z"))


def fisher_score(df: DataFrame, feature_cols: Sequence[str],
                 y_col: str) -> DataFrame:
    """Fisher score of every feature against a discrete label — the
    classical between/within variance-ratio filter (the LDA-criterion
    sibling of :func:`info_gain_rank`, for CONTINUOUS features where
    info-gain would need binning first):

        score(f) = Σ_c n_c (μ_c − μ)²  /  Σ_c n_c σ_c²

    with per-class means/variances.  One unpivoted shuffle computes
    exact int64 sufficient statistics (n_c, Σv, Σv²) per (feature,
    class); the two float series fold in ascending-class order so
    both engines sum identically.  Features must be integer-valued
    (cents convention), the label discrete.  score is NULL when the
    within-class variance is 0 (all classes constant).  Returns one
    row per feature: (feature, n, n_classes, score).

    Reference ties: the ksgmi preselection filter
    (`/root/reference/hisel/select.py:45-75`) plays this role in
    hisel; Fisher score is the moments-based alternative a feature
    dashboard ranks next to MI.
    """
    feature_cols = list(feature_cols)
    y = F.col(y_col).cast("long")
    long_df = (_unpivot(df, feature_cols)
               .select("feature", "value", y.alias("__y")))
    per_cy = long_df.groupBy("feature", "__y").agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum("value").alias("sc"),
        F.sum(F.col("value") * F.col("value")).alias("qc"))
    agg = per_cy.groupBy("feature").agg(
        F.sum("nc").alias("n"),
        F.sum("sc").alias("s"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sort_array(F.collect_list(F.struct(
            F.col("__y").alias("y"), F.col("nc").alias("nc"),
            F.col("sc").alias("sc"), F.col("qc").alias("qc"))))
        .alias("cells"))

    def dd(x):
        return x.cast("double")

    mu = dd(F.col("s")) / dd(F.col("n"))
    between = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc + dd(e["nc"])
        * (dd(e["sc"]) / dd(e["nc"]) - mu)
        * (dd(e["sc"]) / dd(e["nc"]) - mu))
    # Σ_c n_c σ_c² = Σ_c (qc − sc²/nc)   (biased per-class variance ×n_c)
    within = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, e: acc + dd(e["qc"])
        - dd(e["sc"]) * dd(e["sc"]) / dd(e["nc"]))
    return agg.select(
        "feature",
        F.col("n").cast("long").alias("n"),
        F.col("n_classes").cast("long").alias("n_classes"),
        F.when(within > 0.0, between / within).alias("score"))


def symmetric_uncertainty(df: DataFrame, x_col: str,
                          y_col: str) -> DataFrame:
    """Symmetric uncertainty SU(X,Y) = 2·MI/(H(X)+H(Y)) — the
    symmetric, [0,1]-normalized cousin of :func:`theils_u` (Witten &
    Frank's CFS criterion).  MI comes from
    :func:`mutual_info_table`'s exact count-table fold; each marginal
    entropy is its own key-ordered fold off the same pass's counts.
    Both columns integral (cast upstream).  SU is NULL when
    H(X)+H(Y) = 0 (both constant).  Returns one row:
    (n, h_x, h_y, mi, su)."""
    d = df.select(F.col(x_col).cast("long").alias("__x"),
                  F.col(y_col).cast("long").alias("__y"))
    mi = mutual_info_table(d, "__x", "__y")

    def marginal_h(col: str, out: str) -> DataFrame:
        cells = d.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return (cells
                .agg(F.sum("c").alias("n2"),
                     F.array_sort(F.collect_list(F.struct(
                         F.col(col).alias("k"),
                         F.col("c").alias("c")))).alias("__m"))
                .withColumn(
                    out,
                    F.aggregate(
                        "__m", F.lit(0.0),
                        lambda acc, s: acc
                        + (s["c"].cast("double")
                           / F.col("n2").cast("double"))
                        * F.log(F.col("n2").cast("double")
                                / s["c"].cast("double"))))
                .select(out))

    j = (mi.join(F.broadcast(marginal_h("__x", "h_x")))
           .join(F.broadcast(marginal_h("__y", "h_y"))))
    den = F.col("h_x") + F.col("h_y")
    su = F.when(den > 0.0, F.lit(2.0) * F.col("mi") / den)
    return j.select(F.col("n").cast("long").alias("n"),
                    "h_x", "h_y", F.col("mi").alias("mi"),
                    su.alias("su"))
