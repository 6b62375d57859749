"""Deterministic, content-keyed sampling for corpus curation.

Training pipelines need REPRODUCIBLE subsets: re-running the job — on
any cluster size, any partition layout — must pick the same rows, or
ablation studies and resume logic are garbage.  Row-random sampling
(``df.sample``) is layout-dependent; these operators key every
decision on the same cross-engine polynomial content hash as
:mod:`hiselspark.operators.splits`, so the DuckDB gate oracle
recomputes membership row by row.

* :func:`hash_sample` — Bernoulli-style ``frac`` sampling: keep a row
  iff ``content_hash(text, salt) % DENOM < frac * DENOM``.  Map-only,
  no shuffle; duplicates are kept or dropped together (content-keyed),
  and disjoint salts give independent samples.
* :func:`quota_sample` — per-group cap (the "at most K documents per
  domain" balancing rule of public corpus recipes): keep the ``cap``
  rows with the smallest ``(content_hash, id)`` priority per group.
* :func:`temperature_mix` / :func:`temperature_budgets` — mixture
  reweighting at a temperature: per-group budgets ∝ ``mass^alpha``
  normalized to a total (α=1 natural, α=0 equal, α≈0.5 boosts small
  sources), in exact integer arithmetic for the canonical alphas,
  then cut with :func:`token_budget_sample`.
* :func:`token_budget_sample` — corpus MIXING by token budget: per
  group, walk documents in ``(content_hash, id)`` priority order and
  keep them while the cumulative whitespace-token count stays within
  the group's budget (how public pretraining recipes realize mixture
  weights as per-source token quotas).  Skew-safe two-level plan with
  an exactness twist: the local pre-cut retains every true keep (a
  kept row's local prefix sum ≤ its global prefix sum), but survivors
  of OTHER partitions can under-count a later row's true prefix — so
  the group's minimal locally-DROPPED priority is aggregated (tiny,
  one row per group) and broadcast back as a hard cut: no true keep
  can follow any dropped row in priority order, hence cutting there
  restores exact prefix-sum semantics (proof in the function body).
  Skew-safe two-level plan: a pre-rank keyed on
  ``(group, input-partition-id)`` cuts each (partition × group) to
  ``cap`` candidates — that shuffle fans a hot group out over P
  reducer keys instead of serializing it through one, and provably
  retains every global winner — then the real ``row_number`` shuffles
  only the survivors (at most ``cap × P`` per group, never the whole
  hot group).  The pre-rank keys are layout-dependent; the OUTPUT is
  layout-independent because the ``(content_hash, id)`` priority is a
  total order.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .splits import content_hash

_DENOM = 1_000_000


def hash_sample(df: DataFrame, frac: float, text_col: str = "text",
                salt: int = 0) -> DataFrame:
    """Deterministic ``frac`` sample keyed on text content."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    thresh = int(round(frac * _DENOM))
    return df.where(
        (content_hash(text_col, salt) % _DENOM) < thresh)


def quota_sample(df: DataFrame, group_col: str, cap: int,
                 text_col: str = "text", id_col: str = "doc_id",
                 salt: int = 0) -> DataFrame:
    """At most ``cap`` rows per group, deterministically chosen by
    ``(content_hash(text), id)`` priority.  Output columns = input
    columns (no rank leaked)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    pri = df.withColumn(
        "__pri", content_hash(text_col, salt)).withColumn(
        "__pid", F.spark_partition_id())
    order = [F.col("__pri"), F.col(id_col)]
    # level 1: local cut — keeps all global winners by construction
    local = Window.partitionBy(group_col, "__pid").orderBy(*order)
    survivors = (pri.withColumn("__lr", F.row_number().over(local))
                 .where(F.col("__lr") <= cap))
    # level 2: global rank over the bounded survivor set
    final = Window.partitionBy(group_col).orderBy(*order)
    return (survivors.withColumn("__r", F.row_number().over(final))
            .where(F.col("__r") <= cap)
            .drop("__pri", "__pid", "__lr", "__r"))


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    budget: int,
    budgets: dict[str, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Keep documents in ``(content_hash, id)`` priority order while
    each group's cumulative token count stays ≤ its budget (the rule:
    keep a row iff its own global prefix sum ≤ budget).  ``budgets``
    overrides ``budget`` per group value.  Output columns = input
    columns.

    Exactness of the two-level plan: write ``P(Y)`` for Y's global
    prefix sum and ``L(Y)`` for its prefix sum within its input
    partition; ``L(Y) ≤ P(Y)`` always (non-negative weights).
    (a) A true keep (``P(Y) ≤ B``) has ``L(Y) ≤ B`` → survives the
    local cut.  (b) If any row X is locally dropped (``L(X) > B`` so
    ``P(X) > B``), then every row after X in priority has prefix
    ``≥ P(X) > B`` — no true keep follows any dropped row.  Therefore
    every row preceding a true keep is itself a local survivor, so
    the survivor-only cumulative sum is EXACT for true keeps; and
    cutting at the group's minimal dropped priority removes exactly
    the rows whose survivor-sum could under-count."""
    from ..functions.text import token_count
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if budgets:
        b = F.lit(int(budget))
        for k, v in budgets.items():
            b = F.when(F.col(group_col) == k, F.lit(int(v))) \
                 .otherwise(b)
    else:
        b = F.lit(int(budget))
    pri = (df.withColumn("__pri", content_hash(text_col, salt))
             .withColumn("__pid", F.spark_partition_id())
             .withColumn("__n", token_count(text_col).cast("long"))
             .withColumn("__b", b))
    order = [F.col("__pri"), F.col(id_col)]
    local = (Window.partitionBy(group_col, "__pid").orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, 0))
    cut = pri.withColumn("__lc", F.sum("__n").over(local))
    survivors = cut.where(F.col("__lc") <= F.col("__b"))
    # one tiny row per group: the smallest locally-dropped priority
    dropped_min = (cut.where(F.col("__lc") > F.col("__b"))
                   .groupBy(group_col)
                   .agg(F.min(F.struct("__pri", id_col))
                        .alias("__dmin")))
    final = (Window.partitionBy(group_col).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, 0))
    return (survivors
            .join(F.broadcast(dropped_min), group_col, "left")
            .withColumn("__c", F.sum("__n").over(final))
            .where((F.col("__c") <= F.col("__b"))
                   & (F.col("__dmin").isNull()
                      | (F.struct("__pri", id_col) < F.col("__dmin"))))
            .drop("__pri", "__pid", "__n", "__b", "__lc", "__c",
                  "__dmin"))


def temperature_budgets(
    df: DataFrame,
    group_col: str,
    alpha: float,
    total_tokens: int,
    text_col: str = "text",
) -> dict:
    """Per-group token budgets ∝ ``(group token mass)^alpha``,
    normalized to ``total_tokens`` — temperature-based mixture
    reweighting (the multilingual/data-mixing upsampling rule:
    ``alpha=1`` keeps natural proportions, ``alpha=0`` equalizes
    groups, ``alpha≈0.5`` boosts small sources).  One aggregate over
    the frame; the result is a tiny dict (one entry per group) meant
    to feed :func:`token_budget_sample`.

    The canonical temperatures ``alpha in (0, 0.5, 1)`` are computed
    in EXACT integer arithmetic (``isqrt`` for 0.5), so the budgets
    are bit-identical on any engine and any summation order — which
    is what lets the DuckDB gate oracle replay them.  Other alphas
    take the float ``pow`` path (deterministic per platform, but not
    oracle-exact).
    """
    import math
    from ..functions.text import token_count
    if total_tokens < 0:
        raise ValueError(f"total_tokens must be >= 0: {total_tokens}")
    sums = (df.groupBy(group_col)
            .agg(F.sum(token_count(text_col).cast("long")).alias("__t"))
            .collect())
    if alpha in (0.0, 0.5, 1.0):
        def w(t: int) -> int:
            if alpha == 0.0:
                return 1
            return math.isqrt(t) if alpha == 0.5 else t
        weights = {r[group_col]: w(int(r["__t"])) for r in sums}
        denom = sum(weights.values())
        if denom == 0:
            return {g: 0 for g in weights}
        return {g: (total_tokens * wg) // denom
                for g, wg in weights.items()}
    denom_f = sum(float(r["__t"]) ** alpha for r in sums)
    if denom_f == 0:
        return {r[group_col]: 0 for r in sums}
    return {
        r[group_col]: int(math.floor(
            total_tokens * float(r["__t"]) ** alpha / denom_f))
        for r in sums
    }


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Corpus mixing at a temperature: derive per-group budgets with
    :func:`temperature_budgets`, then cut each group to its budget in
    deterministic ``(content_hash, id)`` priority order with the exact
    skew-safe :func:`token_budget_sample` plan."""
    budgets = temperature_budgets(df, group_col, alpha, total_tokens,
                                  text_col)
    return token_budget_sample(df, group_col, 0, budgets=budgets,
                               text_col=text_col, id_col=id_col,
                               salt=salt)


NEG_SAMPLE_SEED = 7207


def negative_samples(
    df: DataFrame,
    user_col: str,
    item_col: str,
    n_items: int,
    k: int = 3,
    seed: int = NEG_SAMPLE_SEED,
) -> DataFrame:
    """Deterministic negative sampling for contrastive / implicit-
    feedback training: for every positive (user, item) pair emit ``k``
    pseudo-random negative item ids drawn by a Carter-Wegman hash of
    (positive row, slot) over the item universe ``[0, n_items)``,
    bumped by one (mod n) when the draw collides with the positive —
    the standard corruption scheme (word2vec / BPR) made REPRODUCIBLE:
    no RNG stream, so re-running the pipeline (or another engine)
    regenerates the identical training set.

    Returns (user, item, slot, neg_item) with ``slot`` in 1..k.
    Map-only — a pure projection over the positives, no shuffle, no
    Python; the k-fold expansion happens in one JVM ``explode`` of a
    bounded sequence.

    Caveat (documented, inherent to hash-corruption): a draw may
    collide with ANOTHER of the user's positives — at web scale the
    standard practice is to accept the O(positives/n_items) noise
    rate rather than pay a per-user anti-join; compose with
    ``dedup``/anti-join machinery when exactness matters."""
    if n_items < 2 or k < 1:
        raise ValueError("need n_items >= 2 and k >= 1")
    from .bootstrap import _M31, cw_constants
    (a, c), = cw_constants(1, seed)
    base = df.select(F.col(user_col).alias("user"),
                     F.col(item_col).cast("long").alias("item"))
    out = base.select(
        "user", "item",
        F.explode(F.expr(f"sequence(1, {k})")).alias("slot"))
    mix = ((F.col("user").cast("long") * F.lit(1_000_003)
            + F.col("item")) * F.lit(k) + F.col("slot"))
    draw = ((mix % F.lit(_M31)) * F.lit(a) + F.lit(c)) % F.lit(_M31)
    neg = draw % F.lit(n_items)
    neg = F.when(neg == F.col("item"),
                 (neg + 1) % F.lit(n_items)).otherwise(neg)
    return out.withColumn("neg_item", neg.cast("long"))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    group_col: str = None,
    salt: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group (Efraimidis
    & Spirakis, "Weighted random sampling with a reservoir", IPL
    2006): each row gets priority key ``ln(u) / w`` with u uniform in
    (0, 1] and w its weight, and the k LARGEST keys win — exactly the
    A-ES scheme (u^(1/w) top-k, monotone-log equivalent).  Heavier
    rows win more often, no row twice.

    As everywhere in this engine, u is not an RNG draw but the
    portable polynomial hash of the row id scaled to (0, 1] —
    deterministic across partition layouts, cluster sizes and engines
    (the oracle replays the identical fold, ln and division), salted
    for fresh resamples.  Weights must be > 0 (rows with w <= 0 or
    NULL are dropped — a zero-weight row can never be sampled).

    Scale shape: one hash shuffle on the group key + one bounded
    top-k window per group (or a global TakeOrdered when
    ``group_col`` is None).  Ties (identical keys) break by id.
    Returns the input rows plus (es_key, rk).
    """
    from .splits import raw_hash
    mod = 2_147_483_647
    u = (raw_hash(F.col(id_col), salt) + 1).cast("double") / float(mod + 1)
    key = F.log(u) / F.col(weight_col).cast("double")
    out = (df.filter(F.col(weight_col).isNotNull()
                     & (F.col(weight_col) > 0))
             .withColumn("es_key", key))
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(F.col("es_key").desc(),
                                          F.col(id_col).asc())
    return (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") <= int(k)))
