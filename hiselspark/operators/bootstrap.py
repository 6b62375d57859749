"""Counter-based Poisson bootstrap — confidence intervals for
aggregate statistics computed in ONE distributed pass, reproducible to
the bit.

The classic bootstrap ("resample n rows with replacement, B times") is
unusable at 10^12 rows; the standard industrial fix (large-scale A/B
platforms) is the ONLINE/POISSON bootstrap: each row enters replicate
``b`` with an independent Poisson(1) weight, so all B replicates are
computed in a single scan with per-row arithmetic and a map-side
combined ``groupBy(replicate)`` whose shuffle carries B rows per task
— never a resampled copy of the data.

Determinism discipline (the engine convention): the Poisson draw is a
counter hash — ``u = pmod(xxhash64(id, b, seed), 2^20) / 2^20`` mapped
through the Poisson(1) CDF as literal thresholds (capped at 6, the
residual mass ≈ 1e-4 folded into the top bucket) — so weights are pure
integer expressions any engine replays; weighted sums of
integer-quantized values stay exact; and the percentile CI uses the
q·(n−1) interpolation rule shared with DuckDB/NumPy.  The result is a
bootstrap whose every digit is layout-independent and SQL-checkable.

Reference parity note: the reference engine (transferwise/hisel) has
no resampling/uncertainty layer — this module belongs to the grafted
statistics surface (north rule), alongside the evaluation metrics.
"""
from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F

# Poisson(1) CDF thresholds scaled to 2^20 (exact integers): weight k
# for u in [T[k-1], T[k]); the tail mass beyond 6 joins the k=6 bucket.
_SCALE = 1 << 20
_CDF = [385749, 771499, 964373, 1028665, 1044738, 1047952, _SCALE]

# Mersenne prime for the Carter-Wegman family of the 'poly' hash mode.
_M31 = (1 << 31) - 1


def cw_constants(n_replicates: int, seed: int) -> list:
    """Per-replicate (a_b, c_b) pairs of the Carter-Wegman 2-universal
    family ``u_b(h) = ((h·a_b + c_b) mod M31) mod 2^20`` used by the
    ``hash='poly'`` mode.  ``random.Random`` is specified to be stable
    across Python versions, so these are reproducible literals — the
    DuckDB oracle embeds the identical values.  Pairwise independence
    of a 2-universal family is sufficient for the variance of Poisson-
    bootstrap replicate means (Carter & Wegman 1979; Dean & Ghemawat's
    one-pass bootstrap uses the same argument)."""
    r = random.Random(f"cw:{int(seed)}")
    return [(r.randrange(1, _M31), r.randrange(_M31))
            for _ in range(int(n_replicates))]


def _poly_u(id_col: str, n_replicates: int, seed: int):
    """Column-builder: u(row, b) for the cross-engine 'poly' mode.
    Row hash = the engine's polynomial fold of the id string
    (``splits.raw_hash`` — replayable in DuckDB with str_split +
    list_reduce); per-replicate mix = literal Carter-Wegman constants
    indexed via ``element_at``.  All arithmetic stays below 2^62, so
    no bigint overflow under ANSI mode in either engine."""
    from .splits import raw_hash
    cw = cw_constants(n_replicates, seed)
    a_arr = F.array(*[F.lit(a) for a, _ in cw])
    c_arr = F.array(*[F.lit(c) for _, c in cw])
    h = raw_hash(id_col)
    return lambda b: F.pmod(
        h * F.element_at(a_arr, b + 1) + F.element_at(c_arr, b + 1),
        F.lit(_M31)) % F.lit(_SCALE)


def _poisson_weight(u):
    """Integer Poisson(1) draw from an integer uniform in [0, 2^20)."""
    w = F.lit(6)
    for k in range(len(_CDF) - 2, -1, -1):
        w = F.when(u < _CDF[k], F.lit(k)).otherwise(w)
    return w


def poisson_bootstrap_mean(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 100,
    seed: int = 7,
    alpha: float = 0.05,
    hash: str = "xxhash64",
) -> DataFrame:
    """Percentile-bootstrap CI for the MEAN of an integer-quantized
    column: one row ``(point, lo, hi, n_replicates)`` where point is
    the plain mean and [lo, hi] the (α/2, 1−α/2) percentiles of the B
    Poisson-replicate means.  One scan of the data: per row, the B
    weights are a ``transform`` over ``sequence(0, B−1)``; the
    per-replicate (Σw·x, Σw) reduce map-side, so the shuffle carries B
    rows per task and the final table is B rows regardless of input
    size.

    ``hash``: 'xxhash64' (default — one JVM intrinsic per draw, the
    production path) or 'poly' (the cross-engine Carter-Wegman mode:
    row hash = polynomial id fold, per-replicate literal mix — every
    draw replayable in DuckDB, so the correctness gate verifies the
    whole bootstrap end to end)."""
    B = int(n_replicates)
    if hash == "poly":
        u = _poly_u(id_col, B, seed)
    else:
        u = lambda b: F.pmod(  # noqa: E731
            F.xxhash64(F.col(id_col), b, F.lit(int(seed))),
            F.lit(_SCALE))
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(B - 1)),
        lambda b: F.struct(
            b.alias("rep"),
            _poisson_weight(u(b)).alias("w")))
    ex = (df.select(F.col(value_col).alias("x"),
                    F.explode(pairs).alias("p"))
            .select("x", F.col("p.rep").alias("rep"),
                    F.col("p.w").alias("w")))
    reps = (ex.groupBy("rep")
              .agg(F.sum(F.col("w") * F.col("x")).alias("wx"),
                   F.sum("w").alias("wn"))
              .select((F.col("wx").cast("double")
                       / F.col("wn").cast("double")).alias("m")))
    lo_q, hi_q = float(alpha) / 2.0, 1.0 - float(alpha) / 2.0
    point = df.agg((F.sum(value_col).cast("double")
                    / F.count(value_col).cast("double"))
                   .alias("point"))
    ci = reps.agg(
        F.percentile("m", F.lit(lo_q)).alias("lo"),
        F.percentile("m", F.lit(hi_q)).alias("hi"),
        F.count(F.lit(1)).alias("n_replicates"))
    return point.crossJoin(ci)


def permutation_test_diff_means(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    n_permutations: int = 200,
    seed: int = 11,
    hash: str = "xxhash64",
) -> DataFrame:
    """Randomization test for a difference in means between two groups
    (the A/B significance test that assumes nothing about the
    distribution): observed ``mean(B) − mean(A)`` against the null
    distribution obtained by relabeling rows with counter-hash
    pseudo-groups that preserve the treatment fraction in expectation.
    Returns one row ``(obs_diff, p_value, n_permutations)`` with the
    add-one two-sided p-value ``(1 + #{|diff_b| ≥ |obs|}) / (B + 1)``.

    Same one-scan shape as :func:`poisson_bootstrap_mean`: per row the
    B pseudo-labels are a ``transform`` over ``sequence``, the
    per-(replicate, pseudo-group) sums combine map-side (shuffle = 2B
    rows per task), and everything downstream of the exact integer
    sums is a bounded B-row table.  Deterministic across layouts
    (counter hashes, exact sums) — pinnable."""
    B = int(n_permutations)
    g1 = F.col(group_col).cast("long")
    base = df.agg(
        F.sum(F.col(value_col) * g1).alias("s1"),
        F.sum(g1).alias("n1"),
        F.sum(F.col(value_col) * (1 - g1)).alias("s0"),
        F.sum(1 - g1).alias("n0")).collect()[0]
    if not base["n1"] or not base["n0"]:
        raise ValueError("both groups must be non-empty")
    obs = (base["s1"] / base["n1"]) - (base["s0"] / base["n0"])
    # Bernoulli(p = n1/n) pseudo-labels, threshold as an exact integer
    # (floor(x+0.5), not Python round(): banker's rounding has no SQL
    # twin — the DuckDB oracle replays the same half-up rule)
    import math
    p_scaled = int(math.floor(base["n1"] / (base["n1"] + base["n0"])
                              * _SCALE + 0.5))
    if hash == "poly":
        u = _poly_u(id_col, int(n_permutations), seed)
    else:
        u = lambda b: F.pmod(  # noqa: E731
            F.xxhash64(F.col(id_col), b, F.lit(int(seed))),
            F.lit(_SCALE))
    labels = F.transform(
        F.sequence(F.lit(0), F.lit(B - 1)),
        lambda b: F.struct(
            b.alias("rep"),
            (u(b) < p_scaled).cast("long").alias("pg")))
    ex = (df.select(F.col(value_col).alias("x"),
                    F.explode(labels).alias("l"))
            .select("x", F.col("l.rep").alias("rep"),
                    F.col("l.pg").alias("pg")))
    reps = (ex.groupBy("rep")
              .agg(F.sum(F.col("x") * F.col("pg")).alias("s1"),
                   F.sum("pg").alias("n1"),
                   F.sum(F.col("x") * (1 - F.col("pg"))).alias("s0"),
                   F.sum(1 - F.col("pg")).alias("n0"))
              .filter((F.col("n1") > 0) & (F.col("n0") > 0))
              .select((F.col("s1").cast("double")
                       / F.col("n1").cast("double")
                       - F.col("s0").cast("double")
                       / F.col("n0").cast("double")).alias("d")))
    extreme = reps.agg(
        F.sum((F.abs(F.col("d")) >= abs(obs)).cast("long"))
        .alias("k"),
        F.count(F.lit(1)).alias("b")).collect()[0]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(obs),
          float((1 + extreme["k"]) / (extreme["b"] + 1)),
          int(extreme["b"]))],
        "obs_diff double, p_value double, n_permutations long")
