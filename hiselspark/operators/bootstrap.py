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

from pyspark.sql import DataFrame, functions as F

# Poisson(1) CDF thresholds scaled to 2^20 (exact integers): weight k
# for u in [T[k-1], T[k]); the tail mass beyond 6 joins the k=6 bucket.
_SCALE = 1 << 20
_CDF = [385749, 771499, 964373, 1028665, 1044738, 1047952, _SCALE]


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
) -> DataFrame:
    """Percentile-bootstrap CI for the MEAN of an integer-quantized
    column: one row ``(point, lo, hi, n_replicates)`` where point is
    the plain mean and [lo, hi] the (α/2, 1−α/2) percentiles of the B
    Poisson-replicate means.  One scan of the data: per row, the B
    weights are a ``transform`` over ``sequence(0, B−1)``; the
    per-replicate (Σw·x, Σw) reduce map-side, so the shuffle carries B
    rows per task and the final table is B rows regardless of input
    size."""
    B = int(n_replicates)
    u = lambda b: F.pmod(  # noqa: E731
        F.xxhash64(F.col(id_col), b, F.lit(int(seed))), F.lit(_SCALE))
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
