"""Sketch aggregates: HLL error bound, GK rank guarantee, determinism."""
import numpy as np
import pandas as pd

from hiselspark.operators.sketches import approx_distinct, approx_quantiles


def _data(spark):
    rng = np.random.default_rng(47)
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b"], 5000),
        "u": np.concatenate([rng.integers(0, 800, 5000),
                             rng.integers(0, 3000, 5000)]),
        "v": rng.normal(size=10000)})
    return spark.createDataFrame(pdf)


def test_hll_within_bound_and_deterministic(spark):
    df = _data(spark)
    out = (approx_distinct(df, "g", "u", rsd=0.05).toPandas()
           .set_index("g"))
    for g in ("a", "b"):
        exact, approx = out.loc[g, "n_exact"], out.loc[g, "n_approx"]
        assert abs(approx - exact) <= 0.15 * exact, (g, exact, approx)
    out2 = (approx_distinct(df.repartition(13), "g", "u", rsd=0.05)
            .toPandas().set_index("g"))
    assert (out["n_approx"].sort_index()
            == out2["n_approx"].sort_index()).all()


def test_gk_quantiles_within_rank_error(spark):
    df = _data(spark)
    out = (approx_quantiles(df, "g", "v", [0.25, 0.5, 0.75],
                            accuracy=1000).toPandas().set_index("g"))
    pdf = df.toPandas()
    for g, grp in pdf.groupby("g"):
        v = np.sort(grp["v"].values)
        n = len(v)
        for p, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            est = out.loc[g, col]
            rank = np.searchsorted(v, est, side="right")
            assert (p - 2e-3) * n <= rank <= (p + 2e-3) * n + 1, \
                (g, col, rank / n)
