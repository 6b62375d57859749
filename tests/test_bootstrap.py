"""Counter-based Poisson bootstrap: weight distribution, CI coverage
behavior, and layout determinism."""
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from hiselspark.operators.bootstrap import (_CDF, _SCALE,
                                            poisson_bootstrap_mean,
                                            _poisson_weight)


def test_cdf_thresholds_are_poisson1():
    c = 0.0
    term = np.exp(-1.0)
    for k in range(6):
        c += term
        assert _CDF[k] == int(c * _SCALE)
        term /= (k + 1)
    assert _CDF[-1] == _SCALE


def test_weights_distribution_and_mean(spark):
    # weights across many (id, rep) draws approximate Poisson(1)
    df = spark.createDataFrame(pd.DataFrame({"id": range(20000)}))
    u = F.pmod(F.xxhash64("id", F.lit(0), F.lit(7)), F.lit(_SCALE))
    w = (df.select(_poisson_weight(u).alias("w"))
           .groupBy("w").count().toPandas().set_index("w")["count"])
    n = w.sum()
    p0, p1 = w.get(0, 0) / n, w.get(1, 0) / n
    assert p0 == pytest.approx(np.exp(-1), abs=0.01)
    assert p1 == pytest.approx(np.exp(-1), abs=0.01)
    mean_w = sum(k * v for k, v in w.items()) / n
    assert mean_w == pytest.approx(1.0, abs=0.02)


def test_bootstrap_ci_brackets_and_scales(spark):
    rng = np.random.default_rng(5)
    x = rng.integers(0, 1000, 4000)
    pdf = pd.DataFrame({"id": range(len(x)), "v": x})
    df = spark.createDataFrame(pdf)
    row = poisson_bootstrap_mean(df, "v", "id", n_replicates=200,
                                 seed=7).collect()[0]
    assert row["n_replicates"] == 200
    assert row["lo"] < row["point"] < row["hi"]
    # CI width ~ 2*1.96*sigma/sqrt(n): right order of magnitude
    se = x.std() / np.sqrt(len(x))
    width = row["hi"] - row["lo"]
    assert 0.4 * 3.92 * se < width < 2.5 * 3.92 * se
    # deterministic across layouts (the pinnable property)
    row2 = poisson_bootstrap_mean(df.repartition(13), "v", "id",
                                  n_replicates=200, seed=7).collect()[0]
    assert (row2["lo"], row2["hi"]) == (row["lo"], row["hi"])


def test_permutation_test_detects_real_and_null_effects(spark):
    from hiselspark.operators.bootstrap import (
        permutation_test_diff_means)
    rng = np.random.default_rng(3)
    n = 3000
    grp = rng.integers(0, 2, n)
    # strong effect: +50 shift for group 1
    x_eff = rng.integers(0, 100, n) + grp * 50
    eff = permutation_test_diff_means(
        spark.createDataFrame(pd.DataFrame(
            {"id": range(n), "v": x_eff, "g": grp})),
        "v", "g", "id", n_permutations=200, seed=11).collect()[0]
    assert eff["obs_diff"] == pytest.approx(50, abs=5)
    assert eff["p_value"] <= 1 / 201 + 1e-12  # nothing as extreme
    # null: no effect -> p should NOT be small
    x_null = rng.integers(0, 100, n)
    null = permutation_test_diff_means(
        spark.createDataFrame(pd.DataFrame(
            {"id": range(n), "v": x_null, "g": grp})),
        "v", "g", "id", n_permutations=200, seed=11).collect()[0]
    assert null["p_value"] > 0.05
    # determinism across layouts
    again = permutation_test_diff_means(
        spark.createDataFrame(pd.DataFrame(
            {"id": range(n), "v": x_null, "g": grp})).repartition(9),
        "v", "g", "id", n_permutations=200, seed=11).collect()[0]
    assert again["p_value"] == null["p_value"]
