"""split_conformal vs brute-force order statistics and the coverage
guarantee."""
import math

import pytest

from pyspark.sql import functions as F

from hiselspark.operators.conformal import split_conformal


def test_conformal_matches_brute_and_covers(spark):
    # deterministic "residual-rich" values per group
    rows = []
    for g, seed in (("a", 3), ("b", 11)):
        for i in range(200):
            rows.append((g, i, (i * seed + 7) % 97))
    df = spark.createDataFrame(rows, "g string, i long, v long")
    out = {r["g"]: r for r in split_conformal(
        df, "g", F.col("i") % 2 == 0, "v").collect()}
    for g, seed in (("a", 3), ("b", 11)):
        vs = [(i, (i * seed + 7) % 97) for i in range(200)]
        cal = [v for i, v in vs if i % 2 == 0]
        tst = [v for i, v in vs if i % 2 == 1]
        n, s = len(cal), sum(cal)
        k = math.ceil((n + 1) * 0.9)
        res = sorted(abs(v * n - s) for v in cal)
        q = res[k - 1]
        covered = sum(1 for v in tst if abs(v * n - s) <= q)
        r = out[g]
        assert r["n_cal"] == n and r["n_test"] == len(tst)
        assert r["k"] == k
        assert r["q_scaled"] == q
        assert r["covered"] == covered
        assert r["coverage"] == pytest.approx(covered / len(tst))
        # the conformal guarantee: coverage >= 1 - alpha - slack on
        # exchangeable splits (deterministic here, generous slack)
        assert r["coverage"] >= 0.8


def test_conformal_infinite_interval_and_validation(spark):
    # 3 calibration points at alpha=0.1 -> k = ceil(4*0.9) = 4 > 3:
    # infinite interval, everything covered
    rows = [("g", 0, 5), ("g", 2, 9), ("g", 4, 1),
            ("g", 1, 1000), ("g", 3, -50)]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    r = split_conformal(df, "g", F.col("i") % 2 == 0, "v").collect()[0]
    assert r["k"] == 4 and r["n_cal"] == 3
    assert r["q_scaled"] is None and r["q"] is None
    assert r["covered"] == 2 and r["coverage"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        split_conformal(df, "g", F.col("i") % 2 == 0, "v",
                        alpha_num=3, alpha_den=2)
