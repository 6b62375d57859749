"""mann_whitney vs a brute-force average-rank oracle."""
from __future__ import annotations

import math

import numpy as np
import pytest


def _brute(xa, xb):
    allv = sorted(xa + xb)
    n = len(allv)
    # average rank of each value
    from collections import Counter
    cnt = Counter(allv)
    below = {}
    run = 0
    for v in sorted(cnt):
        below[v] = run
        run += cnt[v]
    def avg_rank(v):
        return below[v] + (cnt[v] + 1) / 2.0
    r1 = sum(avg_rank(v) for v in xa)
    n1, n2 = len(xa), len(xb)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    tc = sum(t ** 3 - t for t in cnt.values())
    var = (n1 * n2 / 12.0) * ((n + 1) - tc / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else None
    delta = 2.0 * u1 / (n1 * n2) - 1.0
    return n1, n2, u1, z, delta


def test_mann_whitney_matches_brute(spark):
    from hiselspark.operators.rankstats import mann_whitney
    rng = np.random.default_rng(3)
    xa = rng.integers(0, 40, 300).tolist()       # shifted sample
    xb = (rng.integers(0, 40, 260) + 6).tolist()
    rows = ([(1, v) for v in xa] + [(0, v) for v in xb])
    df = spark.createDataFrame(rows, "a long, v long")
    got = mann_whitney(df, "a", "v").collect()[0]
    n1, n2, u1, z, delta = _brute(xa, xb)
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["u"] == pytest.approx(u1, abs=1e-9)
    assert got["z"] == pytest.approx(round(z, 6), abs=1e-9)
    assert got["cliffs_delta"] == pytest.approx(round(delta, 6), abs=1e-9)
    # B is shifted up, so A's U is below its mean -> negative z,
    # negative delta, significant p
    assert got["z"] < 0 and got["cliffs_delta"] < 0
    assert got["p_value"] < 0.01


def test_mann_whitney_all_tied_gives_null(spark):
    from hiselspark.operators.rankstats import mann_whitney
    rows = [(1, 5)] * 10 + [(0, 5)] * 12
    df = spark.createDataFrame(rows, "a long, v long")
    got = mann_whitney(df, "a", "v").collect()[0]
    assert got["z"] is None and got["p_value"] is None
    # ties count half: U = n1*n2/2 exactly, delta = 0
    assert got["u"] == pytest.approx(10 * 12 / 2.0)
    assert got["cliffs_delta"] == pytest.approx(0.0)


def test_mann_whitney_identical_distributions_center(spark):
    from hiselspark.operators.rankstats import mann_whitney
    rng = np.random.default_rng(9)
    rows = [(int(rng.integers(0, 2)), int(v))
            for v in rng.integers(0, 1000, 2000)]
    df = spark.createDataFrame(rows, "a long, v long")
    got = mann_whitney(df, "a", "v").collect()[0]
    # same distribution in both arms: |z| small, p not significant
    assert abs(got["z"]) < 3.0
    assert got["p_value"] > 0.001
