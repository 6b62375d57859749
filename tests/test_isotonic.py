"""isotonic_fit (PAVA) vs the exact minimax characterization."""
from fractions import Fraction

import numpy as np
import pytest

from hiselspark.operators.isotonic import _pava, isotonic_fit


def _minimax(y):
    """mu_i = max_{k<=i} min_{j>=i} avg(y[k..j]) in exact Fractions —
    the textbook closed form of the L2 isotonic fit."""
    n = len(y)
    out = []
    for i in range(n):
        best = None
        for k in range(i + 1):
            inner = min(Fraction(sum(y[k:j + 1]), j + 1 - k)
                        for j in range(i, n))
            best = inner if best is None else max(best, inner)
        out.append(best)
    return out


@pytest.mark.parametrize("y", [
    [1, 2, 3, 4],                      # already monotone -> identity
    [4, 3, 2, 1],                      # fully reversed -> global mean
    [1, 3, 2, 2, 5, 0, 6],
    [0, 0, 1, 0, 1, 1, 0, 1],
    [5],
])
def test_pava_matches_minimax(y):
    got = _pava(np.array(y, dtype=np.int64))
    want = _minimax(y)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == pytest.approx(float(w), abs=1e-12)
    assert all(got[i] <= got[i + 1] + 1e-12
               for i in range(len(got) - 1))


def test_pava_random_monotone_and_optimal():
    rng = np.random.default_rng(7)
    y = rng.integers(0, 10, 30).tolist()
    got = _pava(np.array(y, dtype=np.int64))
    want = [float(w) for w in _minimax(y)]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_isotonic_fit_groups_and_order(spark):
    # group A: ties in x broken by o; group B independent
    rows = [("A", 1, 1, 5), ("A", 1, 2, 1), ("A", 2, 3, 3),
            ("A", 0, 4, 9), ("B", 7, 5, 2), ("B", 3, 6, 8)]
    df = spark.createDataFrame(rows, "g string, x int, o int, y int")
    out = {(r["group"], r["idx"]): r for r in
           isotonic_fit(df, "g", "x", "o", "y").collect()}
    # group A sequence by (x, o): y = [9, 5, 1, 3]
    want_a = _minimax([9, 5, 1, 3])
    for i, w in enumerate(want_a, start=1):
        assert out[("A", i)]["fitted"] == pytest.approx(float(w),
                                                        abs=1e-12)
    assert out[("A", 1)]["x"] == 0 and out[("A", 1)]["y"] == 9
    # group B sequence by x: y = [8, 2] -> pooled mean 5
    assert out[("B", 1)]["fitted"] == pytest.approx(5.0)
    assert out[("B", 2)]["fitted"] == pytest.approx(5.0)


def test_platt_fit_matches_float_newton_and_calibrates(spark):
    """platt_fit vs an unfloored float Newton replay (fixed-point
    flooring perturbs < 1e-8); recovers a positive slope-from-score
    relationship and is layout-deterministic."""
    import math
    import numpy as np
    from hiselspark.operators.isotonic import platt_fit
    rng = np.random.default_rng(7)
    s = rng.uniform(0, 1, 2000)
    y = (rng.uniform(0, 1, 2000) < 1 / (1 + np.exp(-(4 * s - 2)))
         ).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(s, y)], "s double, y int")
    got = platt_fit(df, "s", "y", iterations=3)

    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    tp, tn = (n_pos + 1.0) / (n_pos + 2.0), 1.0 / (n_neg + 2.0)
    a, b = 0.0, math.log((n_neg + 1.0) / (n_pos + 1.0))
    t = np.where(y == 1, tp, tn)
    for _ in range(3):
        p = 1.0 / (1.0 + np.exp(-(a * s + b)))
        w = p * (1 - p)
        g1, g0 = ((p - t) * s).sum(), (p - t).sum()
        h2, h1, h0 = (w * s * s).sum(), (w * s).sum(), w.sum()
        det = h2 * h0 - h1 * h1
        a -= (h0 * g1 - h1 * g0) / det
        b -= (h2 * g0 - h1 * g1) / det
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert got["a"] == pytest.approx(a, abs=1e-6)
    assert got["b"] == pytest.approx(b, abs=1e-6)
    # the sigmoid direction matches sign convention: P(y|s) rises in s
    assert got["a"] > 0
    # layout determinism is BIT-exact (integer sums)
    got2 = platt_fit(df.repartition(13), "s", "y", iterations=3)
    assert got2["a"] == got["a"] and got2["b"] == got["b"]
