"""Brute-force NumPy checks for the round-4c operator batch:
iv_wald, e_value, loo_encode, theils_u — each verified against a
direct definition-level computation on small synthetic data (never
against the implementation's own algebra)."""
import math

import numpy as np
import pytest


def _rng(seed):
    return np.random.default_rng(seed)


def test_iv_wald_brute(spark):
    from hiselspark.operators.causal import iv_wald
    rng = _rng(3)
    n = 500
    z = rng.integers(0, 2, n)
    # imperfect compliance: encouragement shifts the dose up
    x = rng.integers(0, 5, n) + z * rng.integers(1, 4, n)
    y = 7 * x + rng.integers(-10, 10, n)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(z, x, y)],
        ["z", "x", "y"])
    row = iv_wald(df, "z", "x", "y").collect()[0]
    itt = y[z == 1].mean() - y[z == 0].mean()
    fs = x[z == 1].mean() - x[z == 0].mean()
    assert row["n0"] == int((z == 0).sum())
    assert row["n1"] == int((z == 1).sum())
    assert row["sx1"] == int(x[z == 1].sum())
    assert row["sy0"] == int(y[z == 0].sum())
    assert row["itt_y"] == pytest.approx(itt, rel=1e-12)
    assert row["first_stage"] == pytest.approx(fs, rel=1e-12)
    assert row["late"] == pytest.approx(itt / fs, rel=1e-12)
    # the planted dose->outcome slope of 7 is recovered to noise
    assert 4.0 < row["late"] < 10.0


def test_iv_wald_degenerate_arms(spark):
    from hiselspark.operators.causal import iv_wald
    df = spark.createDataFrame(
        [(1, 3, 9), (1, 4, 12), (1, 5, 15)], ["z", "x", "y"])
    row = iv_wald(df, "z", "x", "y").collect()[0]
    assert row["n0"] == 0 and row["late"] is None
    # zero first stage -> NULL LATE
    df2 = spark.createDataFrame(
        [(0, 3, 1), (1, 3, 2), (0, 3, 3), (1, 3, 4)],
        ["z", "x", "y"])
    row2 = iv_wald(df2, "z", "x", "y").collect()[0]
    assert row2["first_stage"] == 0.0 and row2["late"] is None


def test_e_value_brute(spark):
    from hiselspark.operators.causal import e_value
    rng = _rng(5)
    n = 800
    t = rng.integers(0, 2, n)
    # planted association: treated outcome rate ~0.6 vs ~0.25
    y = (rng.random(n) < np.where(t == 1, 0.6, 0.25)).astype(int)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(t, y)], ["t", "y"])
    row = e_value(df, "t", "y").collect()[0]
    p1 = y[t == 1].mean()
    p0 = y[t == 0].mean()
    rr = p1 / p0
    rr_star = max(rr, 1.0 / rr)
    ev = rr_star + math.sqrt(rr_star * (rr_star - 1.0))
    assert row["n"] == n
    assert row["n11"] == int(y[t == 1].sum())
    assert row["n01"] == int(y[t == 0].sum())
    assert row["rr"] == pytest.approx(rr, rel=1e-12)
    assert row["evalue"] == pytest.approx(ev, rel=1e-12)
    assert row["evalue"] >= row["rr"]  # E-value dominates RR > 1


def test_e_value_protective_uses_reciprocal(spark):
    from hiselspark.operators.causal import e_value
    # protective treatment (RR < 1): E-value uses 1/RR
    rows = ([(1, 1)] * 10 + [(1, 0)] * 90
            + [(0, 1)] * 40 + [(0, 0)] * 60)
    df = spark.createDataFrame(rows, ["t", "y"])
    row = e_value(df, "t", "y").collect()[0]
    rr = (10 / 100) / (40 / 100)
    rr_star = 1.0 / rr
    assert row["rr"] == pytest.approx(rr, rel=1e-12)
    assert row["evalue"] == pytest.approx(
        rr_star + math.sqrt(rr_star * (rr_star - 1.0)), rel=1e-12)


def test_loo_encode_brute(spark):
    from hiselspark.operators.encoding import loo_encode
    rng = _rng(9)
    n = 300
    cat = rng.integers(0, 7, n)
    y = rng.integers(-20, 100, n)
    rows = [(i, f"c{c}", int(v) if i % 11 else None)
            for i, (c, v) in enumerate(zip(cat, y))]
    rows.append((n, "solo", 42))  # singleton category
    df = spark.createDataFrame(rows, ["id", "cat", "y"])
    out = {r["id"]: r for r in
           loo_encode(df, "id", "cat", "y").collect()}
    assert len(out) == n + 1  # every row kept
    sums, cnts = {}, {}
    for i, c, v in rows:
        if v is not None:
            sums[c] = sums.get(c, 0) + v
            cnts[c] = cnts.get(c, 0) + 1
    for i, c, v in rows:
        r = out[i]
        assert r["category"] == c and r["y"] == v
        if v is None:
            assert r["loo"] is None
        elif cnts[c] == 1:
            assert r["loo"] is None  # singleton -> NULL
        else:
            exp = (sums[c] - v) / (cnts[c] - 1)
            assert r["loo"] == pytest.approx(exp, rel=1e-12)


def test_theils_u_brute(spark):
    from hiselspark.operators.feature_rank import theils_u
    rng = _rng(13)
    n = 1000
    k = rng.integers(0, 60, n)
    x = k % 12
    y = k % 8
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], ["x", "y"])
    row = theils_u(df, "x", "y").collect()[0]

    def entropy(v):
        _, c = np.unique(v, return_counts=True)
        p = c / c.sum()
        return float(-(p * np.log(p)).sum())

    hx = entropy(x)
    mi = hx + entropy(y) - entropy(x * 100 + y)
    assert row["n"] == n
    assert row["h_x"] == pytest.approx(hx, rel=1e-10)
    assert row["mi"] == pytest.approx(mi, rel=1e-10)
    assert row["u"] == pytest.approx(mi / hx, rel=1e-10)
    # shared mod-4 structure => substantial but partial association
    assert 0.1 < row["u"] < 0.99


def test_theils_u_deterministic_and_constant(spark):
    from hiselspark.operators.feature_rank import theils_u
    # X fully determined by Y -> U = 1
    rows = [(i % 3, i % 6) for i in range(120)]
    df = spark.createDataFrame(rows, ["x", "y"])
    row = theils_u(df, "x", "y").collect()[0]
    assert row["u"] == pytest.approx(1.0, abs=1e-12)
    # constant X -> H(X)=0 -> NULL U
    df2 = spark.createDataFrame([(1, i % 4) for i in range(40)],
                                ["x", "y"])
    row2 = theils_u(df2, "x", "y").collect()[0]
    assert row2["h_x"] == 0.0 and row2["u"] is None
