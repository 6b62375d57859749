"""naive_bayes / cuped vs brute references."""
import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_naive_bayes_brute(spark):
    rng = np.random.default_rng(97)
    n = 600
    f1 = rng.integers(0, 4, n)
    f2 = rng.integers(0, 3, n)
    y = ((f1 + f2 + rng.integers(0, 2, n)) % 3).astype(int)
    rows = [(i, int(f1[i]), int(f2[i]), int(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "row_id long, f1 long, f2 long,"
                                     " y long")
    train = df.filter(F.col("row_id") % 2 == 0)
    score = df.filter(F.col("row_id") % 2 == 1)
    from hiselspark.operators.nbayes import naive_bayes
    out = {r["row_id"]: r for r in
           naive_bayes(train, score, ["f1", "f2"], "y").collect()}

    from collections import Counter
    tr = [r for r in rows if r[0] % 2 == 0]
    n_c = Counter(r[3] for r in tr)
    total = len(tr)
    cells = Counter((f, r[1 + i], r[3]) for r in tr
                    for i, f in enumerate(("f1", "f2")))
    vsize = {f: len({r[1 + i] for r in tr})
             for i, f in enumerate(("f1", "f2"))}

    def post(row, c):
        lp = math.log(n_c[c] / total)
        for i, f in enumerate(("f1", "f2")):
            cf = cells.get((f, row[1 + i], c), 0)
            lp += math.log((cf + 1) / (n_c[c] + vsize[f]))
        return lp

    correct = 0
    for row in rows:
        if row[0] % 2 == 0:
            continue
        scores = sorted(((post(row, c), -c) for c in n_c),
                        reverse=True)
        best_lp, neg_c = scores[0]
        got = out[row[0]]
        assert got["pred_class"] == -neg_c
        assert got["best_logpost"] == pytest.approx(best_lp, rel=1e-9)
        correct += int(got["pred_class"] == row[3])
    # the planted signal is learnable: well above the 1/3 base rate
    assert correct / len(out) > 0.38


def test_naive_bayes_unseen_value_falls_back_to_alpha_mass(spark):
    train = spark.createDataFrame(
        [(i, i % 2, i % 2) for i in range(20)],
        "row_id long, f1 long, y long")
    score = spark.createDataFrame([(100, 7)], "row_id long, f1 long")
    from hiselspark.operators.nbayes import naive_bayes
    r = naive_bayes(train, score, ["f1"], "y").collect()[0]
    # unseen value 7: both classes get the same alpha-mass likelihood,
    # priors tie at 10/20 -> smallest class wins
    assert r["pred_class"] == 0
    assert r["best_logpost"] == pytest.approx(
        math.log(0.5) + math.log(1 / (10 + 2)), rel=1e-12)


def test_cuped_brute_and_variance_reduction(spark):
    rng = np.random.default_rng(101)
    n = 800
    x = rng.integers(100, 1000, n)          # pre-period covariate
    arm = rng.integers(0, 2, n)
    y = x + rng.integers(-50, 51, n) + arm * 30   # correlated metric
    rows = [(("t" if arm[i] else "c"), int(y[i]), int(x[i]))
            for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, y long, x long")
    from hiselspark.operators.nbayes import cuped
    out = {r["grp"]: r for r in cuped(df, "grp", "y", "x").collect()}
    ya, xa = np.array([r[1] for r in rows], float), \
        np.array([r[2] for r in rows], float)
    theta = np.cov(xa, ya, ddof=1)[0, 1] / np.var(xa, ddof=1)
    # pooled-moment theta (n-weighted) equals the operator's form
    for g in ("t", "c"):
        m = np.array([r[0] == g for r in rows])
        adj = ya[m] - out[g]["theta"] * (xa[m] - xa.mean())
        assert out[g]["mean_y_adj"] == pytest.approx(adj.mean(),
                                                     rel=1e-9)
        vr = 1 - np.var(ya[m] - out[g]["theta"] * xa[m], ddof=1) \
            / np.var(ya[m], ddof=1)
        assert out[g]["var_reduction"] == pytest.approx(vr, rel=1e-6)
        # strong covariate -> big reduction
        assert out[g]["var_reduction"] > 0.9
    assert out["t"]["theta"] == pytest.approx(theta, rel=1e-3)
    # the treatment effect survives adjustment
    assert out["t"]["mean_y_adj"] - out["c"]["mean_y_adj"] == \
        pytest.approx(30, abs=8)
