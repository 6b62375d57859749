"""robust_scale vs a brute NumPy median/MAD oracle."""
from __future__ import annotations

import numpy as np
import pytest


def test_robust_scale_matches_numpy(spark):
    from hiselspark.operators.encoding import robust_scale
    rng = np.random.default_rng(23)
    n = 501                                    # odd AND even paths:
    a = rng.integers(0, 1000, n)               # via the two features
    b = rng.integers(-50, 50, n)
    rows = [(i, int(a[i]), int(b[i])) for i in range(n)]
    # drop one value of b -> even count for that feature
    rows[7] = (7, int(a[7]), None)
    df = spark.createDataFrame(rows, "id long, fa long, fb long")
    got = {(r["id"], r["feature"]): r for r in
           robust_scale(df, "id", ["fa", "fb"]).collect()}
    for name, vals, dropped in (("fa", a, ()), ("fb", b, (7,))):
        keep = np.array([v for i, v in enumerate(vals)
                         if i not in dropped])
        med = np.median(keep)
        mad = np.median(np.abs(keep - med))
        for i, v in enumerate(vals):
            r = got[(i, name)]
            if i in dropped:
                assert r["v"] is None and r["rz"] is None
                continue
            assert r["m2"] == pytest.approx(2 * med)
            assert r["mad2d"] == pytest.approx(4 * mad)
            exp = (v - med) / (1.4826 * mad)
            assert r["rz"] == pytest.approx(exp, rel=1e-12)


def test_robust_scale_constant_feature_null(spark):
    from hiselspark.operators.encoding import robust_scale
    df = spark.createDataFrame(
        [(i, 5, i) for i in range(10)], "id long, c long, x long")
    got = [r for r in robust_scale(df, "id", ["c"]).collect()]
    assert all(r["mad2d"] == 0 and r["rz"] is None for r in got)


def test_quantile_normalize_matches_brute(spark):
    from hiselspark.operators.encoding import quantile_normalize
    rng = np.random.default_rng(41)
    n = 300
    a = rng.integers(0, 10000, n)
    b = rng.integers(0, 60, n)          # heavy ties
    c = rng.integers(-500, 500, n)
    rows = [(i, int(a[i]), int(b[i]), int(c[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, fa long, fb long, fc long")
    got = {(r["id"], r["feature"]): r for r in
           quantile_normalize(df, "id", ["fa", "fb", "fc"]).collect()}
    # brute: rank within feature by (value, id); per-position mean
    feats = {"fa": a, "fb": b, "fc": c}
    order = {name: sorted(range(n), key=lambda i: (int(v[i]), i))
             for name, v in feats.items()}
    pos_mean = [
        (int(a[order["fa"][p]]) + int(b[order["fb"][p]])
         + int(c[order["fc"][p]])) / 3.0
        for p in range(n)
    ]
    for name, v in feats.items():
        inv = {i: p for p, i in enumerate(order[name])}
        for i in range(n):
            r = got[(i, name)]
            assert r["pos"] == inv[i] + 1
            assert r["qn"] == pytest.approx(
                round(pos_mean[inv[i]], 6), abs=1e-9)
    # post-normalization the three features share one marginal
    for p in range(0, n, 37):
        vals = {round(pos_mean[p], 6)}
        for name in feats:
            vals.add(got[(order[name][p], name)]["qn"])
        assert len(vals) == 1


def test_quantile_normalize_validates(spark):
    from hiselspark.operators.encoding import quantile_normalize
    df = spark.createDataFrame([(0, 1, None), (1, 2, 3)],
                               "id long, x long, y long")
    with pytest.raises(ValueError):
        quantile_normalize(df, "id", ["x", "y"])
    with pytest.raises(ValueError):
        quantile_normalize(df, "id", ["x"])
