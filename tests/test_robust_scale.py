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
