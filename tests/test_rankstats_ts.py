"""Rank statistics (Spearman / Kruskal-Wallis / Welch) and the new
time-series operators (ACF / Hampel / Holt) vs independent
brute-force references (scipy-free, pure Python/NumPy)."""
import datetime as dt
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


def _avg_ranks(vals):
    """Textbook average ranks (1-based, ties averaged)."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def test_spearman_matches_brute(spark):
    rng = np.random.default_rng(3)
    x = rng.integers(0, 50, 200).tolist()
    y = [(v * 3 + int(e)) % 40 for v, e in
         zip(x, rng.integers(0, 7, 200))]
    z = rng.integers(0, 5, 200).tolist()
    rows = [(i, int(a), int(b), int(c))
            for i, (a, b, c) in enumerate(zip(x, y, z))]
    df = spark.createDataFrame(rows, "id long, x long, y long, z long")
    from hiselspark.operators.rankstats import spearman_matrix
    out = {(r["col_x"], r["col_y"]): r["rho"]
           for r in spearman_matrix(df, "id", ["x", "y", "z"]).collect()}

    def brute(a, b):
        ra, rb = _avg_ranks(a), _avg_ranks(b)
        ra, rb = np.array(ra), np.array(rb)
        return float(np.corrcoef(ra, rb)[0, 1])

    assert out[("x", "y")] == pytest.approx(brute(x, y), abs=1e-9)
    assert out[("x", "z")] == pytest.approx(brute(x, z), abs=1e-9)
    assert out[("y", "z")] == pytest.approx(brute(y, z), abs=1e-9)


def test_spearman_perfect_monotone(spark):
    rows = [(i, i, 1000 - 2 * i) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, up long, down long")
    from hiselspark.operators.rankstats import spearman_matrix
    r = spearman_matrix(df, "id", ["up", "down"]).collect()[0]
    assert r["rho"] == pytest.approx(-1.0, abs=1e-12)


def test_kruskal_wallis_brute(spark):
    rng = np.random.default_rng(5)
    rows = []
    for g, shift in (("a", 0), ("b", 8), ("c", 3)):
        for v in rng.integers(0, 30, 60):
            rows.append((g, int(v) + shift))
    df = spark.createDataFrame(rows, "g string, v long")
    from hiselspark.operators.rankstats import kruskal_wallis
    out = kruskal_wallis(df, "g", "v").collect()[0]

    vals = [v for _, v in rows]
    ranks = _avg_ranks(vals)
    groups = {}
    for (g, _), r in zip(rows, ranks):
        groups.setdefault(g, []).append(r)
    n = len(vals)
    h = (12.0 / (n * (n + 1))
         * sum(sum(rs) ** 2 / len(rs) for rs in groups.values())
         - 3 * (n + 1))
    from collections import Counter
    t3t = sum(t ** 3 - t for t in Counter(vals).values())
    c = 1 - t3t / (n ** 3 - n)
    assert out["n"] == n and out["n_groups"] == 3
    assert out["h"] == pytest.approx(h, rel=1e-9)
    assert out["tie_c"] == pytest.approx(c, rel=1e-12)
    assert out["h_c"] == pytest.approx(h / c, rel=1e-9)


def test_welch_brute(spark):
    rng = np.random.default_rng(11)
    rows = [("g", bool(i % 2 == 0), int(v) + (5 if i % 2 == 0 else 0))
            for i, v in enumerate(rng.integers(0, 100, 300))]
    df = spark.createDataFrame(rows, "g string, flag boolean, v long")
    from hiselspark.operators.rankstats import welch_ttest
    out = welch_ttest(df, "g", "flag", "v").collect()[0]
    a = np.array([v for _, f, v in rows if f], dtype=float)
    b = np.array([v for _, f, v in rows if not f], dtype=float)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df_w = se2 ** 2 / ((va / len(a)) ** 2 / (len(a) - 1)
                       + (vb / len(b)) ** 2 / (len(b) - 1))
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert out["t"] == pytest.approx(t, rel=1e-9)
    assert out["df"] == pytest.approx(df_w, rel=1e-9)


def _mk_series(spark, vals):
    rows = [("u", BASE + dt.timedelta(minutes=i), i, int(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "e string, ts timestamp, o long, v long")


def test_acf_brute(spark):
    rng = np.random.default_rng(7)
    vals = np.cumsum(rng.integers(-3, 4, 80)) + 50
    df = _mk_series(spark, vals.tolist())
    from hiselspark.operators.tsprofile import autocorrelation
    out = autocorrelation(df, "e", "ts", "o", "v").collect()[0]
    x = vals.astype(float)
    xm = x.mean()
    den = ((x - xm) ** 2).sum()
    for k in (1, 2, 3):
        rk = ((x[:-k] - xm) * (x[k:] - xm)).sum() / den
        assert out[f"r{k}"] == pytest.approx(rk, rel=1e-9, abs=1e-12)


def test_acf_short_and_constant(spark):
    from hiselspark.operators.tsprofile import autocorrelation
    out = autocorrelation(_mk_series(spark, [5, 5, 5, 5]),
                          "e", "ts", "o", "v").collect()[0]
    assert out["r1"] is None  # constant series: zero variance
    out2 = autocorrelation(_mk_series(spark, [1, 2]),
                           "e", "ts", "o", "v").collect()[0]
    assert out2["r2"] is None and out2["r3"] is None  # n <= k


def test_hampel_flags_spike(spark):
    vals = [100] * 10 + [500] + [100] * 10
    df = _mk_series(spark, vals)
    from hiselspark.operators.tsprofile import hampel_filter
    out = hampel_filter(df, "e", "ts", "o", "v").orderBy("order_id")
    flags = [r["is_outlier"] for r in out.collect()]
    assert flags[10] is True
    assert sum(flags) == 1  # only the spike; constant runs never flag


def test_hampel_brute_windows(spark):
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 1000, 60).tolist()
    df = _mk_series(spark, vals)
    from hiselspark.operators.tsprofile import hampel_filter
    rows = (hampel_filter(df, "e", "ts", "o", "v")
            .orderBy("order_id").collect())
    for i, r in enumerate(rows):
        w = vals[max(0, i - 3):i + 4]
        s = sorted(w)
        med2 = s[(len(s) - 1) // 2] + s[len(s) // 2]
        devs = sorted(abs(2 * x - med2) for x in w)
        mad2d = devs[(len(devs) - 1) // 2] + devs[len(devs) // 2]
        assert r["med2"] == med2 and r["mad2d"] == mad2d
        # expectation derived from the DEFINITION |x−med| > k·MAD with
        # med = med2/2, MAD = mad2d/4 (exact fractions), not from the
        # implementation's integer rearrangement
        from fractions import Fraction
        definition = (abs(Fraction(vals[i]) - Fraction(med2, 2))
                      > 3 * Fraction(mad2d, 4))
        assert r["is_outlier"] == definition
        assert r["is_outlier"] == (2 * abs(2 * vals[i] - med2)
                                   > 3 * mad2d)


def test_holt_brute(spark):
    rng = np.random.default_rng(17)
    vals = (np.arange(40) * 3 + rng.integers(-5, 6, 40)).tolist()
    df = _mk_series(spark, vals)
    from hiselspark.operators.tsprofile import holt_linear
    out = holt_linear(df, "e", "ts", "o", "v").collect()[0]
    l, b = float(vals[0]), 0.0
    for x in vals[1:]:
        nl = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (nl - l) + 0.5 * b
        l = nl
    assert out["level"] == pytest.approx(l, rel=1e-12)
    assert out["trend"] == pytest.approx(b, rel=1e-12)
    assert out["forecast_1"] == pytest.approx(l + b, rel=1e-12)
    # a clean linear ramp is tracked: forecast near the next point
    assert abs(out["forecast_1"] - (3 * 40)) < 15


def test_holt_single_point(spark):
    from hiselspark.operators.tsprofile import holt_linear
    out = holt_linear(_mk_series(spark, [42]),
                      "e", "ts", "o", "v").collect()[0]
    assert out["level"] == 42.0 and out["trend"] == 0.0


def test_link_prediction_brute(spark):
    # bipartite: entities 0..5 with attribute sets
    adj = {0: {10, 11, 12}, 1: {10, 11, 13}, 2: {12, 13},
           3: {14}, 4: {10, 14}, 5: {15}}
    rows = [(e, w) for e, ws in adj.items() for w in ws]
    df = spark.createDataFrame(rows, "src long, dst long")
    from hiselspark.operators.graph import link_prediction
    out = {(r["a"], r["b"]): r for r in
           link_prediction(df, symmetrize_input=False).collect()}
    degw = {}
    for ws in adj.values():
        for w in ws:
            degw[w] = degw.get(w, 0) + 1
    expect = {}
    ids = sorted(adj)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            cn = adj[a] & adj[b]
            if not cn:
                continue
            aa = sum(1.0 / math.log(degw[w]) for w in sorted(cn))
            jac = len(cn) / len(adj[a] | adj[b])
            expect[(a, b)] = (len(cn), jac, aa)
    assert set(out) == set(expect)
    for k, (cn, jac, aa) in expect.items():
        assert out[k]["cn"] == cn
        assert out[k]["jaccard"] == pytest.approx(jac, rel=1e-12)
        assert out[k]["adamic_adar"] == pytest.approx(aa, rel=1e-12)


def test_link_prediction_excludes_existing_edges(spark):
    # triangle 1-2-3 plus 4 attached to 1 and 2: pair (1,2) is an
    # existing edge -> excluded; (3,4) share neighbors {1,2} -> kept
    rows = [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4)]
    df = spark.createDataFrame(rows, "src long, dst long")
    from hiselspark.operators.graph import link_prediction
    out = {(r["a"], r["b"]): r for r in
           link_prediction(df, symmetrize_input=True,
                           exclude_existing=True).collect()}
    assert (1, 2) not in out
    assert (3, 4) in out and out[(3, 4)]["cn"] == 2


def test_link_prediction_center_degree_cap(spark):
    # hub attribute 99 shared by everyone is dropped by the cap
    rows = [(e, 99) for e in range(6)] + [(0, 1), (1, 1)]
    df = spark.createDataFrame(rows, "src long, dst long")
    from hiselspark.operators.graph import link_prediction
    out = link_prediction(df, symmetrize_input=False,
                          max_center_degree=3).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert pairs == {(0, 1)}  # only via attribute 1
