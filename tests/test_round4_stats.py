"""Property / brute-force tests for the round-4 late additions:
Mantel-Haenszel, AIPW, Fisher score, symmetric uncertainty,
Goodman-Kruskal, Kendall's W, Cramer-von-Mises, ERR/RBP, pinball
loss, variance ratio, Cook's distance, Krippendorff's alpha, Hill
diversity, Hurst R/S.  Each operator is checked against an
independent NumPy/pure-Python reimplementation on small seeded data
(the gate checks cross-engine agreement; these check the MATH)."""
import math

import numpy as np
import pytest


def _rows(spark, cols, data):
    return spark.createDataFrame([tuple(r) for r in data], cols)


def test_mantel_haenszel_brute(spark):
    from hiselspark.operators.causal import mantel_haenszel
    rng = np.random.RandomState(7)
    s = rng.randint(0, 4, 400)
    t = rng.randint(0, 2, 400)
    y = ((s + t + rng.randint(0, 3, 400)) % 2).astype(int)
    df = _rows(spark, ["s", "t", "y"],
               np.stack([s, t, y], 1).tolist())
    row = mantel_haenszel(df, "s", "t", "y").collect()[0]
    r_sum = s_sum = e_sum = v_sum = 0.0
    sum_a = 0
    for st in sorted(set(s.tolist())):
        m = s == st
        a = int(((t == 1) & (y == 1) & m).sum())
        b = int(((t == 1) & (y == 0) & m).sum())
        c = int(((t == 0) & (y == 1) & m).sum())
        d = int(((t == 0) & (y == 0) & m).sum())
        n = a + b + c + d
        if n < 2:
            continue
        sum_a += a
        r_sum += a * d / n
        s_sum += b * c / n
        e_sum += (a + b) * (a + c) / n
        v_sum += ((a + b) * (c + d)) * ((a + c) * (b + d)) \
            / (n * n * (n - 1))
    assert row["sum_a"] == sum_a
    assert row["or_mh"] == pytest.approx(r_sum / s_sum, rel=1e-12)
    dev = sum_a - e_sum
    assert row["chi2_mh"] == pytest.approx(dev * dev / v_sum,
                                           rel=1e-12)


def test_aipw_brute(spark):
    from hiselspark.operators.causal import aipw_estimate
    rng = np.random.RandomState(11)
    s = rng.randint(0, 5, 500)
    t = rng.randint(0, 2, 500)
    y = (10 * t + s + rng.randint(0, 5, 500)).astype(int)
    df = _rows(spark, ["s", "t", "y"],
               np.stack([s, t, y], 1).tolist())
    row = aipw_estimate(df, "s", "t", "y").collect()[0]
    # keep strata with both arms (all, with this seed)
    ok = np.ones(len(s), bool)
    mu1 = y[ok & (t == 1)].mean()
    mu0 = y[ok & (t == 0)].mean()
    terms = []
    for st in np.unique(s):
        m = ok & (s == st)
        e = (t[m] == 1).mean()
        ti, yi = t[m], y[m]
        terms.append(np.sum(
            mu1 - mu0 + ti * (yi - mu1) / e
            - (1 - ti) * (yi - mu0) / (1 - e)))
    ate = sum(terms) / ok.sum()
    assert row["ate_aipw"] == pytest.approx(ate, rel=1e-9)
    assert row["n_dropped_rows"] == 0


def test_fisher_score_brute(spark):
    from hiselspark.operators.feature_rank import fisher_score
    rng = np.random.RandomState(3)
    y = rng.randint(0, 3, 300)
    f1 = (5 * y + rng.randint(0, 3, 300)).astype(int)   # separable
    f2 = rng.randint(0, 50, 300)                        # noise
    df = _rows(spark, ["f1", "f2", "y"],
               np.stack([f1, f2, y], 1).tolist())
    out = {r["feature"]: r["score"]
           for r in fisher_score(df, ["f1", "f2"], "y").collect()}

    def brute(v):
        mu = v.mean()
        btw = sum((v[y == c]).size * (v[y == c].mean() - mu) ** 2
                  for c in np.unique(y))
        wth = sum(((v[y == c] - v[y == c].mean()) ** 2).sum()
                  for c in np.unique(y))
        return btw / wth

    assert out["f1"] == pytest.approx(brute(f1.astype(float)),
                                      rel=1e-9)
    assert out["f2"] == pytest.approx(brute(f2.astype(float)),
                                      rel=1e-9)
    assert out["f1"] > 10 * out["f2"]   # separable >> noise


def test_symmetric_uncertainty_bounds_and_identity(spark):
    from hiselspark.operators.feature_rank import symmetric_uncertainty
    rng = np.random.RandomState(5)
    x = rng.randint(0, 6, 400)
    df = _rows(spark, ["x", "y"], np.stack([x, x], 1).tolist())
    row = symmetric_uncertainty(df, "x", "y").collect()[0]
    # SU(X, X) = 1 exactly: MI = H(X) = H(Y)
    assert row["su"] == pytest.approx(1.0, abs=1e-12)
    y = rng.randint(0, 6, 400)           # independent draw
    df2 = _rows(spark, ["x", "y"], np.stack([x, y], 1).tolist())
    row2 = symmetric_uncertainty(df2, "x", "y").collect()[0]
    assert 0.0 <= row2["su"] < 0.2


def test_goodman_kruskal_brute(spark):
    from hiselspark.operators.rankstats import goodman_kruskal
    rng = np.random.RandomState(13)
    x = rng.randint(0, 6, 250)
    y = ((x + rng.randint(0, 4, 250)) % 8).astype(int)
    df = _rows(spark, ["x", "y"], np.stack([x, y], 1).tolist())
    row = goodman_kruskal(df, "x", "y").collect()[0]
    conc = disc = 0
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            dx = x[i] - x[j]
            dy = y[i] - y[j]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    assert row["concordant"] == conc and row["discordant"] == disc
    assert row["gamma"] == pytest.approx((conc - disc) / (conc + disc))
    # lambda(Y|X) brute
    n = len(x)
    sum_mx = sum(max(np.bincount(y[x == v])) for v in np.unique(x))
    mode_y = max(np.bincount(y))
    assert row["lambda_y_x"] == pytest.approx(
        (sum_mx - mode_y) / (n - mode_y))


def test_kendall_w_identity(spark):
    from hiselspark.operators.rankstats import friedman_test, kendall_w
    rng = np.random.RandomState(17)
    rows = [(int(s), int(t), int(rng.randint(0, 100)))
            for s in range(40) for t in range(4)]
    df = _rows(spark, ["s", "t", "v"], rows)
    q = friedman_test(df, "s", "t", "v").collect()[0]
    w = kendall_w(df, "s", "t", "v").collect()[0]
    assert w["w"] == pytest.approx(
        q["q_stat"] / (q["n_subjects"] * (q["k"] - 1)), rel=1e-12)
    assert 0.0 <= w["w"] <= 1.0


def test_cramer_von_mises_brute(spark):
    from hiselspark.operators.drift import cramer_von_mises
    rng = np.random.RandomState(19)
    a = rng.randint(0, 40, 150)
    b = rng.randint(5, 45, 120)
    rows = [("a", int(v)) for v in a] + [("b", int(v)) for v in b]
    df = _rows(spark, ["g", "v"], rows)
    row = cramer_von_mises(df, "g", "v", "a", "b").collect()[0]
    n, m = len(a), len(b)
    pooled = np.concatenate([a, b])
    fn = np.array([(a <= z).mean() for z in pooled])
    gm = np.array([(b <= z).mean() for z in pooled])
    t = n * m / (n + m) ** 2 * ((fn - gm) ** 2).sum()
    assert row["t_stat"] == pytest.approx(t, rel=1e-9)
    assert row["t_null_mean"] == pytest.approx(
        1 / 6 + 1 / (6 * (n + m)))


def test_err_rbp_brute(spark):
    from hiselspark.operators.rank_eval import err_rbp
    rng = np.random.RandomState(23)
    rows = []
    for q in range(5):
        for d in range(15):
            rows.append((q, q * 100 + d, int(rng.randint(0, 1000)),
                         int(rng.randint(0, 4))))
    df = _rows(spark, ["q", "doc", "score", "rel"], rows)
    out = {r["query"]: r
           for r in err_rbp(df, "q", "doc", "score", "rel",
                            max_grade=3, k=10).collect()}
    for q in range(5):
        cand = sorted([r for r in rows if r[0] == q],
                      key=lambda r: (-r[2], r[1]))[:10]
        err = 0.0
        p_cont = 1.0
        rbp = 0.0
        for i, (_, _, _, rel) in enumerate(cand, 1):
            r_i = (2 ** rel - 1) / 2 ** 3
            err += p_cont * r_i / i
            p_cont *= (1 - r_i)
            rbp += 0.2 * 0.8 ** (i - 1) * (1 if rel > 0 else 0)
        assert out[q]["err"] == pytest.approx(err, rel=1e-12)
        assert out[q]["rbp"] == pytest.approx(rbp, rel=1e-12)


def test_pinball_loss_brute(spark):
    from pyspark.sql import functions as F
    from hiselspark.operators.evaluate import pinball_loss
    rng = np.random.RandomState(29)
    rows = [(int(e), int(v), bool(tr))
            for e in range(3)
            for v, tr in zip(rng.randint(0, 200, 80),
                             rng.rand(80) < 0.5)]
    df = _rows(spark, ["e", "v", "tr"], rows)
    out = {r["entity"]: r
           for r in pinball_loss(df, "e", "v", F.col("tr"),
                                 9, 10).collect()}
    for e in range(3):
        train = sorted(v for ee, v, tr in rows if ee == e and tr)
        ev = [v for ee, v, tr in rows if ee == e and not tr]
        idx = -(-9 * len(train) // 10)          # ceil
        pred = train[idx - 1]
        loss = sum(9 * (v - pred) if v >= pred else (pred - v)
                   for v in ev)
        assert out[e]["pred"] == pred
        assert out[e]["loss_num"] == loss
        assert out[e]["mean_loss"] == pytest.approx(
            loss / (10 * len(ev)))


def test_variance_ratio_random_walk(spark):
    from hiselspark.operators.tsprofile import variance_ratio
    rng = np.random.RandomState(31)
    # pure random walk: VR(q) should be near 1
    steps = rng.randint(-50, 51, 4000)
    walk = np.cumsum(steps)
    rows = [(1, i, 0, int(v)) for i, v in enumerate(walk)]
    df = _rows(spark, ["e", "ts", "o", "v"], rows)
    row = variance_ratio(df, "e", "ts", "o", "v", q=4).collect()[0]
    d1 = np.diff(walk, 1)
    dq = walk[4:] - walk[:-4]
    vr = dq.var(ddof=1) / (4 * d1.var(ddof=1))
    assert row["vr"] == pytest.approx(vr, rel=1e-9)
    assert 0.8 < row["vr"] < 1.2
    # positively autocorrelated increments (momentum): VR(q) >> 1 —
    # VR reads increment autocorrelation, NOT deterministic trend (a
    # linear trend + iid noise gives VR ≈ 1/4: the trend cancels in
    # the variances and dq noise equals d1 noise)
    mom = np.cumsum(np.cumsum(rng.randint(-9, 10, 4000)))
    df2 = _rows(spark, ["e", "ts", "o", "v"],
                [(1, i, 0, int(v)) for i, v in enumerate(mom)])
    row2 = variance_ratio(df2, "e", "ts", "o", "v", q=4).collect()[0]
    assert row2["vr"] > 2.0
    # and anti-persistent increments (alternating): VR < 1
    alt = np.cumsum(np.tile([60, -60], 2000)
                    + rng.randint(-3, 4, 4000))
    df3 = _rows(spark, ["e", "ts", "o", "v"],
                [(1, i, 0, int(v)) for i, v in enumerate(alt)])
    row3 = variance_ratio(df3, "e", "ts", "o", "v", q=4).collect()[0]
    assert row3["vr"] < 0.5


def test_cooks_distance_brute(spark):
    from hiselspark.operators.regress import cooks_distance
    rng = np.random.RandomState(37)
    x = rng.randint(0, 100, 200)
    y = (3 * x + rng.randint(-30, 31, 200)).astype(int)
    y[0] = int(y[0] + 500)     # planted outlier
    rows = [(i, int(x[i]), int(y[i])) for i in range(200)]
    df = _rows(spark, ["id", "x", "y"], rows)
    out = {r["id"]: r
           for r in cooks_distance(df, "id", "x", "y").collect()}
    xf, yf = x.astype(float), y.astype(float)
    b, a = np.polyfit(xf, yf, 1)
    e = yf - a - b * xf
    sxx = ((xf - xf.mean()) ** 2).sum()
    h = 1 / len(xf) + (xf - xf.mean()) ** 2 / sxx
    s2 = (e ** 2).sum() / (len(xf) - 2)
    d = e ** 2 * h / (2 * s2 * (1 - h) ** 2)
    for i in (0, 1, 57):
        assert out[i]["cooks_d"] == pytest.approx(d[i], rel=1e-6)
    assert out[0]["influential"]           # the planted outlier fires
    assert sum(1 for r in out.values() if r["influential"]) < 20


def test_krippendorff_brute(spark):
    from collections import Counter
    from hiselspark.operators.evaluate import krippendorff_alpha
    # 2-observer table with missing cells (items 10/12 single-rated)
    a_vals = {1: 1, 2: 2, 3: 3, 4: 3, 5: 2, 6: 1, 7: 4, 8: 1, 9: 2}
    b_vals = {1: 1, 2: 2, 3: 3, 4: 3, 5: 2, 6: 2, 7: 4, 8: 1, 9: 2,
              10: 5, 12: 3}
    rows = [(i, "a", v) for i, v in a_vals.items()] + \
           [(i, "b", v) for i, v in b_vals.items()]
    df = _rows(spark, ["i", "r", "v"], rows)
    row = krippendorff_alpha(df, "i", "r", "v").collect()[0]
    # brute Krippendorff (coincidence-matrix formulation)
    items = {}
    for i, v in a_vals.items():
        items.setdefault(i, []).append(v)
    for i, v in b_vals.items():
        items.setdefault(i, []).append(v)
    pair = {i: vs for i, vs in items.items() if len(vs) >= 2}
    n_tot = sum(len(vs) for vs in pair.values())
    do = sum((len(vs) ** 2
              - sum(c * c for c in Counter(vs).values()))
             / (len(vs) - 1) for vs in pair.values()) / n_tot
    marg = Counter(v for vs in pair.values() for v in vs)
    de = sum(c * (n_tot - c) for c in marg.values()) \
        / (n_tot * (n_tot - 1))
    assert row["n_pairable"] == 9
    assert row["n_dropped"] == 2
    assert row["n_ratings"] == n_tot
    assert row["alpha"] == pytest.approx(1 - do / de, rel=1e-12)
    # and a perfect-agreement sanity rail: alpha = 1
    rows_p = [(i, r, i % 3) for i in range(10) for r in ("a", "b")]
    dfp = _rows(spark, ["i", "r", "v"], rows_p)
    assert krippendorff_alpha(dfp, "i", "r", "v") \
        .collect()[0]["alpha"] == pytest.approx(1.0)


def test_hill_diversity_ordering_and_uniform(spark):
    from hiselspark.operators.profile import hill_diversity
    rng = np.random.RandomState(41)
    rows = [("skew", int(v)) for v in rng.zipf(2.0, 400) % 20] + \
           [("unif", int(v)) for v in np.arange(400) % 8]
    df = _rows(spark, ["g", "v"], rows)
    out = {r["g"]: r for r in hill_diversity(df, "g", "v").collect()}
    for g in ("skew", "unif"):
        r = out[g]
        # ordering is exact math; equality cases (uniform) land a
        # last-ulp below the integer richness — allow float noise
        assert r["h0_richness"] + 1e-9 >= r["h1_shannon"]
        assert r["h1_shannon"] >= r["h2_simpson"] - 1e-9
    # uniform over 8 categories: all three Hill numbers equal 8
    u = out["unif"]
    assert u["h0_richness"] == 8
    assert u["h1_shannon"] == pytest.approx(8.0, rel=1e-12)
    assert u["h2_simpson"] == pytest.approx(8.0, rel=1e-12)


def test_hurst_brute_and_regimes(spark):
    from hiselspark.operators.tsprofile import hurst_rs
    rng = np.random.RandomState(43)
    # R/S runs on the INCREMENT series: iid increments → H ≈ 0.5
    walk = rng.randint(-9, 10, 512).astype(int)
    rows = [(1, i, 0, int(v)) for i, v in enumerate(walk)]
    df = _rows(spark, ["e", "ts", "o", "v"], rows)
    row = hurst_rs(df, "e", "ts", "o", "v",
                   sizes=(8, 16, 32, 64)).collect()[0]

    # brute replication
    def rs_mean(b):
        vals = []
        for blk in range(len(walk) // b):
            seg = walk[blk * b:(blk + 1) * b].astype(float)
            dev = np.cumsum(seg - seg.mean())
            r = dev.max() - dev.min()
            s = seg.std()
            if s > 0:
                vals.append(r / s / b ** 0)   # R/S per block
        return np.mean(vals)

    pts = [(math.log(b), math.log(rs_mean(b)))
           for b in (8, 16, 32, 64)]
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    slope = np.polyfit(xs, ys, 1)[0]
    assert row["hurst"] == pytest.approx(slope, rel=1e-6)
    assert 0.3 < row["hurst"] < 0.75       # iid increments ~0.5-ish
    # persistent increments (an integrated series fed as increments)
    # push H toward 1 — the long-memory regime
    mom = np.cumsum(rng.randint(-9, 10, 512)).astype(int)
    df2 = _rows(spark, ["e", "ts", "o", "v"],
                [(1, i, 0, int(v)) for i, v in enumerate(mom)])
    row2 = hurst_rs(df2, "e", "ts", "o", "v").collect()[0]
    assert row2["hurst"] > 0.85


def test_holt_winters_brute_and_seasonal(spark):
    from hiselspark.operators.tsprofile import holt_winters_additive
    rng = np.random.RandomState(47)
    vals = rng.randint(0, 500, 40)
    rows = [(1, i, 0, int(v)) for i, v in enumerate(vals)]
    df = _rows(spark, ["e", "ts", "o", "v"], rows)
    row = holt_winters_additive(df, "e", "ts", "o", "v",
                                period=4).collect()[0]
    # brute fold
    v = vals.astype(float)
    level = (v[0] + v[1] + v[2] + v[3]) / 4.0
    b = 0.0
    s = [v[0] - level, v[1] - level, v[2] - level, v[3] - level]
    for x in v[4:]:
        new_l = 0.5 * (x - s[0]) + 0.5 * (level + b)
        new_b = 0.5 * (new_l - level) + 0.5 * b
        new_s = 0.5 * (x - new_l) + 0.5 * s[0]
        level, b = new_l, new_b
        s = s[1:] + [new_s]
    assert row["level"] == pytest.approx(level, rel=1e-12)
    assert row["trend"] == pytest.approx(b, rel=1e-12)
    assert row["s_next"] == pytest.approx(s[0], rel=1e-12)
    # an exactly periodic series forecasts its next value
    per = [100, 300, 200, 400] * 12
    dfp = _rows(spark, ["e", "ts", "o", "v"],
                [(1, i, 0, v) for i, v in enumerate(per)])
    rp = holt_winters_additive(dfp, "e", "ts", "o", "v",
                               period=4).collect()[0]
    assert rp["forecast_1"] == pytest.approx(100.0, abs=1.0)


def test_sliced_w1_identical_and_shifted(spark):
    from pyspark.sql import functions as F
    from hiselspark.operators.drift import sliced_w1
    rng = np.random.RandomState(53)
    vecs = rng.randn(200, 64).astype(np.float32)
    # identical halves: duplicate every vector under even/odd ids
    rows = [(2 * i, v.tolist()) for i, v in enumerate(vecs)] + \
           [(2 * i + 1, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sliced_w1(df, "embedding", F.col("vec_id") % 2 == 0,
                    n_planes=4, dim=64, grid=8)
    assert all(r["w1"] == 0.0 for r in out.collect())
    # second half shifted along dimension 0 drifts on every plane
    # (a UNIFORM shift projects to 2·Σsigns — zero on a balanced
    # plane; a single-dimension shift moves every projection by ±5)
    shifted = vecs.copy()
    shifted[:, 0] += 5.0
    rows2 = [(2 * i, v.tolist()) for i, v in enumerate(vecs)] + \
            [(2 * i + 1, v.tolist())
             for i, v in enumerate(shifted)]
    df2 = spark.createDataFrame(rows2, ["vec_id", "embedding"])
    out2 = sliced_w1(df2, "embedding", F.col("vec_id") % 2 == 0,
                     n_planes=4, dim=64, grid=8)
    assert all(r["w1"] > 0.0 for r in out2.collect())


def test_histogram_match_single_image_identity(spark):
    from pyspark.sql import functions as F
    from hiselspark.functions.image import (histogram_match,
                                            with_hist_cells)
    rng = np.random.RandomState(59)
    payload = rng.randint(0, 256, 192, dtype=np.uint8).tobytes()
    df = spark.createDataFrame([(1, payload)], ["okey", "bytes"])
    cells = with_hist_cells(df, "okey")
    row = histogram_match(cells).collect()[0]
    # single-image corpus: pooled == own histogram, LUT(v) = v
    arr = np.frombuffer(payload, dtype=np.uint8)
    levels = np.unique(arr)
    assert row["n_levels"] == len(levels)
    assert row["n_matched_levels"] == len(levels)
    lv = levels.astype(np.int64)
    assert row["lut_checksum"] == int(((lv + 1) * lv).sum())
    assert row["matched_sum"] == int(arr.astype(np.int64).sum())


def test_textrank_integer_pagerank_brute(spark):
    from hiselspark.operators.graph import pagerank
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r["r"]
           for r in pagerank(df, iterations=5).collect()}
    # brute integer replication
    sym = set(edges) | {(b, a) for a, b in edges}
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    r = {n: 1_000_000_000 for n in deg}
    for _ in range(5):
        contrib = {n: r[n] // deg[n] for n in r}
        inc = {}
        for a, b in sym:
            inc[b] = inc.get(b, 0) + contrib[a]
        r = {n: 150_000_000 + (17 * inc[n]) // 20 for n in inc}
    assert out == r
    # hub 'a' (degree 3) outranks the leaf 'd'
    assert out["a"] > out["d"]


def test_u_attribution_rules_and_conservation(spark):
    from pyspark.sql import functions as F
    from hiselspark.operators.attribution import u_shaped_attribution
    # crafted timeline: user 1 has 1 touch, user 2 has 2, user 3 has 5
    rows = []
    order = 0

    def ev(u, sec, typ):
        nonlocal order
        order += 1
        rows.append((u, f"2024-01-01 00:00:{sec:02d}", order, typ))

    ev(1, 1, "click"); ev(1, 10, "purchase")
    ev(2, 1, "click"); ev(2, 2, "view"); ev(2, 10, "purchase")
    for s in range(1, 6):
        ev(3, s, "click")
    ev(3, 10, "purchase")
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id",
                                      "event_type"])
    out = u_shaped_attribution(
        df, "user_id", "ts", "event_id",
        F.col("event_type").isin(["click", "view"]),
        F.col("event_type") == "purchase").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["entity"], []).append(r)
    # single touch: 1000; two touches: 500/500
    assert [r["credit_pm"] for r in by_user[1]] == [1000]
    assert sorted(r["credit_pm"] for r in by_user[2]) == [500, 500]
    # five touches: 400 / 67 / 67 / 66 / 400 (200 DIV 3 = 66, rem 2
    # to the earliest two middles)
    u3 = sorted(by_user[3], key=lambda r: r["pos"])
    assert [r["credit_pm"] for r in u3] == [400, 67, 67, 66, 400]
    # conservation: every conversion's credits sum to exactly 1000
    for rs in by_user.values():
        assert sum(r["credit_pm"] for r in rs) == 1000


def test_lorenz_monotone_and_brute(spark):
    from hiselspark.operators.profile import lorenz_curve
    rng = np.random.RandomState(61)
    vals = rng.zipf(1.7, 500).astype(int) % 10000
    rows = [(i, int(v)) for i, v in enumerate(vals)]
    df = _rows(spark, ["id", "v"], rows)
    out = sorted(lorenz_curve(df, "id", "v").collect(),
                 key=lambda r: r["bucket"])
    assert len(out) == 10
    assert out[-1]["share_pop"] == pytest.approx(1.0)
    assert out[-1]["share_value"] == pytest.approx(1.0)
    # Lorenz curve lies below the diagonal and is monotone
    prev = 0.0
    for r in out:
        assert r["share_value"] <= r["share_pop"] + 1e-12
        assert r["share_value"] >= prev
        prev = r["share_value"]
    # brute cumulative check
    s = np.sort(vals)
    cuts = [len(s) * (k + 1) // 10 for k in range(10)]
    # ntile: first (n % 10) buckets get the extra row
    n = len(s)
    base, rem = divmod(n, 10)
    sizes = [base + (1 if k < rem else 0) for k in range(10)]
    edges = np.cumsum(sizes)
    for k, r in enumerate(out):
        assert r["cum_n"] == edges[k]
        assert r["cum_v"] == int(s[:edges[k]].sum())


def test_cusumsq_brute_and_planted_shift(spark):
    from hiselspark.operators.windows import cusumsq
    rng = np.random.RandomState(67)
    # variance doubles at index 300 of 400
    v = np.concatenate([rng.randint(-10, 11, 300),
                        rng.randint(-100, 101, 100)]).astype(int)
    rows = [(1, f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}", i,
             int(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, ["e", "ts", "o", "v"])
    row = cusumsq(df, "e", "ts", "o", "v").collect()[0]
    sq = (v.astype(np.int64) ** 2)
    cum = np.cumsum(sq)
    tot = int(cum[-1])
    n = len(v)
    d = np.abs(n * cum - (np.arange(1, n + 1)) * tot)
    k = int(np.argmax(d)) + 1
    assert row["k_at_max"] == k
    assert row["cusumsq"] == pytest.approx(d[k - 1] / (n * tot),
                                           rel=1e-12)
    # the argmax lands at the planted break
    assert 280 <= row["k_at_max"] <= 310


def test_combine_pvalues_brute(spark):
    from hiselspark.operators.drift import combine_pvalues
    ps = [("a", 0.001), ("b", 0.2), ("c", 0.5), ("d", 0.9),
          ("e", 1.0)]
    df = spark.createDataFrame(ps, ["k", "p"])
    row = combine_pvalues(df, "k", "p").collect()[0]
    fisher = sum(-2 * math.log(p) for _, p in ps)
    hmp = len(ps) / sum(1 / p for _, p in ps)
    assert row["m"] == 5 and row["fisher_df"] == 10
    assert row["fisher_x2"] == pytest.approx(fisher, rel=1e-12)
    assert row["hmp"] == pytest.approx(hmp, rel=1e-12)
    # all-null p's (p = 1 everywhere): fisher = 0, hmp = 1
    dfn = spark.createDataFrame([(str(i), 1.0) for i in range(4)],
                                ["k", "p"])
    rn = combine_pvalues(dfn, "k", "p").collect()[0]
    assert rn["fisher_x2"] == 0.0 and rn["hmp"] == pytest.approx(1.0)


def test_hill_tail_recovers_pareto_alpha(spark):
    from hiselspark.operators.profile import hill_tail
    rng = np.random.RandomState(71)
    true_alpha = 1.8
    u = rng.rand(5000)
    x = np.floor(100.0 / u ** (1.0 / true_alpha)).astype(int)
    df = _rows(spark, ["v"], [(int(v),) for v in x])
    row = hill_tail(df, "v", k=300).collect()[0]
    assert row["n"] == 5000 and row["n_dropped"] == 0
    # Hill on 300 tail points recovers alpha within ~20%
    assert 1.4 < row["alpha"] < 2.3
    # brute replication of the exact rule
    s = np.sort(x)[::-1]
    x_min = int(s[300])            # (k+1)-th largest order statistic
    tail = x[x > x_min]
    alpha = len(tail) / np.log(tail / x_min).sum()
    assert row["x_min"] == x_min
    assert row["n_tail"] == len(tail)
    assert row["alpha"] == pytest.approx(alpha, rel=1e-9)


def test_pacf_durbin_levinson_and_ar1(spark):
    from hiselspark.operators.tsprofile import pacf3
    rng = np.random.RandomState(73)
    # AR(1): x_t = 0.7 x_{t-1} + e — phi1 ~ 0.7, phi2/phi3 ~ 0
    x = np.zeros(3000)
    for t in range(1, 3000):
        x[t] = 0.7 * x[t - 1] + rng.randint(-50, 51)
    v = np.round(x).astype(int)
    rows = [(1, i, 0, int(a)) for i, a in enumerate(v)]
    df = _rows(spark, ["e", "ts", "o", "v"], rows)
    row = pacf3(df, "e", "ts", "o", "v").collect()[0]
    assert 0.6 < row["phi1"] < 0.8
    assert abs(row["phi2"]) < 0.1 and abs(row["phi3"]) < 0.1
    # brute Durbin-Levinson from the same textbook acf estimator
    xc = v - v.mean()
    den = (xc ** 2).sum()
    r = [1.0] + [(xc[:-k] * xc[k:]).sum() / den for k in (1, 2, 3)]
    phi = {1: {1: r[1]}}
    for k in (2, 3):
        num = r[k] - sum(phi[k - 1][j] * r[k - j]
                         for j in range(1, k))
        dn = 1 - sum(phi[k - 1][j] * r[j] for j in range(1, k))
        phi[k] = {k: num / dn}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - phi[k][k] * phi[k - 1][k - j]
    assert row["phi1"] == pytest.approx(phi[1][1], abs=1e-6)
    assert row["phi2"] == pytest.approx(phi[2][2], abs=1e-6)
    assert row["phi3"] == pytest.approx(phi[3][3], abs=1e-6)


def test_dunn_test_brute(spark):
    from hiselspark.operators.rankstats import dunn_test
    rng = np.random.RandomState(79)
    rows = []
    for g, shift in (("a", 0), ("b", 15), ("c", 40)):
        for v in rng.randint(0, 60, 120) + shift:
            rows.append((g, int(v)))
    df = _rows(spark, ["g", "v"], rows)
    out = {(r["g_a"], r["g_b"]): r
           for r in dunn_test(df, "g", "v").collect()}
    # brute: pooled average ranks with ties + KW tie correction
    import collections
    vals = [v for _, v in rows]
    n = len(vals)
    cnt = collections.Counter(vals)
    base_rank = {}
    below = 0
    tc = 0
    for v in sorted(cnt):
        t = cnt[v]
        base_rank[v] = below + (t + 1) / 2
        below += t
        tc += t ** 3 - t
    sums = collections.defaultdict(float)
    ns = collections.defaultdict(int)
    for g, v in rows:
        sums[g] += base_rank[v]
        ns[g] += 1
    var_c = n * (n + 1) / 12 - tc / (12 * (n - 1))
    for (ga, gb) in (("a", "b"), ("a", "c"), ("b", "c")):
        mra = sums[ga] / ns[ga]
        mrb = sums[gb] / ns[gb]
        z = (mra - mrb) / math.sqrt(
            var_c * (1 / ns[ga] + 1 / ns[gb]))
        r = out[(ga, gb)]
        assert r["mean_rank_a"] == pytest.approx(mra, rel=1e-12)
        assert r["z"] == pytest.approx(z, rel=1e-9)
    # the shifted groups are significantly different
    assert abs(out[("a", "c")]["z"]) > 5
    assert out[("a", "c")]["p_value"] < 1e-6


def test_seq_pairs_crafted(spark):
    from hiselspark.operators.hmm import seq_pair_support
    # user 1: A @1, B @2   user 2: B @1, A @2   user 3: A only
    rows = [(1, "2024-01-01 00:00:01", 1, "A"),
            (1, "2024-01-01 00:00:02", 2, "B"),
            (2, "2024-01-01 00:00:01", 3, "B"),
            (2, "2024-01-01 00:00:02", 4, "A"),
            (3, "2024-01-01 00:00:01", 5, "A")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id",
                                      "event_type"])
    out = {(r["state_a"], r["state_b"]): r
           for r in seq_pair_support(df, "user_id", "ts", "event_id",
                                     "event_type").collect()}
    assert out[("A", "B")]["n_both"] == 2
    assert out[("A", "B")]["n_a_first"] == 1
    assert out[("A", "B")]["support"] == pytest.approx(0.5)
    assert out[("B", "A")]["n_a_first"] == 1


def test_burrows_delta_outlier(spark):
    from hiselspark.functions.text import burrows_delta
    rng = np.random.RandomState(83)
    words = ["the", "a", "of", "to", "and"]
    docs = []
    for d in range(30):
        toks = [words[rng.randint(0, 5)] for _ in range(100)]
        docs.append((d, " ".join(toks)))
    # doc 30: radically different style (one word only)
    docs.append((30, " ".join(["zebra"] * 100)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r["delta"]
           for r in burrows_delta(df, "doc_id", "text",
                                  top_v=5).collect()}
    typical = np.median([out[d] for d in range(30)])
    assert out[30] > 3 * typical      # the stylistic outlier stands out


def test_rmst_brute(spark):
    from hiselspark.operators.survival import rmst
    # crafted cohort: events at t=2 (2 of 4), censor at 5, event at 8
    rows = [("c", 2, 1), ("c", 2, 1), ("c", 5, 0), ("c", 8, 1)]
    df = spark.createDataFrame(rows, ["g", "d", "e"])
    row = rmst(df, "g", "d", "e", tau=10).collect()[0]
    # KM: S(2+)=0.5, S(5+)=0.5, S(8+)=0
    # RMST = 1*2 + 0.5*(5-2) + 0.5*(8-5) + 0*(10-8) = 5.0
    assert row["rmst"] == pytest.approx(5.0)
    assert row["n_subjects"] == 4
    # truncation: tau inside the curve
    row2 = rmst(df, "g", "d", "e", tau=4).collect()[0]
    assert row2["rmst"] == pytest.approx(1 * 2 + 0.5 * 2)
    # no events: S = 1 through tau -> RMST = tau
    dfn = spark.createDataFrame([("g", 3, 0), ("g", 7, 0)],
                                ["g", "d", "e"])
    rn = rmst(dfn, "g", "d", "e", tau=6).collect()[0]
    assert rn["rmst"] == pytest.approx(6.0)


def test_boxplot_brute(spark):
    from hiselspark.operators.profile import boxplot_profile
    rng = np.random.RandomState(89)
    v = np.concatenate([rng.randint(0, 100, 200),
                        np.array([5000, 6000])])   # planted outliers
    rows = [("a", int(x)) for x in v]
    df = _rows(spark, ["g", "v"], rows)
    row = boxplot_profile(df, "g", "v").collect()[0]
    q1, med, q3 = np.percentile(v, [25, 50, 75])
    assert row["q1"] == pytest.approx(q1)
    assert row["med"] == pytest.approx(med)
    assert row["q3"] == pytest.approx(q3)
    iqr = q3 - q1
    assert row["n_high"] == int((v > q3 + 1.5 * iqr).sum())
    assert row["n_low"] == int((v < q1 - 1.5 * iqr).sum())
    assert row["n_high"] >= 2          # the planted outliers flagged


def test_linear_shap3_recovers_coefficients(spark):
    from hiselspark.operators.regress import linear_shap3
    rng = np.random.RandomState(97)
    n = 400
    x1 = rng.randint(0, 50, n)
    x2 = rng.randint(0, 30, n)
    x3 = rng.randint(0, 24, n)
    y = 3 * x1 + 2 * x2 - x3 + rng.randint(0, 5, n)
    rows = [(i, int(x1[i]), int(x2[i]), int(x3[i]), int(y[i]))
            for i in range(n)]
    df = _rows(spark, ["id", "x1", "x2", "x3", "y"], rows)
    out = linear_shap3(df, "id", "x1", "x2", "x3", "y").collect()
    # efficiency: mean prediction equals the baseline mean of y
    preds = np.array([r["prediction"] for r in out])
    assert preds.mean() == pytest.approx(y.mean(), rel=1e-9)
    # attribution slopes recover the planted coefficients: regress
    # contrib_x1 on (x1 - mean) -> slope 3 etc.
    c1 = np.array([r["contrib_x1"] for r in out])
    xc = x1 - x1.mean()
    slope = (c1 * xc).sum() / (xc * xc).sum()
    assert slope == pytest.approx(3.0, abs=0.05)
    # numpy lstsq cross-check of all three betas
    A = np.stack([np.ones(n), x1, x2, x3], 1).astype(float)
    beta = np.linalg.lstsq(A, y.astype(float), rcond=None)[0]
    c2 = np.array([r["contrib_x2"] for r in out])
    c3 = np.array([r["contrib_x3"] for r in out])
    s2 = (c2 * (x2 - x2.mean())).sum() / (((x2 - x2.mean()) ** 2).sum())
    s3 = (c3 * (x3 - x3.mean())).sum() / (((x3 - x3.mean()) ** 2).sum())
    assert s2 == pytest.approx(beta[2], rel=1e-6)
    assert s3 == pytest.approx(beta[3], rel=1e-6)


def test_bradley_terry_recovers_strengths(spark):
    import random
    from hiselspark.operators.rank_eval import bradley_terry
    random.seed(5)
    true = {"a": 8.0, "b": 4.0, "c": 2.0, "d": 1.0}
    rows = []
    for _ in range(2000):
        i, j = random.sample(list(true), 2)
        p = true[i] / (true[i] + true[j])
        rows.append((i, j) if random.random() < p else (j, i))
    df = spark.createDataFrame(rows, ["w", "l"])
    out = {r["player"]: r for r in bradley_terry(df, "w", "l")
           .collect()}
    # ranking recovers the planted strength order
    assert (out["a"]["rating"] > out["b"]["rating"]
            > out["c"]["rating"] > out["d"]["rating"])
    # ratio a/d is in the right ballpark of the true 8x
    assert 4.0 < out["a"]["rating"] / out["d"]["rating"] < 16.0
    # ratings renormalize to ~k*scale total (the integer L1 renorm
    # divisor is floored, so the total can overshoot by up to the
    # divisor's quantization — same contract as graph.hits)
    tot = sum(r["rating"] for r in out.values())
    assert 0.5 * 4e9 < tot < 2.0 * 4e9
    # wins/games accounting is exact
    assert sum(r["wins"] for r in out.values()) == 2000
    assert sum(r["games"] for r in out.values()) == 4000


def test_ransac_survives_majority_structured_outliers(spark):
    from hiselspark.operators.regress import ransac_line
    rng = np.random.RandomState(101)
    n = 1000
    x = rng.randint(0, 200, n)
    y = 5 * x + 20 + rng.randint(-10, 11, n)
    # 40% structured outliers on a DIFFERENT line (Theil-Sen's 29%
    # breakdown point would already be in trouble)
    out_mask = rng.rand(n) < 0.4
    y[out_mask] = (-2 * x[out_mask] + 900
                   + rng.randint(-10, 11, out_mask.sum()))
    rows = [(i, int(x[i]), int(y[i])) for i in range(n)]
    df = _rows(spark, ["id", "x", "y"], rows)
    row = ransac_line(df, "id", "x", "y", n_candidates=32,
                      tol=30).collect()[0]
    assert row["slope"] == pytest.approx(5.0, abs=0.3)
    assert row["n_inliers"] > 0.5 * n
    # exact inlier recount for the winning candidate
    xa, ya, xb, yb = row["xa"], row["ya"], row["xb"], row["yb"]
    resid = np.abs((y - ya) * (xb - xa) - (yb - ya) * (x - xa))
    assert row["n_inliers"] == int(
        (resid <= 30 * abs(xb - xa)).sum())


def test_win_ratio_brute(spark):
    from hiselspark.operators.survival import win_ratio
    rng = np.random.RandomState(103)
    rows = []
    for arm, shift in ((1, 4), (0, 0)):
        for _ in range(120):
            d = int(rng.randint(1, 20)) + shift
            e = int(rng.rand() < 0.7)
            rows.append((arm, d, e))
    df = _rows(spark, ["t", "d", "e"], rows)
    row = win_ratio(df, "t", "d", "e").collect()[0]
    tr = [(d, e) for t, d, e in rows if t == 1]
    co = [(d, e) for t, d, e in rows if t == 0]
    w = l = ti = 0
    for da, ea in tr:
        for db, eb in co:
            if db < da and eb == 1:
                w += 1
            elif da < db and ea == 1:
                l += 1
            else:
                ti += 1
    assert (row["wins"], row["losses"], row["ties"]) == (w, l, ti)
    assert row["win_ratio"] == pytest.approx(w / l, rel=1e-12)
    # the shifted (longer-surviving) treated arm wins more
    assert row["win_ratio"] > 1.5


def test_breslow_day_brute(spark):
    from hiselspark.operators.causal import breslow_day
    rng = np.random.RandomState(107)
    # homogeneous OR across 4 strata
    s = rng.randint(0, 4, 2000)
    t = rng.randint(0, 2, 2000)
    base_p = 0.3 + 0.05 * s
    odds = base_p / (1 - base_p) * np.where(t == 1, 2.0, 1.0)
    y = (rng.rand(2000) < odds / (1 + odds)).astype(int)
    df = _rows(spark, ["s", "t", "y"],
               np.stack([s, t, y], 1).tolist())
    row = breslow_day(df, "s", "t", "y").collect()[0]

    # brute replication of psi + quadratic roots + chi2
    cells = {}
    for st in range(4):
        m = s == st
        a = int(((t == 1) & (y == 1) & m).sum())
        b = int(((t == 1) & (y == 0) & m).sum())
        c = int(((t == 0) & (y == 1) & m).sum())
        d = int(((t == 0) & (y == 0) & m).sum())
        cells[st] = (a, b, c, d)
    psi = (sum(a * d / (a + b + c + d)
               for a, b, c, d in cells.values())
           / sum(b * c / (a + b + c + d)
                 for a, b, c, d in cells.values()))
    chi2 = 0.0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        r1, c1 = a + b, a + c
        A, B, C = 1 - psi, (n - r1 - c1) + psi * (r1 + c1), \
            -psi * r1 * c1
        disc = math.sqrt(B * B - 4 * A * C)
        roots = [(-B + disc) / (2 * A), (-B - disc) / (2 * A)]
        lo, hi = max(0.0, r1 + c1 - n), min(r1, c1)
        ah = roots[0] if lo <= roots[0] <= hi else roots[1]
        v = 1 / (1 / ah + 1 / (r1 - ah) + 1 / (c1 - ah)
                 + 1 / (n - r1 - c1 + ah))
        chi2 += (a - ah) ** 2 / v
    assert row["or_mh"] == pytest.approx(psi, rel=1e-9)
    assert row["chi2_bd"] == pytest.approx(chi2, rel=1e-9)
    assert row["df"] == 3
    # homogeneous data: chi2 should be unexceptional (< ~12 for df=3)
    assert row["chi2_bd"] < 12.0


def test_seasonal_mk_immune_to_pure_seasonality(spark):
    from hiselspark.operators.trend import (mann_kendall,
                                            seasonal_mann_kendall)
    rng = np.random.RandomState(109)
    # pure seasonal signal, NO trend: value depends only on phase
    n = 240
    phases = np.arange(n) % 4
    v = 100 * phases + rng.randint(-3, 4, n)
    rows = [(1, i, 0, int(v[i]), int(phases[i])) for i in range(n)]
    df = _rows(spark, ["e", "ts", "o", "v", "ph"], rows)
    row = seasonal_mann_kendall(df, "e", "ts", "o", "v", "ph",
                                last_k=60).collect()[0]
    # within each phase the series is noise -> combined z near 0
    assert abs(row["z"]) < 2.5
    assert row["n_phases"] == 4
    # a genuine monotone trend inside every phase DOES fire
    v2 = 5 * np.arange(n) + rng.randint(-3, 4, n)
    df2 = _rows(spark, ["e", "ts", "o", "v", "ph"],
                [(1, i, 0, int(v2[i]), int(phases[i]))
                 for i in range(n)])
    row2 = seasonal_mann_kendall(df2, "e", "ts", "o", "v", "ph",
                                 last_k=60).collect()[0]
    assert row2["z"] > 5.0
    # additivity: the combined S equals the sum of per-phase S's
    tot = 0
    for p in range(4):
        sub = [(10 + p, i, 0, int(v2[i]), 0)
               for i in range(n) if phases[i] == p]
        dfp = _rows(spark, ["e", "ts", "o", "v", "ph"], sub)
        tot += mann_kendall(dfp, "e", "ts", "o", "v",
                            last_k=60).collect()[0]["s_stat"]
    assert row2["s_stat"] == tot


def test_mediation_planted_chain(spark):
    from hiselspark.operators.causal import mediation
    rng = np.random.RandomState(113)
    n = 1000
    x = rng.randint(0, 100, n)
    m = 2 * x + rng.randint(-5, 6, n)        # a = 2
    y = 3 * m + 1 * x + rng.randint(-5, 6, n)  # b = 3, c = 1
    rows = [(int(x[i]), int(m[i]), int(y[i])) for i in range(n)]
    df = _rows(spark, ["x", "m", "y"], rows)
    row = mediation(df, "x", "m", "y").collect()[0]
    assert row["a"] == pytest.approx(2.0, abs=0.05)
    assert row["b"] == pytest.approx(3.0, abs=0.05)
    assert row["c_direct"] == pytest.approx(1.0, abs=0.2)
    assert row["indirect"] == pytest.approx(6.0, abs=0.3)
    assert row["sobel_z"] > 10      # overwhelming mediation evidence
    assert 0.8 < row["prop_mediated"] < 0.95
    # numpy lstsq cross-check of stage-2 coefficients
    A = np.stack([np.ones(n), m, x], 1).astype(float)
    beta = np.linalg.lstsq(A, y.astype(float), rcond=None)[0]
    assert row["b"] == pytest.approx(beta[1], rel=1e-9)
    assert row["c_direct"] == pytest.approx(beta[2], rel=1e-9)


def test_spiegelhalter_and_funnel(spark):
    from pyspark.sql import functions as F
    from hiselspark.operators.evaluate import (funnel_control,
                                               spiegelhalter_z)
    rng = np.random.RandomState(127)
    # perfectly calibrated probabilities: z should be modest
    pm = rng.randint(1, 1000, 4000)
    y = (rng.rand(4000) * 1000 < pm).astype(int)
    df = _rows(spark, ["pm", "y"],
               [(int(pm[i]), int(y[i])) for i in range(4000)])
    row = spiegelhalter_z(df, "pm", "y").collect()[0]
    a = ((1000 * y - pm) * (1000 - 2 * pm)).sum()
    b = ((1000 - 2 * pm) ** 2 * pm * (1000 - pm)).sum()
    assert row["a_num"] == int(a) and row["b_den"] == int(b)
    assert row["z"] == pytest.approx(a / math.sqrt(b), rel=1e-12)
    assert abs(row["z"]) < 3.5
    # overconfident probabilities (true rate squashed to 0.5): |z| big
    y2 = (rng.rand(4000) < 0.5).astype(int)
    df2 = _rows(spark, ["pm", "y"],
                [(int(pm[i]), int(y2[i])) for i in range(4000)])
    row2 = spiegelhalter_z(df2, "pm", "y").collect()[0]
    assert abs(row2["z"]) > 5
    # funnel: a planted out-of-band segment flags
    rows = []
    for seg in range(10):
        p = 0.2 if seg != 7 else 0.8
        for i in range(300):
            rows.append((seg, bool(rng.rand() < p)))
    dff = spark.createDataFrame(rows, ["seg", "f"])
    out = {r["seg"]: r
           for r in funnel_control(dff, "seg", F.col("f")).collect()}
    assert out[7]["flag_high"] and not out[7]["flag_low"]
    assert sum(1 for r in out.values() if r["flag_high"]) == 1


def test_diagnostics_card_brute(spark):
    from pyspark.sql import functions as F
    from hiselspark.operators.evaluate import diagnostics_card
    rng = np.random.RandomState(131)
    score = rng.randint(0, 100, 2000)
    y = (rng.rand(2000) * 100 < score).astype(int)  # informative
    df = _rows(spark, ["s", "y"],
               [(int(score[i]), int(y[i])) for i in range(2000)])
    row = diagnostics_card(df, "s", "y", F.lit(50)).collect()[0]
    pred = (score >= 50).astype(int)
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    tn = int(((pred == 0) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == \
        (tp, fp, tn, fn)
    sens, spec = tp / (tp + fn), tn / (tn + fp)
    assert row["sens"] == pytest.approx(sens, rel=1e-12)
    assert row["youden_j"] == pytest.approx(sens + spec - 1,
                                            rel=1e-9)
    assert row["dor"] == pytest.approx(tp * tn / (fp * fn),
                                       rel=1e-12)
    assert row["youden_j"] > 0.3       # informative screen


def test_brier_skill_brute(spark):
    from hiselspark.operators.evaluate import brier_skill
    rng = np.random.RandomState(137)
    pm = rng.randint(1, 1000, 3000)
    y = (rng.rand(3000) * 1000 < pm).astype(int)   # calibrated model
    df = _rows(spark, ["pm", "y"],
               [(int(pm[i]), int(y[i])) for i in range(3000)])
    row = brier_skill(df, "pm", "y").collect()[0]
    p = pm / 1000.0
    bs = ((y - p) ** 2).mean()
    pbar = y.mean()
    bss = 1 - bs / (pbar * (1 - pbar))
    assert row["bss"] == pytest.approx(bss, rel=1e-9)
    assert row["bss"] > 0.2         # a calibrated model beats base rate
    # random probabilities vs independent labels: skill near/below 0
    y2 = (rng.rand(3000) < 0.5).astype(int)
    df2 = _rows(spark, ["pm", "y"],
                [(int(pm[i]), int(y2[i])) for i in range(3000)])
    assert brier_skill(df2, "pm", "y").collect()[0]["bss"] < 0.05
