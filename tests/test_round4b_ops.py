"""Brute-force NumPy checks for the round-4b operator batch:
nelson_aalen, anova_f, reg_discontinuity, energy_distance,
l_diversity — each verified against a direct definition-level
computation on small synthetic data (never against the
implementation's own algebra)."""
import numpy as np
import pytest


def _rng(seed):
    return np.random.default_rng(seed)


def test_nelson_aalen_brute(spark):
    from hiselspark.operators.survival import nelson_aalen
    rng = _rng(7)
    n = 400
    rows = [(str(c), int(d), int(e))
            for c, d, e in zip(rng.integers(0, 3, n),
                               rng.integers(0, 10, n),
                               rng.integers(0, 2, n))]
    df = spark.createDataFrame(rows, ["cohort", "duration", "event"])
    out = {(r["cohort"], r["duration"]):
           (r["n_at_risk"], r["n_events"], r["cumhaz"])
           for r in nelson_aalen(df, "cohort", "duration",
                                 "event").collect()}
    arr = np.array([(int(c), d, e) for c, d, e in rows])
    for c in range(3):
        sub = arr[arr[:, 0] == c]
        cum = 0.0
        for t in sorted(set(sub[:, 1])):
            at_risk = int((sub[:, 1] >= t).sum())
            d_t = int(((sub[:, 1] == t) & (sub[:, 2] == 1)).sum())
            cum += d_t / at_risk
            got = out[(str(c), t)]
            assert got[0] == at_risk and got[1] == d_t
            assert got[2] == pytest.approx(cum, rel=1e-12)


def test_anova_f_brute(spark):
    from hiselspark.operators.evaluate import anova_f
    rng = _rng(11)
    n = 600
    g = rng.integers(0, 4, n)
    v = rng.integers(-50, 200, n) + g * 10  # real group effect
    df = spark.createDataFrame(
        [(str(a), int(b)) for a, b in zip(g, v)], ["grp", "val"])
    row = anova_f(df, "grp", "val").collect()[0]
    grand = v.mean()
    ssb = sum((v[g == i].size * (v[g == i].mean() - grand) ** 2)
              for i in range(4))
    ssw = sum(((v[g == i] - v[g == i].mean()) ** 2).sum()
              for i in range(4))
    f = (ssb / 3) / (ssw / (n - 4))
    assert row["k"] == 4 and row["n"] == n
    assert row["ss_between"] == pytest.approx(ssb, rel=1e-9)
    assert row["ss_within"] == pytest.approx(ssw, rel=1e-9)
    assert row["f_stat"] == pytest.approx(f, rel=1e-9)
    assert row["f_stat"] > 3.0  # the planted effect is detected


def test_anova_f_degenerate(spark):
    from hiselspark.operators.evaluate import anova_f
    # zero within-group variance -> f_stat NULL
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 9), ("b", 9)], ["grp", "val"])
    row = anova_f(df, "grp", "val").collect()[0]
    assert row["ss_within"] == pytest.approx(0.0)
    assert row["f_stat"] is None


def test_reg_discontinuity_brute(spark):
    from hiselspark.operators.causal import reg_discontinuity
    rng = _rng(13)
    n = 2000
    x = rng.integers(0, 101, n)
    # outcome: slope 2 below the cutoff, slope 3 above, jump +500
    y = np.where(x < 50, 2 * x + rng.integers(-5, 6, n),
                 3 * x + 500 + rng.integers(-5, 6, n))
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], ["x", "y"])
    row = reg_discontinuity(df, "x", "y",
                            cutoff=50, bandwidth=30).collect()[0]

    def ols(side):
        if side == "left":
            m = (x >= 20) & (x < 50)
        else:
            m = (x >= 50) & (x <= 80)
        xs = x[m].astype(float) - 50.0
        ys = y[m].astype(float)
        slope = (np.cov(xs, ys, bias=True)[0, 1] / np.var(xs))
        return slope, ys.mean() - slope * xs.mean(), int(m.sum())

    sl, il, nl = ols("left")
    sr, ir, nr = ols("right")
    assert row["n_left"] == nl and row["n_right"] == nr
    assert row["slope_left"] == pytest.approx(sl, rel=1e-9)
    assert row["slope_right"] == pytest.approx(sr, rel=1e-9)
    assert row["effect"] == pytest.approx(ir - il, rel=1e-9)
    # the planted jump at the cutoff: right line 3*50+500=650 vs
    # left line 2*50=100 -> ~550
    assert 500.0 < row["effect"] < 600.0


def test_energy_distance_brute(spark):
    from hiselspark.operators.drift import energy_distance
    rng = _rng(17)
    a = rng.integers(0, 100, 150)
    b = rng.integers(30, 160, 110)
    rows = ([("a", int(v)) for v in a] + [("b", int(v)) for v in b]
            + [("c", 1)])  # third group must be ignored
    df = spark.createDataFrame(rows, ["grp", "val"])
    row = energy_distance(df, "grp", "val", "a", "b").collect()[0]
    sab = np.abs(a[:, None] - b[None, :]).sum()
    saa = np.abs(a[:, None] - a[None, :]).sum()
    sbb = np.abs(b[:, None] - b[None, :]).sum()
    e = (2 * sab / (len(a) * len(b)) - saa / len(a) ** 2
         - sbb / len(b) ** 2)
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["s_ab"] == sab and row["s_aa"] == saa
    assert row["s_bb"] == sbb
    assert row["energy_d"] == pytest.approx(e, rel=1e-12)
    assert row["energy_d"] > 0.0


def test_energy_distance_identical_is_zero(spark):
    from hiselspark.operators.drift import energy_distance
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    row = energy_distance(df, "grp", "val", "a", "b").collect()[0]
    assert row["energy_d"] == pytest.approx(0.0)


def test_l_diversity_brute(spark):
    from hiselspark.operators.pii import l_diversity
    rows = [
        # group (1,) has 3 distinct sensitive values, (2,) only 1
        (1, "x"), (1, "y"), (1, "z"), (1, "x"),
        (2, "x"), (2, "x"),
    ]
    df = spark.createDataFrame(rows, ["quasi", "sens"])
    out = {r["quasi"]: r for r in
           l_diversity(df, ["quasi"], "sens", l=2).collect()}
    assert out[1]["class_size"] == 4
    assert out[1]["n_sensitive"] == 3 and not out[1]["violates_l"]
    assert out[2]["n_sensitive"] == 1 and out[2]["violates_l"]
    with pytest.raises(ValueError):
        l_diversity(df, ["quasi"], "sens", l=0)


def test_bleu_pairs_brute(spark):
    from collections import Counter
    import math
    from hiselspark.functions.text import bleu_pairs
    rows = [
        (0, "the cat sat on the mat", "the cat is on the mat"),
        (1, "a b c d", "a b c d"),          # perfect -> BLEU 1.0
        (2, "x y", "completely different"),  # zero overlap -> NULL
        (3, "a a a a", "a b"),               # clipping matters
    ]
    df = spark.createDataFrame(rows, ["pid", "cand", "ref"])
    out = {r["pid"]: r for r in
           bleu_pairs(df, "pid", "cand", "ref", max_n=2).collect()}

    def brute(cand, ref):
        c, r = cand.split(), ref.split()
        res = {}
        for n in (1, 2):
            cg = Counter(tuple(c[i:i+n]) for i in range(len(c)-n+1))
            rg = Counter(tuple(r[i:i+n]) for i in range(len(r)-n+1))
            res[n] = (sum(min(v, rg[g]) for g, v in cg.items()),
                      sum(cg.values()))
        if any(res[n][0] == 0 for n in (1, 2)):
            return res, None
        bp = min(1.0, math.exp(1 - len(r)/len(c)))
        b = bp * math.exp(sum(math.log(res[n][0]/res[n][1])/2
                              for n in (1, 2)))
        return res, b

    for pid, cand, ref in [(r[0], r[1], r[2]) for r in rows]:
        res, b = brute(cand, ref)
        got = out[pid]
        assert (got["p1_num"], got["p1_den"]) == res[1]
        assert (got["p2_num"], got["p2_den"]) == res[2]
        if b is None:
            assert got["bleu"] is None
        else:
            assert got["bleu"] == pytest.approx(b, rel=1e-12)
    assert out[1]["bleu"] == pytest.approx(1.0)
    # clipping: cand 'a a a a' vs ref 'a b' -> p1 = 1/4
    assert out[3]["p1_num"] == 1 and out[3]["p1_den"] == 4


def test_good_turing_brute(spark):
    from collections import Counter
    from hiselspark.functions.text import good_turing
    texts = ["a a a b b c", "c d e", "a b f g"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    out = {r["r"]: r for r in good_turing(df, "text").collect()}
    cnt = Counter(" ".join(texts).split())
    nr = Counter(cnt.values())
    total = sum(cnt.values())
    for r, n_r in nr.items():
        assert out[r]["n_r"] == n_r
        assert out[r]["total_tokens"] == total
        if (r + 1) in nr:
            assert out[r]["r_star"] == pytest.approx(
                (r + 1) * nr[r + 1] / n_r, rel=1e-12)
        else:
            assert out[r]["r_star"] is None


def test_kneser_ney_brute(spark):
    from collections import Counter
    from hiselspark.functions.text import kneser_ney
    texts = ["the cat sat", "the dog sat", "a cat sat", "the cat ran"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = {(r["w1"], r["w2"]): r for r in
           kneser_ney(df, "text", discount=0.75, min_count=1,
                      id_col="doc_id").collect()}
    bigrams = Counter()
    for t in texts:
        w = t.split()
        bigrams.update(zip(w, w[1:]))
    c1 = Counter(); fwd = Counter(); back = Counter()
    for (w1, w2), c in bigrams.items():
        c1[w1] += c; fwd[w1] += 1; back[w2] += 1
    ntypes = len(bigrams)
    d = 0.75
    for (w1, w2), c in bigrams.items():
        got = out[(w1, w2)]
        assert got["c12"] == c and got["c1"] == c1[w1]
        assert got["n1p_fwd"] == fwd[w1]
        assert got["n1p_back"] == back[w2]
        assert got["n_types"] == ntypes
        pkn = (max(c - d, 0.0) / c1[w1]
               + (d / c1[w1]) * fwd[w1] * back[w2] / ntypes)
        assert got["pkn"] == pytest.approx(pkn, rel=1e-12)
    # KN probabilities over each context sum to <= 1 (mass reserved
    # only for unseen continuations)
    for w1 in c1:
        s = sum(out[(a, b)]["pkn"] for (a, b) in bigrams if a == w1)
        assert s <= 1.0 + 1e-9


def test_weighted_hops_brute(spark):
    from hiselspark.operators.graph import weighted_hops
    # diamond graph: 1-2 (w5), 1-3 (w1), 3-2 (w2), 2-4 (w1)
    edges = spark.createDataFrame(
        [(1, 2, 5), (1, 3, 1), (3, 2, 2), (2, 4, 1)],
        ["src", "dst", "w"])
    src = spark.createDataFrame([(1,)], ["node"])
    out = {r["node"]: r["dist"] for r in
           weighted_hops(edges, src, max_rounds=3).collect()}
    # shortest: 1->0, 3->1, 2->3 (via 3, not the direct 5), 4->4
    assert out == {1: 0, 3: 1, 2: 3, 4: 4}
    # one round only: 2 is reached via the direct heavy edge
    out1 = {r["node"]: r["dist"] for r in
            weighted_hops(edges, src, max_rounds=1).collect()}
    assert out1[2] == 5 and out1[3] == 1


def test_ips_offpolicy_brute(spark):
    from collections import Counter
    from hiselspark.operators.causal import ips_offpolicy
    rng = _rng(23)
    n = 500
    acts = ["a", "b", "c"]
    logged = [acts[i] for i in rng.integers(0, 3, n)]
    target = [acts[i] for i in rng.integers(0, 3, n)]
    reward = rng.integers(0, 100, n)
    df = spark.createDataFrame(
        [(l, int(r), t) for l, r, t in zip(logged, reward, target)],
        ["act", "rew", "tgt"])
    row = ips_offpolicy(df, "act", "rew", "tgt").collect()[0]
    freq = Counter(logged)
    w = [(1.0 / (freq[l] / n)) if l == t else 0.0
         for l, t in zip(logged, target)]
    v_ips = sum(r * wi for r, wi in zip(reward, w)) / n
    v_snips = (sum(r * wi for r, wi in zip(reward, w)) / sum(w))
    assert row["n"] == n
    assert row["n_matched"] == sum(1 for l, t in zip(logged, target)
                                   if l == t)
    assert row["value_ips"] == pytest.approx(v_ips, rel=1e-9)
    assert row["value_snips"] == pytest.approx(v_snips, rel=1e-9)


def test_ips_offpolicy_identity_policy(spark):
    # target == logged everywhere, empirical propensities: every row
    # of action a gets w = n/n_a, so IPS = Σ_a mean_a(r) and SNIPS is
    # the action-balanced weighted mean
    from hiselspark.operators.causal import ips_offpolicy
    rows = [("a", 10, "a"), ("a", 20, "a"), ("b", 30, "b")]
    df = spark.createDataFrame(rows, ["act", "rew", "tgt"])
    row = ips_offpolicy(df, "act", "rew", "tgt").collect()[0]
    assert row["n_matched"] == 3
    assert row["value_ips"] == pytest.approx(15.0 + 30.0)   # Σ means
    assert row["value_snips"] == pytest.approx(135.0 / 6.0)  # 22.5


def test_linear_shap_brute(spark):
    from hiselspark.operators.regress import linear_shap
    rng = _rng(29)
    n = 300
    x1 = rng.integers(0, 50, n)
    x2 = rng.integers(-10, 10, n)
    y = 3 * x1 - 2 * x2 + rng.integers(-3, 4, n)
    df = spark.createDataFrame(
        [(i, int(a), int(b), int(c))
         for i, (a, b, c) in enumerate(zip(x1, x2, y))],
        ["rid", "x1", "x2", "y"])
    out = {r["rid"]: r for r in
           linear_shap(df, "rid", "x1", "x2", "y").collect()}
    X = np.column_stack([np.ones(n), x1, x2]).astype(float)
    beta = np.linalg.lstsq(X, y.astype(float), rcond=None)[0]
    b1, b2 = beta[1], beta[2]
    for i in range(0, n, 37):
        got = out[i]
        c1 = b1 * (x1[i] - x1.mean())
        c2 = b2 * (x2[i] - x2.mean())
        assert got["contrib_x1"] == pytest.approx(c1, rel=1e-6)
        assert got["contrib_x2"] == pytest.approx(c2, rel=1e-6)
        assert got["baseline"] == pytest.approx(y.mean(), rel=1e-9)
        assert got["prediction"] == pytest.approx(
            y.mean() + c1 + c2, rel=1e-6)
    # efficiency: contributions + baseline average to the mean pred
    preds = np.array([out[i]["prediction"] for i in range(n)])
    assert preds.mean() == pytest.approx(y.mean(), rel=1e-9)


def test_mcnemar_brute(spark):
    import math
    from hiselspark.operators.evaluate import mcnemar_test
    rng = _rng(31)
    n = 400
    y1 = rng.integers(0, 2, n)
    y2 = np.where(rng.random(n) < 0.3, 1 - y1, y1)  # mostly agree
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(y1, y2)], ["y1", "y2"])
    row = mcnemar_test(df, "y1", "y2").collect()[0]
    b = int(((y1 == 1) & (y2 == 0)).sum())
    c = int(((y1 == 0) & (y2 == 1)).sum())
    assert row["n10"] == b and row["n01"] == c
    chi2 = (abs(b - c) - 1) ** 2 / (b + c)
    assert row["chi2"] == pytest.approx(chi2, rel=1e-12)
    x = math.sqrt(chi2 / 2)
    assert row["p_value"] == pytest.approx(math.erfc(x), abs=2e-7)


def test_mcnemar_no_discordant(spark):
    from hiselspark.operators.evaluate import mcnemar_test
    df = spark.createDataFrame([(1, 1), (0, 0)], ["y1", "y2"])
    row = mcnemar_test(df, "y1", "y2").collect()[0]
    assert row["chi2"] is None and row["p_value"] is None


def test_fleiss_kappa_brute(spark):
    from hiselspark.operators.evaluate import fleiss_kappa
    # Fleiss 1971 worked example shape: N items, n=6 raters,
    # 3 categories — brute-force the formula
    rng = _rng(37)
    n_items, n_raters = 40, 6
    cats = ["a", "b", "c"]
    rows = [(i, cats[rng.integers(0, 3)])
            for i in range(n_items) for _ in range(n_raters)]
    df = spark.createDataFrame(rows, ["item", "cat"])
    row = fleiss_kappa(df, "item", "cat").collect()[0]
    import collections
    nij = collections.Counter(rows)
    tbl = np.zeros((n_items, 3))
    for (i, c), v in nij.items():
        tbl[i, cats.index(c)] = v
    P_i = ((tbl ** 2).sum(axis=1) - n_raters) / (n_raters
                                                 * (n_raters - 1))
    p_bar = P_i.mean()
    p_j = tbl.sum(axis=0) / (n_items * n_raters)
    p_e = (p_j ** 2).sum()
    kappa = (p_bar - p_e) / (1 - p_e)
    assert row["n_items"] == n_items and row["n_raters"] == n_raters
    assert row["p_bar"] == pytest.approx(p_bar, rel=1e-12)
    assert row["p_e"] == pytest.approx(p_e, rel=1e-12)
    assert row["kappa"] == pytest.approx(kappa, rel=1e-12)


def test_fleiss_kappa_unequal_panels(spark):
    from hiselspark.operators.evaluate import fleiss_kappa
    rows = [(0, "a"), (0, "b"), (1, "a")]  # item 1 has 1 rater
    df = spark.createDataFrame(rows, ["item", "cat"])
    row = fleiss_kappa(df, "item", "cat").collect()[0]
    assert row["n_raters"] is None and row["kappa"] is None


def test_t_closeness_brute(spark):
    from hiselspark.operators.pii import t_closeness
    rng = _rng(41)
    n = 600
    grp = rng.integers(0, 5, n)
    sens = np.where(grp == 0, 0, rng.integers(0, 4, n))  # group 0 skewed
    df = spark.createDataFrame(
        [(int(g), str(s)) for g, s in zip(grp, sens)], ["q", "s"])
    out = {r["q"]: r for r in
           t_closeness(df, ["q"], "s", t=0.2).collect()}
    import collections
    glob = collections.Counter(str(s) for s in sens)
    N = n
    for g in range(5):
        mask = grp == g
        gc = collections.Counter(str(s) for s in sens[mask])
        gn = int(mask.sum())
        tvd = 0.5 * sum(abs(gc.get(c, 0) / gn - glob[c] / N)
                        for c in glob)
        got = out[g]
        assert got["group_size"] == gn
        assert got["tvd"] == pytest.approx(tvd, rel=1e-9)
        assert got["t_close"] == (tvd <= 0.2)
    assert not out[0]["t_close"]  # the planted skew is caught
    with pytest.raises(ValueError):
        t_closeness(df, ["q"], "s", t=0.0)


def test_harris_corners_brute(spark):
    from hiselspark.functions.image import (encode_raw6,
                                            with_harris_corners)
    rng = _rng(43)
    imgs = [(i, rng.integers(0, 256, (8, 8, 3)).astype(np.uint8))
            for i in range(6)]
    rows = [(i, img.tobytes(), 8, 8, "raw") for i, img in imgs]
    df = spark.createDataFrame(
        rows, ["iid", "bytes", "w", "h", "fmt"])
    out = {r["iid"]: r for r in
           with_harris_corners(df, threshold=0).collect()}
    for i, img in imgs:
        g = img.sum(axis=2).astype(np.int64)
        ix = np.zeros((6, 6), dtype=np.int64)
        iy = np.zeros((6, 6), dtype=np.int64)
        for y in range(1, 7):
            for x in range(1, 7):
                ix[y-1, x-1] = (g[y-1, x+1] + 2*g[y, x+1] + g[y+1, x+1]
                                - g[y-1, x-1] - 2*g[y, x-1]
                                - g[y+1, x-1])
                iy[y-1, x-1] = (g[y+1, x-1] + 2*g[y+1, x] + g[y+1, x+1]
                                - g[y-1, x-1] - 2*g[y-1, x]
                                - g[y-1, x+1])
        resp = np.zeros((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                sxx = (ix[y:y+3, x:x+3] ** 2).sum()
                syy = (iy[y:y+3, x:x+3] ** 2).sum()
                sxy = (ix[y:y+3, x:x+3] * iy[y:y+3, x:x+3]).sum()
                resp[y, x] = (20 * (sxx * syy - sxy * sxy)
                              - (sxx + syy) ** 2)
        got = out[i]
        assert got["corner_count"] == int((resp > 0).sum())
        assert got["resp_max"] == int(resp.max())
        assert got["resp_argmax"] == int(resp.argmax())


def test_dp_noisy_counts_brute(spark):
    import math
    from hiselspark.operators.pii import dp_noisy_counts
    rows = [(i % 7,) for i in range(200)]
    df = spark.createDataFrame(rows, ["g"])
    out = {r["g"]: r for r in
           dp_noisy_counts(df, ["g"], epsilon=0.5,
                           seed=3).collect()}
    from hiselspark.operators.bootstrap import cw_constants
    M = 2147483647
    a, c = cw_constants(1, 3)[0]
    for g in range(7):
        n_true = sum(1 for (v,) in rows if v == g)
        h = 0
        for ch in str(g):
            h = (h * 31 + ord(ch)) % M
        h = (h * a + c) % M
        u = ((h % (1 << 20)) + 0.5) / (1 << 20)
        noise = (-(1 / 0.5) * math.copysign(1.0, u - 0.5)
                 * math.log(1 - 2 * abs(u - 0.5)))
        got = out[g]
        assert got["n"] == n_true
        assert got["u"] == pytest.approx(u, rel=1e-12)
        assert got["noise"] == pytest.approx(noise, rel=1e-12)
        assert got["released"] == max(round(n_true + noise), 0)
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], epsilon=0.0)


def test_dp_noise_is_laplace_shaped(spark):
    # over many groups the hash-u noise matches Laplace(0, 1/eps)
    # quantiles: ~50% within b*ln(2), sign split ~50/50
    import numpy as np
    from hiselspark.operators.pii import dp_noisy_counts
    rows = [(i,) for i in range(4000)]
    df = spark.createDataFrame(rows, ["g"])
    noise = np.array([r["noise"] for r in
                      dp_noisy_counts(df, ["g"], epsilon=1.0,
                                      seed=0).collect()])
    assert abs((noise > 0).mean() - 0.5) < 0.05
    assert abs((np.abs(noise) < np.log(2)).mean() - 0.5) < 0.05


def test_ljung_box_brute(spark):
    from hiselspark.operators.tsprofile import ljung_box
    import datetime
    rng = _rng(47)
    rows = []
    for e in range(3):
        vals = rng.integers(0, 100, 60)
        if e == 1:  # strongly autocorrelated series
            vals = np.cumsum(rng.integers(0, 5, 60))
        for i, v in enumerate(vals):
            rows.append((str(e),
                         datetime.datetime(2024, 1, 1)
                         + datetime.timedelta(seconds=int(i)),
                         i, int(v)))
    df = spark.createDataFrame(rows, ["ent", "ts", "oid", "v"])
    out = {r["entity"]: r for r in
           ljung_box(df, "ent", "ts", "oid", "v",
                     max_lag=3).collect()}

    def brute(vals):
        x = np.asarray(vals, dtype=float)
        n = len(x)
        xb = x.mean()
        den = ((x - xb) ** 2).sum()
        q = 0.0
        for k in (1, 2, 3):
            r = ((x[k:] - xb) * (x[:-k] - xb)).sum() / den
            q += r * r / (n - k)
        return n * (n + 2) * q

    by_ent = {}
    for e, _, _, v in rows:
        by_ent.setdefault(e, []).append(v)
    for e, vals in by_ent.items():
        assert out[e]["q_stat"] == pytest.approx(brute(vals),
                                                 rel=1e-9)
    # the random-walk entity must show much larger Q than iid noise
    assert out["1"]["q_stat"] > 10 * out["0"]["q_stat"]
    with pytest.raises(ValueError):
        ljung_box(df, "ent", "ts", "oid", "v", max_lag=0)


def test_chrf_pairs_brute(spark):
    from collections import Counter
    from hiselspark.functions.text import chrf_pairs
    rows = [
        (0, "the cat", "the bat"),
        (1, "abcd", "abcd"),      # identical -> chrF 1.0
        (2, "xy", "qz"),          # no overlap -> NULL (m=0 ok, but
                                  # prec+rec>0 fails)
    ]
    df = spark.createDataFrame(rows, ["pid", "cand", "ref"])
    out = {r["pid"]: r for r in
           chrf_pairs(df, "pid", "cand", "ref", max_n=2,
                      beta=2.0).collect()}

    def brute(cand, ref):
        cs = cand.replace(" ", "").lower()
        rs = ref.replace(" ", "").lower()
        prec = rec = 0.0
        stats = {}
        for n in (1, 2):
            cg = Counter(cs[i:i+n] for i in range(len(cs)-n+1))
            rg = Counter(rs[i:i+n] for i in range(len(rs)-n+1))
            m = sum(min(v, rg[g]) for g, v in cg.items())
            c, r = sum(cg.values()), sum(rg.values())
            stats[n] = (m, c, r)
            prec += (m / c) / 2
            rec += (m / r) / 2
        if prec + rec == 0:
            return stats, None
        return stats, 5 * prec * rec / (4 * prec + rec)

    for pid, cand, ref in rows:
        stats, f = brute(cand, ref)
        got = out[pid]
        for n in (1, 2):
            assert (got[f"m{n}"], got[f"c{n}"],
                    got[f"r{n}"]) == stats[n]
        if f is None:
            assert got["chrf"] is None
        else:
            assert got["chrf"] == pytest.approx(f, rel=1e-12)
    assert out[1]["chrf"] == pytest.approx(1.0)


def test_logrank_brute(spark):
    import math
    from hiselspark.operators.survival import logrank_test
    rng = _rng(53)
    rows = []
    # group a: faster events; group b: slower (curves differ)
    for _ in range(150):
        rows.append(("a", int(rng.integers(0, 8)),
                     int(rng.random() < 0.8)))
    for _ in range(120):
        rows.append(("b", int(rng.integers(3, 12)),
                     int(rng.random() < 0.8)))
    df = spark.createDataFrame(rows, ["grp", "dur", "event"])
    row = logrank_test(df, "grp", "dur", "event", "a", "b") \
        .collect()[0]

    # brute-force the textbook estimator
    times = sorted({d for _, d, e in rows if e == 1})
    o_a = e_a = v = 0.0
    for t in times:
        na = sum(1 for g, d, _ in rows if g == "a" and d >= t)
        nb = sum(1 for g, d, _ in rows if g == "b" and d >= t)
        da = sum(1 for g, d, e in rows
                 if g == "a" and d == t and e == 1)
        db = sum(1 for g, d, e in rows
                 if g == "b" and d == t and e == 1)
        n, dt = na + nb, da + db
        if dt == 0 or n <= 1:
            continue
        o_a += da
        e_a += dt * na / n
        v += dt * (na / n) * (nb / n) * (n - dt) / (n - 1)
    chi2 = (o_a - e_a) ** 2 / v
    assert row["o_a"] == int(o_a)
    assert row["e_a"] == pytest.approx(e_a, rel=1e-9)
    assert row["var_sum"] == pytest.approx(v, rel=1e-9)
    assert row["chi2"] == pytest.approx(chi2, rel=1e-9)
    assert row["p_value"] == pytest.approx(
        math.erfc(math.sqrt(chi2 / 2)), abs=2e-7)
    # the planted difference must be detected
    assert row["chi2"] > 10.0


def test_logrank_identical_groups(spark):
    from hiselspark.operators.survival import logrank_test
    rows = ([("a", d, 1) for d in (1, 2, 3, 4)]
            + [("b", d, 1) for d in (1, 2, 3, 4)])
    df = spark.createDataFrame(rows, ["grp", "dur", "event"])
    row = logrank_test(df, "grp", "dur", "event", "a", "b") \
        .collect()[0]
    # identical curves: O_A == E_A exactly -> chi2 == 0, p == 1
    assert row["chi2"] == pytest.approx(0.0)
    assert row["p_value"] == pytest.approx(1.0, abs=2e-7)
