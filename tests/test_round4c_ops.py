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


def test_friedman_brute(spark):
    from hiselspark.operators.rankstats import friedman_test
    rng = _rng(17)
    n, k = 80, 4
    # planted treatment effect + one incomplete block
    rows = []
    for s in range(n):
        base = rng.integers(0, 50)
        for t in range(k):
            if s == 0 and t == 3:
                continue  # incomplete block
            rows.append((s, t, int(base + t * 3
                                   + rng.integers(0, 8))))
    df = spark.createDataFrame(rows, ["s", "t", "v"])
    row = friedman_test(df, "s", "t", "v").collect()[0]
    assert row["k"] == k
    assert row["n_subjects"] == n - 1 and row["n_dropped"] == 1

    # brute: average ranks per complete block, Conover tie-corrected Q
    import collections
    blocks = collections.defaultdict(dict)
    for s, t, v in rows:
        blocks[s][t] = v
    blocks = {s: d for s, d in blocks.items() if len(d) == k}
    rj = np.zeros(k)
    a_sum = 0.0
    for s, d in blocks.items():
        vals = np.array([d[t] for t in range(k)], dtype=float)
        order = vals.argsort(kind="stable")
        ranks = np.empty(k)
        i = 0
        while i < k:
            j = i
            while j + 1 < k and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        rj += ranks
        a_sum += (ranks ** 2).sum()
    nn = len(blocks)
    c = nn * k * (k + 1) ** 2 / 4
    num = ((rj - nn * (k + 1) / 2) ** 2).sum()
    q = (k - 1) * num / (a_sum - c)
    assert row["q_stat"] == pytest.approx(q, rel=1e-10)
    assert row["q_stat"] > 20  # the planted trend is detected


def test_page_trend_brute(spark):
    from hiselspark.operators.rankstats import page_trend
    rng = _rng(19)
    n, k = 60, 5
    rows = [(s, t, int(rng.integers(0, 30) + t * 4))
            for s in range(n) for t in range(k)]
    df = spark.createDataFrame(rows, ["s", "t", "v"])
    row = page_trend(df, "s", "t", "v").collect()[0]
    import collections
    blocks = collections.defaultdict(dict)
    for s, t, v in rows:
        blocks[s][t] = v
    l_sum = 0.0
    for s, d in blocks.items():
        vals = np.array([d[t] for t in range(k)], dtype=float)
        order = vals.argsort(kind="stable")
        ranks = np.empty(k)
        i = 0
        while i < k:
            j = i
            while j + 1 < k and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        l_sum += (np.arange(1, k + 1) * ranks).sum()
    mu = n * k * (k + 1) ** 2 / 4
    var = n * k ** 2 * (k + 1) * (k ** 2 - 1) / 144
    assert row["l_stat"] == pytest.approx(l_sum, rel=1e-12)
    assert row["mu_l"] == pytest.approx(mu, rel=1e-12)
    assert row["z"] == pytest.approx((l_sum - mu) / math.sqrt(var),
                                     rel=1e-10)
    assert row["z"] > 3  # increasing-in-treatment trend detected


def test_cohens_d_brute(spark):
    from hiselspark.operators.rankstats import cohens_d
    rng = _rng(23)
    n = 400
    f = rng.integers(0, 2, n)
    v = rng.integers(0, 100, n) + f * 25
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(f, v)], ["f", "v"])
    row = cohens_d(df, "f", "v").collect()[0]
    v1, v0 = v[f == 1].astype(float), v[f == 0].astype(float)
    sp2 = (((len(v1) - 1) * v1.var(ddof=1)
            + (len(v0) - 1) * v0.var(ddof=1))
           / (len(v1) + len(v0) - 2))
    d = (v1.mean() - v0.mean()) / math.sqrt(sp2)
    g = d * (1 - 3 / (4 * n - 9))
    assert row["n1"] == len(v1) and row["n0"] == len(v0)
    assert row["var_pooled"] == pytest.approx(sp2, rel=1e-12)
    assert row["cohens_d"] == pytest.approx(d, rel=1e-12)
    assert row["hedges_g"] == pytest.approx(g, rel=1e-12)
    assert 0.5 < row["cohens_d"] < 1.5  # planted shift ~0.86 sd


def test_somers_d_brute(spark):
    from hiselspark.operators.rankstats import somers_d
    rng = _rng(29)
    n = 500
    x = rng.integers(0, 8, n)
    y = np.minimum(x + rng.integers(0, 4, n), 9)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], ["x", "y"])
    row = somers_d(df, "x", "y").collect()[0]
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = x[i] - x[j]
            dy = y[i] - y[j]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    n0 = n * (n - 1) // 2
    assert row["concordant"] == conc and row["discordant"] == disc
    assert row["d_yx"] == pytest.approx((conc - disc) / (n0 - tx),
                                        rel=1e-12)
    assert row["d_xy"] == pytest.approx((conc - disc) / (n0 - ty),
                                        rel=1e-12)
    assert row["d_yx"] > 0.5  # planted monotone link


def test_somers_d_binary_equals_2auc_minus_1(spark):
    from hiselspark.operators.rankstats import somers_d
    rng = _rng(31)
    n = 300
    score = rng.integers(0, 50, n)
    label = (rng.random(n) < (score / 60)).astype(int)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(score, label)],
        ["x", "y"])
    row = somers_d(df, "x", "y").collect()[0]
    # brute AUC with tie-half-credit
    pos = score[label == 1]
    neg = score[label == 0]
    wins = sum((p > q) + 0.5 * (p == q)
               for p in pos for q in neg)
    auc = wins / (len(pos) * len(neg))
    assert row["d_xy"] == pytest.approx(2 * auc - 1, rel=1e-10)


def test_hellinger_tv_brute(spark):
    from pyspark.sql import functions as F
    from hiselspark.operators.drift import hellinger_drift, tv_drift
    rng = _rng(37)
    n = 600
    ref = rng.integers(0, 2, n)
    # drifted: current skews to higher buckets
    b = np.where(ref == 1, rng.integers(0, 6, n),
                 rng.integers(2, 8, n))
    df = spark.createDataFrame(
        [(int(x), int(r)) for x, r in zip(b, ref)], ["bucket", "r"])
    h = hellinger_drift(df, [], "bucket",
                        F.col("r") == 1).collect()[0]
    t = tv_drift(df, [], "bucket", F.col("r") == 1).collect()[0]
    bref = b[ref == 1]
    bcur = b[ref == 0]
    doms = sorted(set(b.tolist()))
    p = np.array([(bref == d).mean() for d in doms])
    q = np.array([(bcur == d).mean() for d in doms])
    bc = float(np.sqrt(p * q).sum())
    assert h["n_ref"] == len(bref) and h["n_cur"] == len(bcur)
    assert h["bc"] == pytest.approx(bc, rel=1e-12)
    assert h["hellinger"] == pytest.approx(
        math.sqrt(max(0.0, 1 - bc)), rel=1e-12)
    tv = 0.5 * float(np.abs(p - q).sum())
    assert t["tv"] == pytest.approx(tv, rel=1e-12)
    assert 0.05 < t["tv"] < 1.0 and 0.02 < h["hellinger"] < 1.0


def test_g_test_equals_2n_mi(spark):
    from hiselspark.operators.feature_rank import g_test
    rng = _rng(41)
    n = 500
    x = rng.integers(0, 5, n)
    y = (x + rng.integers(0, 3, n)) % 6
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], ["x", "y"])
    row = g_test(df, "x", "y").collect()[0]
    # brute G = 2 sum O ln(O n / (r c))
    g = 0.0
    for xv in set(x.tolist()):
        for yv in set(y.tolist()):
            o = int(((x == xv) & (y == yv)).sum())
            if o:
                r = int((x == xv).sum())
                c = int((y == yv).sum())
                g += 2 * o * math.log(o * n / (r * c))
    assert row["n"] == n and row["r"] == 5 and row["c"] == 6
    assert row["df"] == 20
    assert row["g_stat"] == pytest.approx(g, rel=1e-10)
    assert row["g_stat"] > 100  # the planted dependence is seen
    # constant x -> df 0 -> NULL
    df2 = spark.createDataFrame([(1, i % 3) for i in range(30)],
                                ["x", "y"])
    row2 = g_test(df2, "x", "y").collect()[0]
    assert row2["df"] == 0 and row2["g_stat"] is None


def test_durbin_watson_brute(spark):
    from hiselspark.operators.tsprofile import durbin_watson
    rng = _rng(43)
    rows = []
    series = {}
    for g in range(3):
        # g=0: smooth trend (DW small); g=2: alternating (DW large)
        if g == 0:
            v = np.cumsum(rng.integers(0, 4, 50))
        elif g == 1:
            v = rng.integers(0, 100, 50)
        else:
            v = np.array([100 * (i % 2) + int(r)
                          for i, r in enumerate(
                              rng.integers(0, 5, 50))])
        series[str(g)] = v
        rows += [(str(g), i, int(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, ["g", "o", "v"])
    out = {r["grp"]: r for r in
           durbin_watson(df, "g", "o", "v").collect()}
    for g, v in series.items():
        v = v.astype(float)
        num = float((np.diff(v) ** 2).sum())
        den = float(((v - v.mean()) ** 2).sum())
        assert out[g]["n"] == 50
        assert out[g]["dw"] == pytest.approx(num / den, rel=1e-12)
    assert out["0"]["dw"] < 1.0      # positive autocorrelation
    assert out["2"]["dw"] > 3.0      # alternating series


def test_runs_test_brute(spark):
    from hiselspark.operators.tsprofile import runs_test
    rng = _rng(47)
    v = rng.integers(0, 1000, 201)
    rows = [("a", i, int(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, ["g", "o", "v"])
    row = runs_test(df, "g", "o", "v").collect()[0]
    med = float(np.median(v))
    kept = [1 if x > med else -1 for x in v if x != med]
    n1 = sum(1 for s in kept if s == 1)
    n2 = len(kept) - n1
    runs = 1 + sum(1 for a, b2 in zip(kept, kept[1:]) if a != b2)
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
           / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["runs"] == runs
    assert row["z"] == pytest.approx((runs - mu) / math.sqrt(var),
                                     rel=1e-10)
    assert abs(row["z"]) < 3  # iid data: no runs anomaly
    # a perfectly alternating series is wildly non-random
    alt = [("b", i, i % 2 * 100) for i in range(100)]
    row2 = runs_test(spark.createDataFrame(alt, ["g", "o", "v"]),
                     "g", "o", "v").collect()[0]
    assert row2["runs"] == 100 and row2["z"] > 9


def test_grubbs_brute(spark):
    from hiselspark.operators.profile import grubbs_test
    rng = _rng(53)
    v = rng.integers(40, 60, 99).tolist() + [500]  # planted outlier
    rows = [("a", int(x)) for x in v]
    df = spark.createDataFrame(rows, ["g", "v"])
    row = grubbs_test(df, "g", "v").collect()[0]
    arr = np.array(v, dtype=float)
    g = float(np.abs(arr - arr.mean()).max() / arr.std(ddof=1))
    assert row["n"] == 100 and row["outlier_value"] == 500
    assert row["g_stat"] == pytest.approx(g, rel=1e-12)
    assert row["g_stat"] > 5
    # low-side outlier is found too
    rows2 = [("b", int(x)) for x in
             rng.integers(40, 60, 99).tolist() + [-400]]
    row2 = grubbs_test(spark.createDataFrame(rows2, ["g", "v"]),
                       "g", "v").collect()[0]
    assert row2["outlier_value"] == -400


def test_concentration_brute(spark):
    from hiselspark.operators.profile import concentration_profile
    rng = _rng(59)
    cats = rng.choice(["a", "b", "c", "d"], 500,
                      p=[0.55, 0.3, 0.1, 0.05])
    df = spark.createDataFrame(
        [("g1", str(c)) for c in cats], ["g", "c"])
    row = concentration_profile(df, "g", "c").collect()[0]
    _, counts = np.unique(cats, return_counts=True)
    p = counts / counts.sum()
    assert row["n"] == 500 and row["n_categories"] == 4
    assert row["hhi"] == pytest.approx(float((p ** 2).sum()),
                                       rel=1e-12)
    assert row["top_share"] == pytest.approx(float(p.max()),
                                             rel=1e-12)
    assert row["entropy"] == pytest.approx(
        float(-(p * np.log(p)).sum()), rel=1e-10)


def test_group_confusion_and_fairness_gaps_brute(spark):
    from hiselspark.operators.evaluate import (fairness_gaps,
                                               group_confusion)
    rng = _rng(61)
    n = 900
    g = rng.integers(0, 3, n)
    y = rng.integers(0, 2, n)
    # biased predictor: group 2 gets more positives regardless of y
    p = ((rng.random(n) < 0.3 + 0.25 * (g == 2) + 0.3 * y)
         .astype(int))
    df = spark.createDataFrame(
        [(str(a), int(b), int(c)) for a, b, c in zip(g, y, p)],
        ["g", "y", "p"])
    per = {r["grp"]: r for r in
           group_confusion(df, "g", "y", "p").collect()}
    rates = {}
    for gg in range(3):
        m = g == gg
        tp = int(((y == 1) & (p == 1) & m).sum())
        fp = int(((y == 0) & (p == 1) & m).sum())
        fn = int(((y == 1) & (p == 0) & m).sum())
        tn = int(((y == 0) & (p == 0) & m).sum())
        r = per[str(gg)]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp,
                                                        fn, tn)
        assert r["pos_rate"] == pytest.approx(
            (tp + fp) / m.sum(), rel=1e-12)
        assert r["tpr"] == pytest.approx(tp / (tp + fn), rel=1e-12)
        assert r["fpr"] == pytest.approx(fp / (fp + tn), rel=1e-12)
        rates[gg] = ((tp + fp) / m.sum(), tp / (tp + fn),
                     fp / (fp + tn))
    gaps = fairness_gaps(df, "g", "y", "p").collect()[0]
    prs = [r[0] for r in rates.values()]
    tprs = [r[1] for r in rates.values()]
    fprs = [r[2] for r in rates.values()]
    assert gaps["n_groups"] == 3
    assert gaps["dp_gap"] == pytest.approx(max(prs) - min(prs),
                                           rel=1e-12)
    assert gaps["di_ratio"] == pytest.approx(min(prs) / max(prs),
                                             rel=1e-12)
    assert gaps["eo_gap"] == pytest.approx(
        max(max(tprs) - min(tprs), max(fprs) - min(fprs)),
        rel=1e-12)
    assert gaps["dp_gap"] > 0.1  # the planted bias is surfaced


def test_sign_test_brute(spark):
    from hiselspark.operators.rankstats import sign_test
    rng = _rng(67)
    n = 300
    x = rng.integers(0, 50, n)
    y = x + rng.integers(-3, 6, n)  # y tends to beat x
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], ["x", "y"])
    row = sign_test(df, "x", "y").collect()[0]
    npos = int((x > y).sum())
    nneg = int((x < y).sum())
    assert row["n_pos"] == npos and row["n_neg"] == nneg
    assert row["n_tie"] == int((x == y).sum())
    nn = npos + nneg
    assert row["z"] == pytest.approx(
        (npos - nn / 2) / math.sqrt(nn / 4), rel=1e-12)
    assert row["z"] < -2  # x loses more often


def test_wilcoxon_signed_rank_brute(spark):
    from hiselspark.operators.rankstats import wilcoxon_signed_rank
    rng = _rng(71)
    n = 400
    x = rng.integers(0, 40, n)
    y = np.maximum(x + rng.integers(-2, 5, n), 0)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], ["x", "y"])
    row = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    d = (x - y)[x != y]
    a = np.abs(d)
    # average ranks of |d|
    order = np.sort(a)
    ranks = {}
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and order[j + 1] == order[i]:
            j += 1
        ranks[order[i]] = (i + j) / 2 + 1
        i = j + 1
    wplus = sum(ranks[abs(v)] for v in d if v > 0)
    nn = len(d)
    _, t = np.unique(a, return_counts=True)
    var = (nn * (nn + 1) * (2 * nn + 1) / 24
           - float((t ** 3 - t).sum()) / 48)
    z = (wplus - nn * (nn + 1) / 4) / math.sqrt(var)
    assert row["n_nonzero"] == nn
    assert row["n_zero"] == int((x == y).sum())
    assert row["w2_plus"] == int(round(2 * wplus))
    assert row["z"] == pytest.approx(z, rel=1e-10)
    assert row["z"] < -3  # y systematically larger


def test_kalman1d_brute(spark):
    from hiselspark.operators.tsprofile import kalman1d
    rng = _rng(73)
    v = np.cumsum(rng.normal(0, 1, 60)) + 50
    rows = [("a", i, float(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, ["e", "o", "v"])
    row = kalman1d(df, "e", "o", "v", q_var=1.0,
                   r_var=4.0).collect()[0]
    m, p = float(v[0]), 4.0
    k = 4.0 / 8.0
    for x in v[1:]:
        pp = p + 1.0
        k = pp / (pp + 4.0)
        m = m + k * (float(x) - m)
        p = (1.0 - k) * pp
    assert row["n"] == 60
    assert row["level"] == pytest.approx(m, rel=1e-14)
    assert row["p_var"] == pytest.approx(p, rel=1e-14)
    assert row["gain"] == pytest.approx(k, rel=1e-14)
    # level tracks the random walk closely
    assert abs(row["level"] - v[-1]) < 3.0
    # gain has converged to the steady state of q=1, r=4
    ss = ((1 + math.sqrt(1 + 16 / 1)) / 2) / \
         ((1 + math.sqrt(1 + 16 / 1)) / 2 + 4)
    assert row["gain"] == pytest.approx(ss, abs=1e-6)


def test_croston_brute(spark):
    from hiselspark.operators.tsprofile import croston
    # hand-built intermittent series: zeros then demands
    v = [0, 0, 4, 0, 0, 0, 6, 0, 2, 0]
    rows = [("s", i, float(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, ["e", "o", "v"])
    row = croston(df, "e", "o", "v", alpha=0.5).collect()[0]
    z, p, g, s = 0.0, 0.0, 0.0, 0
    for x in v:
        g += 1
        if x > 0:
            if s == 0:
                z, p, s = x, g, 1
            else:
                z = 0.5 * x + 0.5 * z
                p = 0.5 * g + 0.5 * p
            g = 0
    assert row["n"] == 10 and row["n_demand"] == 3
    assert row["z"] == pytest.approx(z, rel=1e-14)
    assert row["p"] == pytest.approx(p, rel=1e-14)
    assert row["forecast"] == pytest.approx(z / p, rel=1e-14)
    # all-zero series -> NULL forecast
    df2 = spark.createDataFrame(
        [("q", i, 0.0) for i in range(5)], ["e", "o", "v"])
    row2 = croston(df2, "e", "o", "v").collect()[0]
    assert row2["forecast"] is None and row2["n_demand"] == 0


def test_hosmer_lemeshow_brute(spark):
    from hiselspark.operators.evaluate import hosmer_lemeshow
    rng = _rng(79)
    n = 2000
    pm = rng.integers(0, 1001, n)  # per-mille probabilities
    y = (rng.random(n) < pm / 1000).astype(int)  # well-calibrated
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(pm, y)], ["pm", "y"])
    row = hosmer_lemeshow(df, "pm", "y", n_bins=10).collect()[0]
    # brute: same CDF binning
    import collections
    cnt = collections.Counter(pm.tolist())
    below = {}
    acc = 0
    for v in sorted(cnt):
        below[v] = acc
        acc += cnt[v]
    bins = collections.defaultdict(lambda: [0, 0, 0])
    for a, b in zip(pm, y):
        bb = (10 * below[int(a)]) // n
        bins[bb][0] += 1
        bins[bb][1] += int(b)
        bins[bb][2] += int(a)
    hl = 0.0
    ndeg = 0
    for bb, (nb, ob, spm) in bins.items():
        e = spm / 1000
        if e <= 0 or e >= nb:
            ndeg += 1
            continue
        hl += (ob - e) ** 2 / (e * (1 - e / nb))
    assert row["n"] == n and row["n_bins"] == len(bins)
    assert row["n_degenerate"] == ndeg
    assert row["hl_stat"] == pytest.approx(hl, rel=1e-10)
    # a well-calibrated model should not wildly exceed chi2(8)
    assert row["hl_stat"] < 40


def test_inequality_brute(spark):
    from hiselspark.operators.profile import inequality_profile
    rng = _rng(83)
    v = rng.lognormal(3, 1, 400).astype(int) + 1
    rows = ([("a", int(x)) for x in v]
            + [("a", 0), ("a", -5)])  # nonpositive dropped
    df = spark.createDataFrame(rows, ["g", "v"])
    row = inequality_profile(df, "g", "v").collect()[0]
    x = v.astype(float)
    mu = x.mean()
    theil = float((x / mu * np.log(x / mu)).mean())
    atk = 1 - float(np.exp(np.log(x).mean())) / mu
    assert row["n"] == 400 and row["n_nonpos"] == 2
    assert row["theil_t"] == pytest.approx(theil, rel=1e-10)
    assert row["atkinson"] == pytest.approx(atk, rel=1e-10)
    assert 0 < row["atkinson"] < 1 and row["theil_t"] > 0.1
    # perfectly equal values -> both indices 0
    df2 = spark.createDataFrame([("b", 7)] * 50, ["g", "v"])
    row2 = inequality_profile(df2, "g", "v").collect()[0]
    assert row2["theil_t"] == pytest.approx(0.0, abs=1e-12)
    assert row2["atkinson"] == pytest.approx(0.0, abs=1e-12)


def test_jonckheere_brute(spark):
    from hiselspark.operators.rankstats import jonckheere
    rng = _rng(89)
    rows = []
    data = {}
    for g in range(4):
        v = rng.integers(0, 30, 120) + g * 4  # planted upward trend
        data[g] = v
        rows += [(g, int(x)) for x in v]
    df = spark.createDataFrame(rows, ["g", "v"])
    row = jonckheere(df, "g", "v").collect()[0]
    j = 0.0
    for i in range(4):
        for jj in range(i + 1, 4):
            for xa in data[i]:
                j += float((data[jj] > xa).sum()) \
                     + 0.5 * float((data[jj] == xa).sum())
    n = 480
    sn2 = sum(len(v) ** 2 for v in data.values())
    sn23 = sum(len(v) ** 2 * (2 * len(v) + 3)
               for v in data.values())
    mu = (n ** 2 - sn2) / 4
    var = (n ** 2 * (2 * n + 3) - sn23) / 72
    assert row["k"] == 4 and row["n"] == n
    assert row["j2"] == int(round(2 * j))
    assert row["z"] == pytest.approx((j - mu) / math.sqrt(var),
                                     rel=1e-10)
    assert row["z"] > 5  # the planted trend is detected


def test_mood_median_brute(spark):
    from hiselspark.operators.rankstats import mood_median
    rng = _rng(97)
    rows = []
    allv = []
    for g in range(3):
        v = rng.integers(0, 100, 150) + g * 15
        rows += [(str(g), int(x)) for x in v]
        allv += v.tolist()
    df = spark.createDataFrame(rows, ["g", "v"])
    row = mood_median(df, "g", "v").collect()[0]
    med = float(np.median(allv))
    import collections
    per = collections.defaultdict(lambda: [0, 0])
    for g, v in rows:
        per[g][0] += 1
        per[g][1] += int(v > med)
    n = sum(a for a, _ in per.values())
    na = sum(b for _, b in per.values())
    chi2 = 0.0
    for g, (ni, ai) in per.items():
        ea = ni * na / n
        eb = ni * (n - na) / n
        chi2 += (ai - ea) ** 2 / ea + ((ni - ai) - eb) ** 2 / eb
    assert row["k"] == 3 and row["n"] == n and row["n_above"] == na
    assert row["chi2"] == pytest.approx(chi2, rel=1e-10)
    assert row["chi2"] > 15  # the planted shift is detected


def test_bartlett_brute(spark):
    from hiselspark.operators.evaluate import bartlett_test
    rng = _rng(101)
    rows = []
    groups = {}
    for g, scale in enumerate([5, 10, 20]):
        v = (rng.normal(50, scale, 200)).astype(int)
        groups[str(g)] = v
        rows += [(str(g), int(x)) for x in v]
    rows.append(("tiny", 7))  # n=1 group dropped
    df = spark.createDataFrame(rows, ["g", "v"])
    row = bartlett_test(df, "g", "v").collect()[0]
    k = 3
    n = 600
    ssw = sum((len(v) - 1) * v.var(ddof=1)
              for v in groups.values())
    sp2 = ssw / (n - k)
    t = (n - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(v.var(ddof=1))
        for v in groups.values())
    c = 1 + (sum(1 / (len(v) - 1) for v in groups.values())
             - 1 / (n - k)) / (3 * (k - 1))
    assert row["k"] == k and row["n"] == n
    assert row["n_dropped_groups"] == 1
    assert row["bartlett_stat"] == pytest.approx(t / c, rel=1e-10)
    assert row["bartlett_stat"] > 50  # unequal variances detected


def test_cochran_armitage_brute(spark):
    from hiselspark.operators.evaluate import cochran_armitage
    rng = _rng(103)
    n = 1200
    s = rng.integers(0, 5, n)
    y = (rng.random(n) < 0.15 + 0.12 * s).astype(int)  # dose trend
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(s, y)], ["s", "y"])
    row = cochran_armitage(df, "s", "y").collect()[0]
    pbar = y.mean()
    num = float((s * y).sum()) - pbar * float(s.sum())
    svar = float((s.astype(float) ** 2 * 1).sum()) \
        - float(s.sum()) ** 2 / n
    z = num / math.sqrt(pbar * (1 - pbar) * svar)
    assert row["k"] == 5 and row["n"] == n
    assert row["n_pos"] == int(y.sum())
    assert row["z"] == pytest.approx(z, rel=1e-10)
    assert row["z"] > 6  # the planted dose trend is detected


def test_clustering_coefficient_brute(spark):
    from hiselspark.operators.graph import clustering_coefficient
    rng = _rng(107)
    n_nodes = 40
    edges = set()
    while len(edges) < 150:
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    df = spark.createDataFrame(sorted(edges), ["src", "dst"])
    out = {r["node"]: r for r in
           clustering_coefficient(df, "src", "dst").collect()}
    adj = {i: set() for i in range(n_nodes)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for i in range(n_nodes):
        nb = sorted(adj[i])
        if not nb:
            assert i not in out
            continue
        tri = sum(1 for ai in range(len(nb))
                  for bi in range(ai + 1, len(nb))
                  if nb[bi] in adj[nb[ai]])
        r = out[i]
        assert r["degree"] == len(nb)
        assert r["triangles"] == tri
        if len(nb) >= 2:
            assert r["lcc"] == pytest.approx(
                2 * tri / (len(nb) * (len(nb) - 1)), rel=1e-12)
        else:
            assert r["lcc"] is None
    # a triangle graph: all lcc = 1
    df2 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    for r in clustering_coefficient(df2).collect():
        assert r["lcc"] == 1.0 and r["triangles"] == 1


def test_cronbach_alpha_brute(spark):
    from hiselspark.operators.evaluate import cronbach_alpha
    rng = _rng(109)
    n = 300
    latent = rng.integers(0, 10, n)
    items = [latent + rng.integers(0, 4, n) for _ in range(4)]
    rows = [tuple(int(it[i]) for it in items) for i in range(n)]
    rows.append((1, 2, None, 4))  # listwise-dropped row
    df = spark.createDataFrame(rows, ["i1", "i2", "i3", "i4"])
    row = cronbach_alpha(df, ["i1", "i2", "i3", "i4"]).collect()[0]
    mat = np.array(items, dtype=float)
    siv = sum(mat[j].var(ddof=1) for j in range(4))
    tv = mat.sum(axis=0).var(ddof=1)
    alpha = 4 / 3 * (1 - siv / tv)
    assert row["n"] == n and row["n_dropped"] == 1 and row["k"] == 4
    assert row["sum_item_var"] == pytest.approx(siv, rel=1e-12)
    assert row["total_var"] == pytest.approx(tv, rel=1e-12)
    assert row["alpha"] == pytest.approx(alpha, rel=1e-12)
    assert row["alpha"] > 0.6  # shared latent factor -> reliable


def test_dickey_fuller_brute(spark):
    from hiselspark.operators.tsprofile import dickey_fuller
    rng = _rng(113)
    # stationary AR(1): x_t = 0.5 x_{t-1} + e  -> strongly negative DF
    x = [0.0]
    for _ in range(199):
        x.append(0.5 * x[-1] + float(rng.integers(-40, 41)))
    v = [int(round(t)) for t in x]
    rows = [("a", i, vv) for i, vv in enumerate(v)]
    df = spark.createDataFrame(rows, ["g", "o", "v"])
    row = dickey_fuller(df, "g", "o", "v").collect()[0]
    xv = np.array(v[:-1], dtype=float)
    yv = np.diff(np.array(v, dtype=float))
    nn = len(xv)
    sxx = float(((xv - xv.mean()) ** 2).sum())
    sxy = float(((xv - xv.mean()) * (yv - yv.mean())).sum())
    syy = float(((yv - yv.mean()) ** 2).sum())
    b = sxy / sxx
    sse = syy - b * sxy
    stat = b / math.sqrt(sse / (nn - 2) / sxx)
    assert row["n_pairs"] == nn
    assert row["b"] == pytest.approx(b, rel=1e-10)
    assert row["df_stat"] == pytest.approx(stat, rel=1e-10)
    assert row["df_stat"] < -5  # stationarity strongly rejected root


def test_periodogram_power_brute(spark):
    from hiselspark.operators.tsprofile import periodogram_power
    rng = _rng(127)
    n = 200
    noise = rng.integers(-3, 4, n)
    period4 = np.array([10, 0, -10, 0] * (n // 4))
    v = (period4 + noise).astype(int)
    rows = [("a", i, int(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, ["g", "o", "v"])
    row = periodogram_power(df, "g", "o", "v").collect()[0]
    t = np.arange(n)
    a2 = int(((-1) ** t * v).sum())
    c4 = int((np.where(t % 4 == 0, v, 0)
              - np.where(t % 4 == 2, v, 0)).sum())
    s4 = int((np.where(t % 4 == 1, v, 0)
              - np.where(t % 4 == 3, v, 0)).sum())
    assert row["p2"] == a2 * a2
    assert row["p4"] == c4 * c4 + s4 * s4
    ssn = n * int((v.astype(object) ** 2).sum()) - int(v.sum()) ** 2
    assert row["ss2_num"] == ssn
    assert row["p4_share"] == pytest.approx(
        row["p4"] / (ssn / n), rel=1e-12)
    # the planted period-4 cycle dominates the Nyquist line
    assert row["p4_share"] > 10 * max(row["p2_share"], 1e-9)


def test_stream_kalman_equals_batch(spark, tmp_path):
    """AvailableNow-drained stream_kalman == the batch kalman1d fold,
    across TWO micro-batch files to exercise the state carry."""
    import datetime as dt
    import pandas as pd
    rng = _rng(131)
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), int(i % 3),
             int(rng.integers(0, 500))) for i in range(60)]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "cents"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = tmp_path / "src"
    src.mkdir()
    pdf.iloc[:30].to_parquet(src / "part-0.parquet", index=False)
    pdf.iloc[30:].to_parquet(src / "part-1.parquet", index=False)
    schema = spark.read.parquet(str(src)).schema
    from pyspark.sql import Window, functions as F
    from hiselspark.streaming.sessions import run_stream_to_batch
    from hiselspark.streaming.stateful import stream_kalman
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = run_stream_to_batch(
        stream_kalman(stream, "user_id", "ts", "cents", "event_id"),
        output_mode="update")
    w = Window.partitionBy("entity").orderBy(F.col("n_events").desc())
    fin = {r["entity"]: r for r in
           (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1).collect())}
    for u in (0, 1, 2):
        seq = pdf[pdf.user_id == u].sort_values(["ts", "event_id"])
        vals = seq.cents.astype(float).tolist()
        m, p, k = vals[0], 4.0, 0.5
        for x in vals[1:]:
            pp = p + 1.0
            k = pp / (pp + 4.0)
            m = m + k * (x - m)
            p = (1.0 - k) * pp
        assert fin[u]["n_events"] == len(vals)
        assert fin[u]["level"] == pytest.approx(m, rel=1e-14)
        assert fin[u]["p_var"] == pytest.approx(p, rel=1e-14)
        assert fin[u]["gain"] == pytest.approx(k, rel=1e-14)


def _raw_imgs_df(spark, n, w=8, h=8, mult=7919, step=31):
    import pandas as pd
    rows = []
    for k in range(n):
        i = np.arange(w * h * 3, dtype=np.int64)
        buf = ((k * mult + i * step) % 256).astype(np.uint8).tobytes()
        rows.append((k, w, h, "raw", buf))
    pdf = pd.DataFrame(rows, columns=["okey", "w", "h", "fmt",
                                      "bytes"])
    return spark.createDataFrame(pdf)


def test_glcm_brute(spark):
    from hiselspark.functions.image import with_glcm_stats
    df = _raw_imgs_df(spark, 6)
    out = {r["okey"]: r for r in with_glcm_stats(df).collect()}
    for k in range(6):
        i = np.arange(8 * 8 * 3, dtype=np.int64)
        px = ((k * 7919 + i * 31) % 256).reshape(8, 8, 3)
        g = px.sum(axis=2)
        q = (g * 8) // 766
        qa, qb = q[:, :-1], q[:, 1:]
        d = np.abs(qa - qb)
        r = out[k]
        assert r["glcm_pairs"] == 56
        assert r["glcm_contrast"] == int((d * d).sum())
        cnt = np.bincount((qa * 8 + qb).ravel(), minlength=64)
        assert r["glcm_energy_num"] == int((cnt.astype(int)**2).sum())
        assert r["glcm_hom840"] == int(
            sum(840 // (1 + dd) for dd in d.ravel()))


def test_projection_brute(spark):
    from hiselspark.functions.image import with_projection_stats
    df = _raw_imgs_df(spark, 6)
    out = {r["okey"]: r for r in with_projection_stats(df).collect()}
    for k in range(6):
        i = np.arange(8 * 8 * 3, dtype=np.int64)
        px = ((k * 7919 + i * 31) % 256).reshape(8, 8, 3)
        g = px.sum(axis=2)
        rr = g.sum(axis=1)
        cc = g.sum(axis=0)
        r = out[k]
        assert r["proj_total"] == int(g.sum())
        assert r["proj_row_ssq"] == int((rr * rr).sum())
        assert r["proj_col_ssq"] == int((cc * cc).sum())
        assert r["com_y_num"] == int((np.arange(8) * rr).sum())
        assert r["com_x_num"] == int((np.arange(8) * cc).sum())


def test_rbf_hsic_brute(spark):
    from hiselspark.operators.feature_rank import rbf_hsic_table
    rng = _rng(137)
    n = 600
    k = rng.integers(0, 48, n)
    x = k % 12
    y = k % 8  # shared mod-4 factor -> dependent
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], ["x", "y"])
    row = rbf_hsic_table(df, "x", "y").collect()[0]
    gx = gy = 1.0 / 128.0
    kx = np.exp(-gx * (x[:, None] - x[None, :]).astype(float) ** 2)
    ky = np.exp(-gy * (y[:, None] - y[None, :]).astype(float) ** 2)
    h = np.eye(n) - np.ones((n, n)) / n
    hsic = float(np.trace(kx @ h @ ky @ h)) / n ** 2
    assert row["n"] == n
    assert row["hsic"] == pytest.approx(hsic, rel=1e-9)
    # independent pairing -> much smaller HSIC
    y2 = rng.integers(0, 8, n)
    df2 = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y2)], ["x", "y"])
    row2 = rbf_hsic_table(df2, "x", "y").collect()[0]
    assert row2["hsic"] < row["hsic"] / 3


def test_mmd_rbf_brute(spark):
    from pyspark.sql import functions as F
    from hiselspark.operators.drift import mmd_rbf_drift
    rng = _rng(139)
    n = 800
    ref = rng.integers(0, 2, n)
    v = np.where(ref == 1, rng.integers(0, 20, n),
                 rng.integers(6, 30, n))  # shifted current
    df = spark.createDataFrame(
        [(int(a), int(r)) for a, r in zip(v, ref)], ["v", "r"])
    row = mmd_rbf_drift(df, "v", F.col("r") == 1).collect()[0]
    a = v[ref == 1].astype(float)
    b = v[ref == 0].astype(float)
    g = 1.0 / 128.0

    def s(u, w):
        return float(np.exp(-g * (u[:, None] - w[None, :]) ** 2)
                     .sum())

    mmd2 = (s(a, a) / len(a) ** 2 + s(b, b) / len(b) ** 2
            - 2 * s(a, b) / (len(a) * len(b)))
    assert row["n_ref"] == len(a) and row["n_cur"] == len(b)
    assert row["mmd2"] == pytest.approx(mmd2, rel=1e-9)
    assert row["mmd2"] > 0.003  # the planted shift is detected
    # identical populations -> tiny MMD
    df2 = spark.createDataFrame(
        [(int((x // 2) % 20), int(x % 2)) for x in range(400)],
        ["v", "r"])
    row2 = mmd_rbf_drift(df2, "v", F.col("r") == 1).collect()[0]
    assert abs(row2["mmd2"]) < 1e-9


def test_rolling_vwap_bollinger_rsi_brute(spark):
    import datetime as dt
    from hiselspark.operators.windows import (bollinger_bands,
                                              rolling_rsi,
                                              rolling_vwap)
    rng = _rng(149)
    base = dt.datetime(2024, 1, 1)
    n = 120
    ts = [base + dt.timedelta(seconds=int(s)) for s in
          np.cumsum(rng.integers(10, 120, n))]
    price = rng.integers(90, 120, n)
    vol = rng.integers(1, 50, n)
    rows = [("e", i, ts[i], int(price[i]), int(vol[i]))
            for i in range(n)]
    df = spark.createDataFrame(rows, ["e", "id", "ts", "p", "v"])
    W = 600.0

    out = {r["id"]: r for r in
           rolling_vwap(df, "e", "ts", "p", "v", W).collect()}
    bb = {r["id"]: r for r in
          bollinger_bands(df, "e", "ts", "p", W, 2).collect()}
    rs = {r["id"]: r for r in
          rolling_rsi(df, "e", "ts", "p", W, "id").collect()}
    tsec = np.array([(t - base).total_seconds() for t in ts])
    for i in range(n):
        m = (tsec >= tsec[i] - W) & (tsec <= tsec[i])
        pw, vw = price[m].astype(float), vol[m].astype(float)
        assert out[i]["roll_vwap"] == pytest.approx(
            float((pw * vw).sum() / vw.sum()), rel=1e-12)
        # bollinger
        nn = int(m.sum())
        if nn >= 2 and pw.var(ddof=1) > 0:
            z = (price[i] - pw.mean()) / (2 * pw.std(ddof=1))
            assert bb[i]["pct_b"] == pytest.approx(z, rel=1e-9)
            assert bb[i]["above_upper"] == bool(z > 1)
            assert bb[i]["below_lower"] == bool(z < -1)
        # rsi over window diffs (diff assigned to the later row)
        d = np.diff(price.astype(int))
        dmask = m[1:]  # diff i belongs to row i+1
        g = int(d[dmask][d[dmask] > 0].sum())
        ll = int(-d[dmask][d[dmask] < 0].sum())
        # row 0's diff is NULL->0; windows containing row 0 unaffected
        assert rs[i]["rsi_gain"] == g and rs[i]["rsi_loss"] == ll
        if g + ll > 0:
            assert rs[i]["rsi"] == pytest.approx(
                100 * g / (g + ll), rel=1e-12)


def test_competing_risks_brute(spark):
    from hiselspark.operators.survival import competing_risks
    rng = _rng(151)
    n = 500
    rows = [("c", int(d), int(e)) for d, e in
            zip(rng.integers(0, 12, n), rng.integers(0, 3, n))]
    df = spark.createDataFrame(rows, ["cohort", "dur", "cause"])
    out = {r["dur"]: r for r in
           competing_risks(df, "cohort", "dur", "cause").collect()}
    arr = np.array([(d, e) for _, d, e in rows])
    s, c1, c2 = 1.0, 0.0, 0.0
    for t in sorted(set(arr[:, 0])):
        at_risk = int((arr[:, 0] >= t).sum())
        d1 = int(((arr[:, 0] == t) & (arr[:, 1] == 1)).sum())
        d2 = int(((arr[:, 0] == t) & (arr[:, 1] == 2)).sum())
        c1 += s * d1 / at_risk
        c2 += s * d2 / at_risk
        s *= 1 - (d1 + d2) / at_risk
        r = out[t]
        assert r["n_at_risk"] == at_risk
        assert r["d1"] == d1 and r["d2"] == d2
        assert r["surv"] == pytest.approx(s, rel=1e-12)
        assert r["cif1"] == pytest.approx(c1, rel=1e-12)
        assert r["cif2"] == pytest.approx(c2, rel=1e-12)
        # partition of unity at every step
        assert r["surv"] + r["cif1"] + r["cif2"] == pytest.approx(
            1.0, abs=1e-12)


def test_rate_decomposition_brute(spark):
    from pyspark.sql import functions as F
    from hiselspark.operators.evaluate import rate_decomposition
    rng = _rng(157)
    n = 2000
    period = rng.integers(0, 2, n)  # 1 = reference
    seg = rng.integers(0, 5, n)
    # current period shifts mix toward segment 4 AND raises rates
    seg = np.where((period == 0) & (rng.random(n) < 0.3), 4, seg)
    y = (rng.random(n) < 0.2 + 0.05 * seg
         + 0.1 * (period == 0)).astype(int)
    df = spark.createDataFrame(
        [(int(s), int(a), int(r)) for s, a, r in zip(seg, y, period)],
        ["seg", "y", "r"])
    row = rate_decomposition(df, "seg", "y",
                             F.col("r") == 1).collect()[0]
    mix = rate = 0.0
    nr, nc = int((period == 1).sum()), int((period == 0).sum())
    for s in range(5):
        mr = (period == 1) & (seg == s)
        mc = (period == 0) & (seg == s)
        wr, wc = mr.sum() / nr, mc.sum() / nc
        rr = y[mr].mean() if mr.sum() else y[mc].mean()
        rc = y[mc].mean() if mc.sum() else rr
        mix += (wc - wr) * (rc + rr) / 2
        rate += (rc - rr) * (wc + wr) / 2
    delta = y[period == 0].mean() - y[period == 1].mean()
    assert row["n_ref"] == nr and row["n_cur"] == nc
    assert row["delta"] == pytest.approx(delta, rel=1e-12)
    assert row["mix_effect"] == pytest.approx(mix, rel=1e-10)
    assert row["rate_effect"] == pytest.approx(rate, rel=1e-10)
    # exact additivity of the symmetric decomposition
    assert row["mix_effect"] + row["rate_effect"] == pytest.approx(
        row["delta"], abs=1e-12)
    assert row["rate_effect"] > 0.05  # the planted rate lift


def test_by_adjust_brute(spark):
    from hiselspark.operators.drift import by_adjust
    rng = _rng(163)
    m = 40
    ps = np.concatenate([rng.random(30), rng.random(10) * 1e-4])
    df = spark.createDataFrame(
        [(f"h{i}", float(p)) for i, p in enumerate(ps)],
        ["key", "p"])
    out = {r["key"]: r for r in
           by_adjust(df, "key", "p", alpha=0.05).collect()}
    harm = sum(1 / i for i in range(1, m + 1))
    order = sorted(range(m), key=lambda i: (ps[i], f"h{i}"))
    kstar = 0
    for rank, i in enumerate(order, 1):
        if ps[i] <= rank * 0.05 / (m * harm):
            kstar = rank
    for rank, i in enumerate(order, 1):
        r = out[f"h{i}"]
        assert r["rank"] == rank and r["m"] == m
        assert r["by_threshold"] == pytest.approx(
            rank * 0.05 / (m * harm), rel=1e-12)
        assert r["reject"] == (rank <= kstar)
    # BY is more conservative than BH: rejects a subset
    from hiselspark.operators.drift import bh_adjust
    bh = {r["key"]: r["reject"] for r in
          bh_adjust(df, "key", "p", alpha=0.05).collect()}
    assert all(bh[k] for k, r in out.items() if r["reject"])
    assert sum(r["reject"] for r in out.values()) >= 5  # planted hits


def test_lexicon_sentiment_brute(spark):
    from hiselspark.functions.text import with_lexicon_sentiment
    rows = [
        (0, "This is a GOOD great day with no problem at all"),
        (1, "terrible awful bad bad experience"),
        (2, "neutral words only here"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r for r in
           with_lexicon_sentiment(df).collect()}
    assert out[0]["n_pos"] == 2 and out[0]["n_neg"] == 1
    assert out[0]["sentiment"] == pytest.approx(1 / 11)
    assert out[1]["n_pos"] == 0 and out[1]["n_neg"] == 4
    assert out[1]["sentiment"] == pytest.approx(-4 / 5)
    assert out[2]["sentiment"] == 0.0
    assert out[3]["sentiment"] is None and out[3]["n_tokens"] == 0


def test_rake_brute(spark):
    from hiselspark.functions.text import rake_keywords
    text = ("deep learning models and the gradient descent "
            "optimizer for deep networks")
    df = spark.createDataFrame([(1, text)], ["id", "t"])
    out = rake_keywords(df, "id", "t", top_k=10).collect()
    # phrases: "deep learning models" | "gradient descent optimizer"
    #          | "deep networks"
    by_phrase = {r["phrase"]: r for r in out}
    assert set(by_phrase) == {"deep learning models",
                              "gradient descent optimizer",
                              "deep networks"}
    # freq: deep=2 others=1; deg: deep = 3+2 = 5, learning=3,
    # models=3, gradient=3, descent=3, optimizer=3, networks=2
    s1 = 5 / 2 + 3 + 3       # deep learning models
    s2 = 3 + 3 + 3           # gradient descent optimizer
    s3 = 5 / 2 + 2           # deep networks
    assert by_phrase["deep learning models"]["score"] == \
        pytest.approx(s1, rel=1e-12)
    assert by_phrase["gradient descent optimizer"]["score"] == \
        pytest.approx(s2, rel=1e-12)
    assert by_phrase["deep networks"]["score"] == \
        pytest.approx(s3, rel=1e-12)
    ranks = {r["phrase"]: r["rank"] for r in out}
    assert ranks["gradient descent optimizer"] == 1  # 9 > 8.5 > 4.5
    assert ranks["deep learning models"] == 2
    assert ranks["deep networks"] == 3


def test_event_study_brute(spark):
    import datetime as dt
    from pyspark.sql import functions as F
    from hiselspark.operators.windows import event_study
    rng = _rng(167)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(3):
        t = 0
        for i in range(80):
            t += int(rng.integers(300, 2000))
            is_ev = (i % 17 == 5)
            # planted lift after events
            v = int(rng.integers(10, 30)) + (40 if i % 17 in
                                             (5, 6, 7) else 0)
            rows.append((u, base + dt.timedelta(seconds=t), v,
                         is_ev))
    df = spark.createDataFrame(rows, ["u", "ts", "v", "ev"])
    out = {r["bucket"]: r for r in
           event_study(df, "u", "ts", "v", F.col("ev"),
                       n_buckets=2, bucket_seconds=1800.0).collect()}
    # brute
    import collections
    per = collections.defaultdict(lambda: [0, 0])
    allv = [v for _, _, v, _ in rows]
    anchors = [(u, ts) for u, ts, _, e in rows if e]
    for u, ts, v, _ in rows:
        for au, ats in anchors:
            if au != u:
                continue
            off = (ts - ats).total_seconds()
            if -3600 <= off < 3600 + 1800:
                b = math.floor(off / 1800)
                per[b][0] += 1
                per[b][1] += v
    gmean = sum(allv) / len(allv)
    assert set(out) == set(per)
    for b, (n, sv) in per.items():
        assert out[b]["n"] == n and out[b]["sum_v"] == sv
        assert out[b]["abnormal"] == pytest.approx(
            sv / n - gmean, rel=1e-12)
    # the planted post-event lift shows up in buckets 0..1
    assert out[0]["abnormal"] > 5


def test_growth_accounting_brute(spark):
    import datetime as dt
    from hiselspark.operators.windows import growth_accounting
    base = dt.datetime(2024, 1, 1)
    # user: active periods (weeks)
    activity = {
        1: [0, 1, 2, 5],       # new@0, ret@1, ret@2, churn@3, res@5
        2: [1, 3],             # new@1, churn@2, res@3, churn@4
        3: [0, 1, 2, 3, 4, 5],  # always retained
    }
    rows = []
    for u, ps in activity.items():
        for p in ps:
            rows.append((u, base + dt.timedelta(weeks=p, hours=u)))
    df = spark.createDataFrame(rows, ["u", "ts"])
    out = {r["period"]: r for r in
           growth_accounting(df, "u", "ts",
                             period_seconds=86400.0 * 7).collect()}
    p0 = min(out)  # epoch week offset
    def g(p):
        return out[p0 + p]
    assert g(0)["n_new"] == 2 and g(0)["n_active"] == 2
    assert g(1)["n_new"] == 1 and g(1)["n_retained"] == 2
    assert g(2)["n_retained"] == 2 and g(2)["n_churned"] == 1
    assert g(3)["n_resurrected"] == 1 and g(3)["n_churned"] == 1
    assert g(4)["n_churned"] == 1 and g(4)["n_active"] == 1
    assert g(5)["n_resurrected"] == 1 and g(5)["n_retained"] == 1
    # identities
    for p, r in out.items():
        assert r["n_active"] == (r["n_new"] + r["n_retained"]
                                 + r["n_resurrected"])


def test_hbos_brute(spark):
    from hiselspark.operators.profile import hbos_score
    rng = _rng(173)
    n = 400
    f1 = rng.integers(0, 100, n)
    f2 = rng.integers(0, 50, n)
    rows = [(i, int(a), int(b)) for i, (a, b) in
            enumerate(zip(f1, f2))]
    rows.append((n, 9999, 9999))  # planted outlier
    df = spark.createDataFrame(rows, ["id", "f1", "f2"])
    out = {r["id"]: r for r in
           hbos_score(df, "id", ["f1", "f2"], n_bins=10).collect()}
    # brute for one feature
    import collections

    def bins_of(vals):
        cnt = collections.Counter(vals)
        below, acc = {}, 0
        for v in sorted(cnt):
            below[v] = acc
            acc += cnt[v]
        bb = {v: (10 * below[v]) // len(vals) for v in cnt}
        cnts = collections.Counter()
        lo, hi = {}, {}
        for v, c in cnt.items():
            b = bb[v]
            cnts[b] += c
            lo[b] = min(lo.get(b, v), v)
            hi[b] = max(hi.get(b, v), v)
        dens = {b: cnts[b] / (hi[b] - lo[b] + 1) for b in cnts}
        return bb, dens

    vals1 = [r[1] for r in rows]
    vals2 = [r[2] for r in rows]
    b1, d1 = bins_of(vals1)
    b2, d2 = bins_of(vals2)
    m1, m2 = max(d1.values()), max(d2.values())
    for i, a, b in rows:
        exp = (math.log(m1 / d1[b1[a]]) + math.log(m2 / d2[b2[b]]))
        assert out[i]["hbos"] == pytest.approx(exp, rel=1e-12)
    # the planted outlier scores at the maximum (it shares its
    # sparse top bin with the stretched decile — bin-resolution
    # flagging is the documented HBOS contract)
    mx = max(r["hbos"] for r in out.values())
    assert out[n]["hbos"] == pytest.approx(mx, rel=1e-12)
    assert out[n]["hbos"] > out[0]["hbos"] + 1.0


def test_mahalanobis2_brute(spark):
    from hiselspark.operators.profile import mahalanobis2
    rng = _rng(179)
    n = 300
    x = rng.integers(0, 50, n)
    y = 2 * x + rng.integers(-5, 6, n)  # correlated
    rows = [(i, int(a), int(b)) for i, (a, b) in
            enumerate(zip(x, y))]
    rows.append((n, 50, 0))  # violates the correlation
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = {r["id"]: r for r in
           mahalanobis2(df, "id", "x", "y").collect()}
    xs = np.array([r[1] for r in rows], dtype=float)
    ys = np.array([r[2] for r in rows], dtype=float)
    cov = np.cov(np.vstack([xs, ys]))
    inv = np.linalg.inv(cov)
    for i, a, b in rows:
        dv = np.array([a - xs.mean(), b - ys.mean()])
        exp = float(dv @ inv @ dv)
        assert out[i]["d2"] == pytest.approx(exp, rel=1e-9)
    # the anti-correlated point dominates
    top = sorted(out.values(), key=lambda r: -r["d2"])[0]
    assert top["id"] == n


def test_js_encode_brute(spark):
    from hiselspark.operators.encoding import js_encode
    rng = _rng(181)
    cats = ["a"] * 200 + ["b"] * 50 + ["c"] * 2
    y = ([int(v) for v in rng.normal(100, 10, 200)]
         + [int(v) for v in rng.normal(140, 10, 50)]
         + [118, 122])
    rows = [(i, c, v) for i, (c, v) in enumerate(zip(cats, y))]
    rows.append((len(rows), "a", None))  # inference row
    df = spark.createDataFrame(rows, ["id", "cat", "y"])
    out = {r["id"]: r for r in js_encode(df, "id", "cat",
                                         "y").collect()}
    arr = {c: np.array([v for cc, v in zip(cats, y) if cc == c],
                       dtype=float) for c in "abc"}
    nn = len(y)
    k = 3
    gmean = sum(y) / nn
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arr.values())
    s2 = ssw / (nn - k)
    means = {c: a.mean() for c, a in arr.items()}
    tau2 = max(0.0, sum((m - gmean) ** 2 for m in means.values())
               / (k - 1))
    for i, c, v in rows:
        se2 = s2 / len(arr[c])
        bb = se2 / (se2 + tau2)
        exp = (1 - bb) * means[c] + bb * gmean
        r = out[i]
        assert r["n_c"] == len(arr[c])
        assert r["b_shrink"] == pytest.approx(bb, rel=1e-9)
        assert r["js"] == pytest.approx(exp, rel=1e-9)
    # rare category shrinks much harder than the common one
    assert (out[251]["b_shrink"] > 5 * out[0]["b_shrink"])
    # inference row got the encode
    assert out[len(rows) - 1]["js"] is not None


def test_two_prop_test_brute(spark):
    from hiselspark.operators.evaluate import two_prop_test
    rows = ([(1, 1)] * 120 + [(1, 0)] * 280
            + [(0, 1)] * 80 + [(0, 0)] * 320)
    df = spark.createDataFrame(rows, ["f", "y"])
    row = two_prop_test(df, "f", "y").collect()[0]
    p1, p0 = 120 / 400, 80 / 400
    pp = 200 / 800
    z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / 400 + 1 / 400))
    assert (row["n1"], row["x1"], row["n0"], row["x0"]) == \
        (400, 120, 400, 80)
    assert row["z"] == pytest.approx(z, rel=1e-12)

    def wilson(p, n):
        zc = 1.96
        den = 1 + zc * zc / n
        ctr = p + zc * zc / (2 * n)
        rad = zc * math.sqrt(p * (1 - p) / n
                             + zc * zc / (4 * n * n))
        return (ctr - rad) / den, (ctr + rad) / den

    lo, hi = wilson(p1, 400)
    assert row["p1_lo"] == pytest.approx(lo, rel=1e-12)
    assert row["p1_hi"] == pytest.approx(hi, rel=1e-12)
    assert row["p1_lo"] < p1 < row["p1_hi"]
    assert row["z"] > 3  # 30% vs 20% on 400/arm


def test_poisson_rate_test_brute(spark):
    from hiselspark.operators.evaluate import poisson_rate_test
    rows = [(1, 30, 1000), (1, 25, 900), (0, 20, 2000),
            (0, 15, 1800)]
    df = spark.createDataFrame(rows, ["f", "x", "e"])
    row = poisson_rate_test(df, "f", "x", "e").collect()[0]
    rr = (55 / 1900) / (35 / 3800)
    z = math.log(rr) / math.sqrt(1 / 55 + 1 / 35)
    assert (row["x1"], row["e1"], row["x0"], row["e0"]) == \
        (55, 1900, 35, 3800)
    assert row["rr"] == pytest.approx(rr, rel=1e-12)
    assert row["z"] == pytest.approx(z, rel=1e-12)
    assert row["rr"] > 2  # treated rate is ~3x


def test_holm_adjust_brute(spark):
    from hiselspark.operators.drift import holm_adjust
    ps = [0.001, 0.010, 0.014, 0.2, 0.6]
    df = spark.createDataFrame(
        [(f"h{i}", p) for i, p in enumerate(ps)], ["key", "p"])
    out = {r["key"]: r for r in
           holm_adjust(df, "key", "p", alpha=0.05).collect()}
    # thresholds: .05/5=.01, .05/4=.0125, .05/3=.0167, .05/2, .05
    # step-down: h0 rejects (.001<=.01), h1 rejects (.01<=.0125),
    # h2 rejects (.014<=.0167), h3 fails (.2>.025) -> stop
    assert out["h0"]["reject"] and out["h1"]["reject"]
    assert out["h2"]["reject"]
    assert not out["h3"]["reject"] and not out["h4"]["reject"]
    assert out["h1"]["holm_threshold"] == pytest.approx(0.0125)
    # compare: plain step-up at rank 2 would also pass; the stop rule
    # is what makes it Holm — verify a gap case
    ps2 = [0.001, 0.04, 0.012]
    df2 = spark.createDataFrame(
        [(f"g{i}", p) for i, p in enumerate(ps2)], ["key", "p"])
    out2 = {r["key"]: r for r in
            holm_adjust(df2, "key", "p", alpha=0.05).collect()}
    # sorted: .001 (thr .0167 ok), .012 (thr .025 ok), .04 (thr .05 ok)
    assert all(r["reject"] for r in out2.values())


def test_chao1_brute(spark):
    from hiselspark.functions.text import chao1_richness
    docs = [
        (0, "alpha beta gamma alpha"),
        (1, "beta delta epsilon"),
        (2, "zeta eta theta THETA"),
    ]
    df = spark.createDataFrame(docs, ["id", "text"])
    row = chao1_richness(df, "text").collect()[0]
    # counts: alpha2 beta2 gamma1 delta1 epsilon1 zeta1 eta1 theta2
    assert row["n_tokens"] == 11 and row["s_observed"] == 8
    assert row["f1"] == 5 and row["f2"] == 3
    assert row["chao1"] == pytest.approx(8 + 5 * 4 / (2 * 4),
                                         rel=1e-12)


def test_lincoln_petersen_brute(spark):
    from hiselspark.operators.dedup import lincoln_petersen
    rng = _rng(191)
    pop = list(range(1000))
    a = rng.choice(pop, 300, replace=False)
    b = rng.choice(pop, 250, replace=False)
    da = spark.createDataFrame([(int(x),) for x in a], ["k"])
    db = spark.createDataFrame([(int(x),) for x in b], ["k"])
    row = lincoln_petersen(da, db, "k").collect()[0]
    m = len(set(a.tolist()) & set(b.tolist()))
    nhat = (301 * 251) / (m + 1) - 1
    assert row["n_a"] == 300 and row["n_b"] == 250
    assert row["n_overlap"] == m
    assert row["n_hat"] == pytest.approx(nhat, rel=1e-12)
    # the estimate recovers the true population within ~25%
    assert 700 < row["n_hat"] < 1400


def test_qini_brute(spark):
    from pyspark.sql import functions as F
    from hiselspark.operators.evaluate import qini_curve
    rng = _rng(193)
    n = 1000
    score = rng.integers(0, 1000, n)
    t = rng.integers(0, 2, n)
    # true uplift increasing in score
    y = (rng.random(n) < (0.1 + 0.4 * (score / 1000) * t
                          + 0.1 * (score / 1000))).astype(int)
    rows = [(i, int(s), int(tt), int(yy))
            for i, (s, tt, yy) in enumerate(zip(score, t, y))]
    df = spark.createDataFrame(rows, ["id", "s", "t", "y"])
    out = {r["bucket"]: r for r in
           qini_curve(df, "s", F.col("t") == 1, "y", "id",
                      n_buckets=10).collect()}
    order = sorted(range(n), key=lambda i: (-score[i], i))
    # ntile split
    sizes = [(n + 9) // 10 if b < n % 10 else n // 10
             for b in range(10)] if n % 10 else [n // 10] * 10
    pos = 0
    cnt = cnc = crt = crc = 0
    tnt = int(t.sum())
    tnc = n - tnt
    trt = int(y[t == 1].sum())
    trc = int(y[t == 0].sum())
    qtot = trt - trc * tnt / tnc
    for b in range(10):
        for i in order[pos:pos + sizes[b]]:
            if t[i]:
                cnt += 1
                crt += int(y[i])
            else:
                cnc += 1
                crc += int(y[i])
        pos += sizes[b]
        r = out[b + 1]
        assert (r["cn_t"], r["cn_c"], r["cr_t"], r["cr_c"]) == \
            (cnt, cnc, crt, crc)
        q = crt - crc * cnt / cnc
        rand = qtot * (cnt + cnc) / n
        assert r["qini"] == pytest.approx(q, rel=1e-12)
        assert r["random_line"] == pytest.approx(rand, rel=1e-12)
    # model beats random in the upper buckets
    assert sum(out[b]["gap"] for b in range(1, 11)) > 5


def test_partial_corr_brute(spark):
    from hiselspark.operators.feature_rank import partial_corr
    rng = _rng(197)
    n = 500
    z = rng.integers(0, 50, n)
    x = 2 * z + rng.integers(0, 10, n)   # both driven by z
    y = 3 * z + rng.integers(0, 15, n)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x, y, z)],
        ["x", "y", "z"])
    row = partial_corr(df, "x", "y", "z").collect()[0]

    def r(a, b):
        return float(np.corrcoef(a, b)[0, 1])

    rxy, rxz, ryz = r(x, y), r(x, z), r(y, z)
    pc = (rxy - rxz * ryz) / math.sqrt((1 - rxz ** 2)
                                       * (1 - ryz ** 2))
    assert row["r_xy"] == pytest.approx(rxy, rel=1e-10)
    assert row["r_xy_z"] == pytest.approx(pc, rel=1e-10)
    # the raw correlation is spurious; conditioning kills it
    assert row["r_xy"] > 0.8 and abs(row["r_xy_z"]) < 0.2


def test_covariate_balance_brute(spark):
    from hiselspark.operators.causal import covariate_balance
    rng = _rng(199)
    n = 600
    t = rng.integers(0, 2, n)
    c1 = rng.integers(0, 100, n) + 20 * t     # imbalanced
    c2 = rng.integers(0, 100, n)              # balanced
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(t, c1, c2)],
        ["t", "c1", "c2"])
    out = {r["covariate"]: r for r in
           covariate_balance(df, "t", ["c1", "c2"]).collect()}
    for name, arr in [("c1", c1), ("c2", c2)]:
        a1 = arr[t == 1].astype(float)
        a0 = arr[t == 0].astype(float)
        smd = (a1.mean() - a0.mean()) / math.sqrt(
            (a1.var(ddof=1) + a0.var(ddof=1)) / 2)
        r = out[name]
        assert r["n1"] == len(a1) and r["n0"] == len(a0)
        assert r["smd"] == pytest.approx(smd, rel=1e-10)
    assert abs(out["c1"]["smd"]) > 0.5   # planted imbalance
    assert abs(out["c2"]["smd"]) < 0.15  # balanced covariate
    assert out["c1"]["ord"] == 0 and out["c2"]["ord"] == 1


def test_markov_entropy_rate_brute(spark):
    from hiselspark.operators.hmm import markov_entropy_rate
    rng = _rng(211)
    # deterministic cycle -> entropy rate 0
    det = [("d", i, ["a", "b", "c"][i % 3]) for i in range(90)]
    row0 = markov_entropy_rate(
        spark.createDataFrame(det, ["e", "o", "s"]),
        "e", "o", "s").collect()[0]
    assert row0["entropy_rate"] == pytest.approx(0.0, abs=1e-12)
    # random iid uniform over 3 states -> rate near ln 3
    rnd = [("r", i, ["a", "b", "c"][int(rng.integers(0, 3))])
           for i in range(3000)]
    row1 = markov_entropy_rate(
        spark.createDataFrame(rnd, ["e", "o", "s"]),
        "e", "o", "s").collect()[0]
    # brute
    import collections
    seq = [s for _, _, s in rnd]
    cells = collections.Counter(zip(seq[:-1], seq[1:]))
    cf = collections.Counter(seq[:-1])
    nn = len(seq) - 1
    h = sum(c / nn * math.log(cf[f] / c)
            for (f, _), c in cells.items())
    assert row1["n_transitions"] == nn
    assert row1["entropy_rate"] == pytest.approx(h, rel=1e-10)
    assert abs(row1["entropy_rate"] - math.log(3)) < 0.05
