"""trend: Mann-Kendall and Theil-Sen vs brute-force pairwise loops."""
import datetime as dt
import itertools
import math
from collections import Counter

import pytest

from hiselspark.operators.trend import mann_kendall, theil_sen

BASE = dt.datetime(2024, 1, 1)


def _mk_brute(seq):
    """seq: list of (t_us, v) in (t, o) order."""
    S = sum((v2 > v1) - (v2 < v1)
            for (_, v1), (_, v2) in itertools.combinations(seq, 2))
    n = len(seq)
    tie = sum(t * (t - 1) * (2 * t + 5)
              for t in Counter(v for _, v in seq).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie
    if S == 0 or var18 <= 0:
        z = 0.0
    else:
        z = (S - (1 if S > 0 else -1)) / math.sqrt(var18 / 18.0)
    return S, var18, z


def _ts_brute(seq):
    slopes = sorted((v2 - v1) * 1_000_000.0 / (t2 - t1)
                    for (t1, v1), (t2, v2)
                    in itertools.combinations(seq, 2) if t2 != t1)
    m = len(slopes)
    if m == 0:
        return 0, None
    med = (slopes[m // 2] if m % 2 == 1
           else (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0)
    return m, med


def _frame(spark):
    # entity 10: rising; 20: ties in value AND one timestamp tie;
    # 30: single row; 40: more rows than last_k (truncation)
    rows = []
    specs = {
        10: [(0, 1), (3, 2), (9, 5), (11, 4), (20, 9)],
        20: [(0, 5), (2, 5), (2, 7), (8, 5), (13, 1), (21, 7)],
        30: [(4, 3)],
        40: [(i, (i * 7 + 3) % 11) for i in range(12)],
    }
    oid = 0
    for ent, seq in specs.items():
        for sec, v in seq:
            rows.append((ent, BASE + dt.timedelta(seconds=sec), oid, v))
            oid += 1
    df = spark.createDataFrame(
        rows, "entity int, ts timestamp, oid long, val long")
    return df, specs


def _tail(seq, k):
    """trailing k of (sec, v) in (t, insertion-order) — insertion
    order IS the oid order here."""
    return seq[-k:] if len(seq) > k else seq


def test_mann_kendall_matches_brute(spark):
    df, specs = _frame(spark)
    out = {r["entity"]: r for r in
           mann_kendall(df, "entity", "ts", "oid", "val",
                        last_k=8).collect()}
    for ent, seq in specs.items():
        tail = _tail(seq, 8)
        us = [(s * 1_000_000, v) for s, v in tail]
        S, var18, z = _mk_brute(us)
        r = out[ent]
        assert r["n"] == len(tail)
        assert r["s_stat"] == S, ent
        assert r["var18"] == var18, ent
        assert r["z"] == pytest.approx(z, abs=1e-12)


def test_theil_sen_matches_brute(spark):
    df, specs = _frame(spark)
    out = {r["entity"]: r for r in
           theil_sen(df, "entity", "ts", "oid", "val",
                     last_k=8).collect()}
    for ent, seq in specs.items():
        tail = _tail(seq, 8)
        us = [(s * 1_000_000, v) for s, v in tail]
        m, med = _ts_brute(us)
        r = out[ent]
        assert r["n_pairs"] == m, ent
        if med is None:
            assert r["slope"] is None
        else:
            assert r["slope"] == pytest.approx(med, abs=1e-12)


def test_trend_validates_k(spark):
    df, _ = _frame(spark)
    with pytest.raises(ValueError):
        mann_kendall(df, "entity", "ts", "oid", "val", last_k=1)
    with pytest.raises(ValueError):
        theil_sen(df, "entity", "ts", "oid", "val", last_k=0)


def test_changepoint_matches_brute(spark):
    from hiselspark.operators.trend import changepoint_mean
    # entity 1: clear shift; entity 2: constant (gain 0 everywhere ->
    # smallest split wins); entity 3: n=2 minimal
    specs = {1: [1, 1, 2, 1, 9, 8, 9, 10],
             2: [4, 4, 4, 4, 4],
             3: [3, 7]}
    rows = []
    oid = 0
    for ent, vs in specs.items():
        for i, v in enumerate(vs):
            rows.append((ent, BASE + dt.timedelta(seconds=5 * i),
                         oid, v))
            oid += 1
    df = spark.createDataFrame(
        rows, "entity int, ts timestamp, oid long, val long")
    out = {r["entity"]: r for r in
           changepoint_mean(df, "entity", "ts", "oid",
                            "val").collect()}
    for ent, vs in specs.items():
        n, S = len(vs), sum(vs)
        best = None
        for t in range(1, n):
            sl = sum(vs[:t])
            g = sl * sl / t + (S - sl)**2 / (n - t) - S * S / n
            if best is None or g > best[0]:
                best = (g, t, sl)
        g, t, sl = best
        r = out[ent]
        assert r["n"] == n
        assert r["split_idx"] == t, (ent, r["split_idx"], t)
        assert r["gain"] == pytest.approx(g, abs=1e-9)
        assert r["left_mean"] == pytest.approx(sl / t, abs=1e-12)
        assert r["right_mean"] == pytest.approx((S - sl) / (n - t),
                                                abs=1e-12)
    # the planted shift in entity 1 is found at the boundary
    assert out[1]["split_idx"] == 4
