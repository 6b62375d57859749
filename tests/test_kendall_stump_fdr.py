"""kendall_tau / stump_split / bh_adjust vs brute-force references."""
import itertools
import math
from collections import Counter

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_kendall_brute(spark):
    rng = np.random.default_rng(43)
    x = rng.integers(0, 12, 400)
    y = (x * 3 + rng.integers(0, 9, 400)) % 15
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "x long, y long")
    from hiselspark.operators.rankstats import kendall_tau
    out = kendall_tau(df, "x", "y").collect()[0]
    conc = disc = 0
    pts = list(zip(x.tolist(), y.tolist()))
    for (a1, b1), (a2, b2) in itertools.combinations(pts, 2):
        s = (a1 - a2) * (b1 - b2)
        conc += s > 0
        disc += s < 0
    n = len(pts)
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in Counter(x.tolist()).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y.tolist()).values())
    assert out["concordant"] == conc and out["discordant"] == disc
    assert out["n_pairs"] == n0
    assert out["tau_b"] == pytest.approx(
        (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2)), rel=1e-12)


def test_kendall_perfect_and_constant(spark):
    rows = [(i, 2 * i) for i in range(60)]
    df = spark.createDataFrame(rows, "x long, y long")
    from hiselspark.operators.rankstats import kendall_tau
    assert kendall_tau(df, "x", "y").collect()[0]["tau_b"] == \
        pytest.approx(1.0)
    dfc = spark.createDataFrame([(i, 7) for i in range(60)],
                                "x long, y long")
    assert kendall_tau(dfc, "x", "y").collect()[0]["tau_b"] is None


def _entropy(counts):
    n = sum(counts)
    return -sum(c / n * math.log(c / n) for c in counts if c > 0)


def test_stump_brute(spark):
    rng = np.random.default_rng(47)
    x = rng.integers(0, 20, 600)
    y = ((x > 11).astype(int) + (rng.random(600) < 0.15)) % 2
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "x long, y long")
    from hiselspark.operators.rankstats import stump_split
    out = stump_split(df, "x", "y").collect()[0]
    xs, ys = x.tolist(), y.tolist()
    n = len(xs)
    hp = _entropy(list(Counter(ys).values()))
    best = None
    for t in sorted(set(xs))[:-1]:
        left = [yy for xx, yy in zip(xs, ys) if xx <= t]
        right = [yy for xx, yy in zip(xs, ys) if xx > t]
        gain = (hp - len(left) / n
                * _entropy(list(Counter(left).values()))
                - len(right) / n
                * _entropy(list(Counter(right).values())))
        if best is None or gain > best[0] + 1e-15:
            best = (gain, t, len(left))
    assert out["threshold"] == best[1]
    assert out["n_left"] == best[2]
    assert out["h_parent"] == pytest.approx(hp, rel=1e-9)
    assert out["gain"] == pytest.approx(best[0], rel=1e-9)
    assert out["threshold"] == 11  # recovers the planted split


def test_bh_adjust_brute(spark):
    ps = [0.001, 0.012, 0.014, 0.019, 0.022, 0.31, 0.42, 0.54,
          0.62, 0.77]
    rows = [(f"h{i:02d}", p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "key string, p double")
    from hiselspark.operators.drift import bh_adjust
    out = {r["key"]: r for r in
           bh_adjust(df, "key", "p", alpha=0.05).collect()}
    m = len(ps)
    kstar = max((i + 1 for i, p in enumerate(sorted(ps))
                 if p <= (i + 1) * 0.05 / m), default=0)
    for i, p in enumerate(ps):
        r = out[f"h{i:02d}"]
        rank = sorted(ps).index(p) + 1
        assert r["rank"] == rank and r["m"] == m
        assert r["reject"] == (rank <= kstar)
    # the classic BH step-up behavior: rank 2 (p=0.012 > 2*a/m=0.01)
    # is STILL rejected because rank 5 clears its threshold
    assert kstar == 5
    assert out["h01"]["reject"] is True
    assert out["h04"]["reject"] is True
    assert out["h05"]["reject"] is False


def test_bh_no_rejections(spark):
    df = spark.createDataFrame(
        [(f"h{i}", 0.5 + i / 100) for i in range(5)],
        "key string, p double")
    from hiselspark.operators.drift import bh_adjust
    out = bh_adjust(df, "key", "p", alpha=0.05).collect()
    assert all(r["reject"] is False for r in out)


def test_ks_drift_fdr_end_to_end(spark):
    rng = np.random.default_rng(53)
    n = 2000
    ref = rng.integers(0, 2, n).astype(bool)
    drifted = np.where(ref, rng.integers(0, 10, n),
                       rng.integers(3, 13, n))
    stable = rng.integers(0, 10, n)
    df = spark.createDataFrame(
        [(int(d), int(s), bool(r))
         for d, s, r in zip(drifted, stable, ref)],
        "f_drift long, f_stable long, ref boolean")
    from hiselspark.operators.drift import ks_drift_fdr
    out = {r["key"]: r for r in
           ks_drift_fdr(df, ["f_drift", "f_stable"],
                        F.col("ref"), alpha=0.05).collect()}
    assert out["f_drift"]["reject"] is True
    assert out["f_stable"]["reject"] is False
    assert out["f_drift"]["p"] < 0.001 < out["f_stable"]["p"]
