"""feature_rank: exact MI tables and greedy mRMR vs brute force."""
import math
from collections import Counter

import pytest

from hiselspark.operators.feature_rank import (
    info_gain_rank, mrmr_select, mutual_info_table, pairwise_mi)


def _mi_brute(xs, ys):
    # terms summed in sorted (x, y) order — the engine's fold order,
    # so near-tie greedy argmaxes resolve identically (float addition
    # is not associative; an arbitrary order lands 1 ulp away)
    n = len(xs)
    cxy = Counter(zip(xs, ys))
    cx, cy = Counter(xs), Counter(ys)
    acc = 0.0
    for (x, y), c in sorted(cxy.items()):
        acc += (c / n) * math.log(c * n / (cx[x] * cy[y]))
    return acc


def _frame(spark):
    rows = []
    for i in range(240):
        rows.append((i % 2, i % 3, (i // 3) % 4, (i * 7 + 1) % 5,
                     (i // 3) % 2))
    return spark.createDataFrame(rows, "a int, b int, c int, d int, y int")


def test_mutual_info_matches_brute_force(spark):
    df = _frame(spark)
    got = {r["feature"]: (r["n"], r["mi"])
           for r in info_gain_rank(df, ["a", "b", "c", "d"], "y").collect()}
    rows = df.collect()
    ys = [r["y"] for r in rows]
    for f in ["a", "b", "c", "d"]:
        xs = [r[f] for r in rows]
        n, mi = got[f]
        assert n == len(rows)
        assert mi == pytest.approx(_mi_brute(xs, ys), abs=1e-12)
    # c shares y's driver (i // 3) -> it must rank first
    ranks = {r["feature"]: r["rank"]
             for r in info_gain_rank(df, ["a", "b", "c", "d"], "y").collect()}
    assert ranks["c"] == 1


def test_mi_independent_and_identical_extremes(spark):
    df = _frame(spark)
    out = {(r["fa"], r["fb"]): r["mi"]
           for r in pairwise_mi(df, ["a", "b", "c"]).collect()}
    # a = i%2 and b = i%3 are independent over 240 = lcm-multiple rows
    assert out[("a", "b")] == pytest.approx(0.0, abs=1e-12)
    # MI(c, c-duplicate) = H(c) = ln 4 when c is uniform over 4 values
    dup = df.withColumn("c2", df["c"])
    mi_cc = mutual_info_table(dup, "c", "c2").collect()[0]["mi"]
    assert mi_cc == pytest.approx(math.log(4), abs=1e-12)


def test_mrmr_greedy_matches_reimplementation(spark):
    df = _frame(spark)
    feats = ["a", "b", "c", "d"]
    trace = mrmr_select(df, feats, "y", k=4).collect()
    rows = df.collect()
    ys = [r["y"] for r in rows]
    cols = {f: [r[f] for r in rows] for f in feats}
    rel = {f: _mi_brute(cols[f], ys) for f in feats}
    red = {(f, g): _mi_brute(cols[f], cols[g])
           for f in feats for g in feats if f != g}
    selected, remaining = [], sorted(feats)
    for step, row in enumerate(trace, start=1):
        best = None
        for f in remaining:
            r = (sum(red[(f, s)] for s in sorted(selected))
                 / len(selected)) if selected else 0.0
            sc = rel[f] - r
            if best is None or sc > best[0]:
                best = (sc, f, r)
        assert row["rk"] == step
        assert row["feature"] == best[1]
        assert row["score"] == pytest.approx(best[0], abs=1e-10)
        assert row["redundancy"] == pytest.approx(best[2], abs=1e-10)
        selected.append(best[1])
        remaining.remove(best[1])
    # the redundant near-copy of the first pick must NOT be picked 2nd:
    # c (period 4 of i//3) and the y-driver overlap; mRMR demotes the
    # second (i//3)-derived feature below an independent one
    assert trace[0]["feature"] == "c"


def test_mrmr_validates_k(spark):
    df = _frame(spark)
    with pytest.raises(ValueError):
        mrmr_select(df, ["a", "b"], "y", k=3)
    with pytest.raises(ValueError):
        mrmr_select(df, ["a", "b"], "y", k=0)


def test_delta_hsic_matches_trace_form(spark):
    """The count-closed delta-kernel HSIC must equal the textbook
    tr(KHLH)/n^2 computed naively with plain delta Grams."""
    import numpy as np
    from hiselspark.operators.feature_rank import (delta_hsic_table,
                                                   hsic_rank)
    df = _frame(spark)
    rows = df.collect()
    ys = np.array([r["y"] for r in rows])
    got = {r["feature"]: (r["n"], r["hsic"]) for r in
           hsic_rank(df, ["a", "b", "c", "d"], "y").collect()}
    n = len(rows)
    H = np.eye(n) - np.full((n, n), 1.0 / n)
    L = (ys[:, None] == ys[None, :]).astype(float)
    for f in ["a", "b", "c", "d"]:
        xs = np.array([r[f] for r in rows])
        K = (xs[:, None] == xs[None, :]).astype(float)
        want = np.trace(K @ H @ L @ H) / n**2
        gn, gh = got[f]
        assert gn == n
        assert gh == pytest.approx(want, rel=1e-10)
    # c is a deterministic driver of y -> max dependence, rank 1
    ranks = {r["feature"]: r["rank"] for r in
             hsic_rank(df, ["a", "b", "c", "d"], "y").collect()}
    assert ranks["c"] == 1
    # independence (a = i%2 vs b = i%3 over 240 rows): biased HSIC of
    # independent uniform columns is O(1/n), tiny but not zero; check
    # it is far below the dependent pair's
    pair = delta_hsic_table(
        df.selectExpr("a as x", "b as y2"), "x", "y2").collect()[0]
    dep = delta_hsic_table(
        df.selectExpr("c as x", "y as y2"), "x", "y2").collect()[0]
    assert abs(pair["hsic"]) < 1e-3 < dep["hsic"]


def test_multivariate_delta_hsic_joint_code(spark):
    """Mixed-radix joint encoding == joint delta kernel: HSIC of the
    code (a*3 + b) vs y equals tr(KHLH)/n^2 with K the equality
    kernel on (a, b) PAIRS."""
    import numpy as np
    from hiselspark.operators.feature_rank import delta_hsic_table
    df = _frame(spark).selectExpr("a * 3 + b AS code", "y")
    got = delta_hsic_table(df, "code", "y").collect()[0]["hsic"]
    rows = _frame(spark).collect()
    n = len(rows)
    ab = np.array([(r["a"], r["b"]) for r in rows])
    ys = np.array([r["y"] for r in rows])
    K = ((ab[:, None, 0] == ab[None, :, 0])
         & (ab[:, None, 1] == ab[None, :, 1])).astype(float)
    L = (ys[:, None] == ys[None, :]).astype(float)
    H = np.eye(n) - np.full((n, n), 1.0 / n)
    want = np.trace(K @ H @ L @ H) / n**2
    assert got == pytest.approx(want, rel=1e-10)


def test_hsic_perm_test_separates_dependence(spark):
    """Permutation p-value: a deterministic functional dependence must
    reach the minimum attainable p = 1/(B+1); an independent pair over
    a balanced grid must not be flagged at the 5% level."""
    from hiselspark.operators.feature_rank import hsic_perm_test
    rows = [(i, i % 4, (i % 4) * 2 + 1, (i * 7 + 3) % 5)
            for i in range(240)]
    df = spark.createDataFrame(rows, "id long, x long, yd long, yi long")
    dep = hsic_perm_test(df, "x", "yd", "id", n_perms=20).collect()[0]
    assert dep["n"] == 240
    assert dep["n_ge"] == 0
    assert dep["p_value"] == pytest.approx(1 / 21)
    ind = hsic_perm_test(df, "x", "yi", "id", n_perms=20).collect()[0]
    assert ind["p_value"] > 0.05
    # p is a valid probability and hsic is the exact statistic
    assert 0 < dep["p_value"] <= ind["p_value"] <= 1
    assert dep["hsic"] > ind["hsic"]


def test_hsic_stability_properties(spark):
    """Stability selection: the deterministic y-driver must survive
    every resample (stability 1.0), selected slots total B*top_m, and
    the whole table is run-to-run deterministic."""
    from hiselspark.operators.feature_rank import hsic_stability
    rows = [(i, i % 2, i % 3, (i // 3) % 4, (i * 7 + 1) % 5,
             (i // 3) % 2) for i in range(300)]
    df = spark.createDataFrame(
        rows, "id long, a int, b int, c int, d int, y int")
    out1 = {r["feature"]: r for r in hsic_stability(
        df, ["a", "b", "c", "d"], "y", "id",
        top_m=2, n_replicates=6).collect()}
    out2 = {r["feature"]: r for r in hsic_stability(
        df, ["a", "b", "c", "d"], "y", "id",
        top_m=2, n_replicates=6).collect()}
    assert out1.keys() == out2.keys()
    for f in out1:
        assert out1[f].asDict() == out2[f].asDict()
    assert all(r["n_replicates"] == 6 for r in out1.values())
    assert sum(r["n_selected"] for r in out1.values()) == 6 * 2
    # c drives y deterministically -> top-2 in every resample
    assert out1["c"]["stability"] == 1.0
    for r in out1.values():
        assert 0.0 <= r["stability"] <= 1.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hsic_stability(df, ["a", "b"], "y", "id", top_m=3)
