"""label_propagation / ipw_estimate vs brute-force Python oracles."""
from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pytest


def _brute_lpa(edges, rounds):
    nbrs = defaultdict(set)
    for u, v in edges:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    # neighbor MULTISET per the symmetrized-distinct edge list: each
    # neighbor counts once
    lab = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v in nbrs:
            c = Counter(lab[u] for u in nbrs[v])
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return lab


def test_label_propagation_matches_brute(spark):
    from hiselspark.operators.graph import label_propagation
    rng = np.random.default_rng(13)
    # two planted cliques + random cross edges
    edges = []
    for grp, base in ((0, 0), (1, 100)):
        ns = [base + i for i in range(8)]
        edges += [(a, b) for i, a in enumerate(ns) for b in ns[i + 1:]]
    edges += [(int(rng.integers(0, 8)), int(100 + rng.integers(0, 8)))
              for _ in range(3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in
           label_propagation(df, rounds=3).collect()}
    exp = _brute_lpa(edges, 3)
    assert set(got) == set(exp)
    for v, l in exp.items():
        assert got[v]["label"] == l, f"node {v}"
    sizes = Counter(exp.values())
    for v in exp:
        assert got[v]["community_size"] == sizes[exp[v]]
    # the two cliques must resolve to (at most) two communities,
    # each containing its full clique
    labs0 = {exp[v] for v in range(8)}
    labs1 = {exp[v] for v in range(100, 108)}
    assert len(labs0) == 1 and len(labs1) == 1 and labs0 != labs1
    with pytest.raises(ValueError):
        label_propagation(df, rounds=0)


def _brute_ipw(rows):
    per = defaultdict(lambda: [0, 0, 0, 0])  # n, nt, syt, syc
    for b, t, y in rows:
        c = per[b]
        c[0] += 1
        c[1] += t
        if t:
            c[2] += y
        else:
            c[3] += y
    n = sum(c[0] for c in per.values())
    used = {b: c for b, c in per.items() if 0 < c[1] < c[0]}
    n_used = sum(c[0] for c in used.values())
    strat = ipw = 0.0
    for b in sorted(used):
        nb, nt, syt, syc = used[b]
        nc = nb - nt
        strat += nb * (syt / nt - syc / nc)
        ipw += syt * nb / nt - syc * nb / nc
    return (n, n_used, len(per), len(used), n - n_used,
            strat / n_used, ipw / n_used)


def test_ipw_matches_brute_and_drops_no_overlap(spark):
    from hiselspark.operators.causal import ipw_estimate
    rng = np.random.default_rng(21)
    rows = []
    for _ in range(2000):
        b = int(rng.integers(0, 6))
        t = 1 if b == 0 else int(rng.random() < 0.4)   # b=0: no ctrl
        y = int(rng.integers(0, 500)) + 40 * t + 10 * b
        rows.append((b, t, y))
    df = spark.createDataFrame(rows, "b long, t long, y long")
    got = ipw_estimate(df, "t", "y", "b").collect()[0]
    (n, n_used, n_strata, n_used_strata, n_dropped,
     strat, ipw) = _brute_ipw(rows)
    assert got["n"] == n and got["n_used"] == n_used
    assert got["n_strata"] == n_strata
    assert got["n_used_strata"] == n_used_strata == 5
    assert got["n_dropped_rows"] == n_dropped > 0
    assert got["ate_strat"] == pytest.approx(round(strat, 6), abs=1e-9)
    assert got["ate_ipw"] == pytest.approx(round(ipw, 6), abs=1e-9)
    # the planted +40 treatment effect must be visible
    assert 20 < got["ate_strat"] < 60


def test_ipw_no_usable_stratum_is_null(spark):
    from hiselspark.operators.causal import ipw_estimate
    rows = [(0, 1, 10)] * 5 + [(1, 0, 20)] * 5   # each stratum one-armed
    df = spark.createDataFrame(rows, "b long, t long, y long")
    got = ipw_estimate(df, "t", "y", "b").collect()[0]
    assert got["n_used"] == 0 and got["n_dropped_rows"] == 10
    assert got["ate_strat"] is None and got["ate_ipw"] is None
