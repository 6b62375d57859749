"""Integer fixed-point PageRank vs a float NetworkX-style reference."""
import numpy as np
import pandas as pd
import pytest

from hiselspark.operators.graph import pagerank, symmetrize


def _float_pagerank(edges, iters=5, d=0.85, scale=1e9):
    """Reference float implementation of the SAME iteration scheme
    (undirected, per-iteration floor on contributions omitted)."""
    nodes = sorted({n for e in edges for n in e})
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    deg = {n: 0 for n in nodes}
    for a, _ in und:
        deg[a] += 1
    r = {n: scale for n in nodes}
    for _ in range(iters):
        inc = {n: 0.0 for n in nodes}
        for a, b in und:
            inc[b] += r[a] / deg[a]
        r = {n: (1 - d) * scale + d * inc[n] for n in nodes}
    return r


def test_pagerank_close_to_float_and_star_graph(spark):
    # star: hub 0 connected to 1..8, plus a detached triangle 10-11-12
    edges = [(0, i) for i in range(1, 9)] + [(10, 11), (11, 12),
                                             (12, 10)]
    df = spark.createDataFrame(pd.DataFrame(edges,
                                            columns=["src", "dst"]))
    out = pagerank(df, iterations=5).toPandas().set_index("node")["r"]
    ref = _float_pagerank(edges)
    for n, v in ref.items():
        # integer floors lose < iters * units; relative error tiny
        assert out[n] == pytest.approx(v, rel=1e-5)
    # hub dominates the spokes; triangle nodes are symmetric-equal
    assert out[0] > 3 * out[1]
    assert out[10] == out[11] == out[12]
    assert all(out[i] == out[1] for i in range(2, 9))


def test_pagerank_layout_deterministic(spark):
    rng = np.random.default_rng(9)
    edges = pd.DataFrame({"src": rng.integers(0, 60, 300),
                          "dst": rng.integers(60, 120, 300)})
    df = spark.createDataFrame(edges)
    a = pagerank(df, iterations=4).toPandas().sort_values("node")
    b = (pagerank(df.repartition(13), iterations=4)
         .toPandas().sort_values("node"))
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_symmetrize_dedups(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 2, 1], "dst": [2, 1, 3, 2]}))
    got = {(r.src, r.dst) for r in symmetrize(df).collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}


def test_bfs_hops_chain_and_cutoff(spark):
    from hiselspark.operators.graph import bfs_hops
    # path graph 0-1-2-3-4-5 plus a detached pair 10-11
    edges = pd.DataFrame({"src": [0, 1, 2, 3, 4, 10],
                          "dst": [1, 2, 3, 4, 5, 11]})
    src = spark.createDataFrame(pd.DataFrame({"node": [0]}))
    out = (bfs_hops(spark.createDataFrame(edges), src, max_hops=3)
           .toPandas().set_index("node")["hops"])
    assert dict(out) == {0: 0, 1: 1, 2: 2, 3: 3}  # 4,5 beyond cutoff
    # two sources: min distance wins
    src2 = spark.createDataFrame(pd.DataFrame({"node": [0, 5]}))
    out2 = (bfs_hops(spark.createDataFrame(edges), src2, max_hops=3)
            .toPandas().set_index("node")["hops"])
    assert out2[3] == 2 and out2[2] == 2 and out2[4] == 1
    # detached component never reached
    assert 10 not in out2.index and 11 not in out2.index


def test_assortativity_known_graphs(spark):
    """Star graph -> strongly negative r; cycle (regular) -> degenerate
    NULL (zero variance); brute-force Pearson parity on a random
    graph."""
    import itertools
    from hiselspark.operators.graph import degree_assortativity
    star = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(star, "src long, dst long")
    r = degree_assortativity(df).collect()[0]
    assert r["n_edges"] == 5
    assert r["r"] == -1.0          # star is perfectly disassortative
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    rc = degree_assortativity(
        spark.createDataFrame(cyc, "src long, dst long")).collect()[0]
    assert rc["r"] is None         # 2-regular: zero degree variance
    edges = [(i % 9, (i * i + 1) % 9) for i in range(60)]
    rr = degree_assortativity(
        spark.createDataFrame(edges, "src long, dst long")
    ).collect()[0]
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    deg = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in canon:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    m = len(xs)
    sx, sxy, sxx = sum(xs), sum(x * y for x, y in zip(xs, ys)), \
        sum(x * x for x in xs)
    want = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert rr["n_edges"] == len(canon)
    assert abs(rr["r"] - want) < 1e-9


def test_kcore_matches_peeling_and_converges(spark):
    """kcore vs a dict-based peel to fixpoint; bounded rounds reach
    the fixpoint on this graph; validation errors."""
    import pytest as _pytest
    from hiselspark.operators.graph import kcore
    edges = [(i % 12, (i * i + 1) % 12) for i in range(50)]
    edges += [(20, 21)]                      # isolated low-degree pair
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["core_deg"] for r in
           kcore(df, k=3, rounds=6).collect()}
    # brute peel to fixpoint
    from collections import defaultdict
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    while True:
        bad = [n for n, vs in adj.items() if len(vs) < 3]
        if not bad:
            break
        for n in bad:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
        adj = {n: vs for n, vs in adj.items() if n not in bad}
    want = {n: len(vs) for n, vs in adj.items()}
    assert got == want
    assert 20 not in got and 21 not in got
    with _pytest.raises(ValueError):
        kcore(df, k=0)


def _float_hits(edges, iters=4):
    """Float HITS with L1 normalization — same iteration scheme as
    the integer operator, without the flooring."""
    hubs = sorted({a for a, _ in edges})
    auths = sorted({b for _, b in edges})
    h = {u: 1.0 for u in hubs}
    a = {}
    for _ in range(iters):
        a = {v: 0.0 for v in auths}
        for u, v in set(edges):
            a[v] += h[u]
        s = sum(a.values())
        a = {v: x / s for v, x in a.items()}
        h = {u: 0.0 for u in hubs}
        for u, v in set(edges):
            h[u] += a[v]
        s = sum(h.values())
        h = {u: x / s for u, x in h.items()}
    return h, a


def test_hits_close_to_float_and_star(spark):
    # hub 0 points to many authorities; 1 points to a subset;
    # node 50 is both a hub and an authority (appears twice)
    edges = ([(0, 100 + i) for i in range(8)]
             + [(1, 100 + i) for i in range(3)]
             + [(2, 50), (50, 100)])
    df = spark.createDataFrame(pd.DataFrame(edges,
                                            columns=["src", "dst"]))
    from hiselspark.operators.graph import hits
    rows = hits(df, iterations=4).collect()
    got = {(r["node"], r["kind"]): r["score"] for r in rows}
    fh, fa = _float_hits(edges)
    # the integer scheme floors the normalization DENOMINATOR
    # (total DIV scale), a uniform per-vector rescale — so compare
    # L1 shares (ratios are exact), not absolute magnitudes
    hub_sum = sum(s for (n, k), s in got.items() if k == "hub")
    auth_sum = sum(s for (n, k), s in got.items() if k == "auth")
    for u, v in fh.items():
        assert got[(u, "hub")] / hub_sum == pytest.approx(v, rel=1e-4)
    for u, v in fa.items():
        assert got[(u, "auth")] / auth_sum == pytest.approx(v,
                                                            rel=1e-4)
    # node 0 is the dominant hub; 100 the dominant authority
    hub_top = max((s for (n, k), s in got.items() if k == "hub"))
    assert got[(0, "hub")] == hub_top
    assert (50, "hub") in got and (50, "auth") in got


def test_hits_layout_deterministic(spark):
    edges = [(i % 7, 10 + ((i * 3) % 11)) for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(edges,
                                            columns=["src", "dst"]))
    from hiselspark.operators.graph import hits
    a = sorted(map(tuple, hits(df, iterations=3).collect()))
    b = sorted(map(tuple,
                   hits(df.repartition(7), iterations=3).collect()))
    assert a == b
