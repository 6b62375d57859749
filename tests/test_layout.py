"""graph_layout vs a brute-force Python replay + contraction checks."""
from __future__ import annotations

import numpy as np
import pytest

_MOD = 2147483647


def _h(s: str, salt: int) -> int:
    acc = salt % _MOD
    for ch in s:
        acc = (acc * 31 + ord(ch)) % _MOD
    return acc


def _cw(seed):
    import random
    r = random.Random(f"cw:{int(seed)}")
    return [(r.randrange(1, _MOD), r.randrange(_MOD))
            for _ in range(2)]


def _brute(edges, iterations, seed, scale):
    (a1, c1), (a2, c2) = _cw(seed)
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    pos = {}
    for n in adj:
        h = _h(str(n), seed)
        x0 = ((h * a1 + c1) % _MOD) % scale
        y0 = ((h * a2 + c2) % _MOD) % scale
        pos[n] = [x0, y0, x0, y0]  # x, y, x0, y0
    for _ in range(iterations):
        new = {}
        for n, (x, y, x0, y0) in pos.items():
            nb = adj[n]
            sx = sum(pos[m][0] for m in nb)
            sy = sum(pos[m][1] for m in nb)
            nx = (x + 2 * (sx // len(nb)) + x0) // 4
            ny = (y + 2 * (sy // len(nb)) + y0) // 4
            new[n] = [nx, ny, x0, y0]
        pos = new
    return pos


def _two_cliques():
    edges = []
    for base in (0, 100):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    edges.append((0, 100))  # one bridge
    return edges


def test_layout_matches_python_replay(spark):
    from hiselspark.operators.layout import graph_layout
    edges = _two_cliques()
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r for r in
           graph_layout(df, iterations=3, seed=5).collect()}
    want = _brute(edges, 3, 5, 1_000_000)
    assert set(out) == set(want)
    for n, (x, y, x0, y0) in want.items():
        r = out[n]
        assert (r["x"], r["y"], r["x0"], r["y0"]) == (x, y, x0, y0)


def test_layout_contracts_clusters(spark):
    from hiselspark.operators.layout import graph_layout
    edges = _two_cliques()
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph_layout(df, iterations=4, seed=5).toPandas()

    def spread(cols):
        a = out[out.node < 100]
        b = out[out.node >= 100]
        sa = np.array(a[cols])
        sb = np.array(b[cols])
        return (np.abs(sa - sa.mean(0)).mean()
                + np.abs(sb - sb.mean(0)).mean())

    # neighbor smoothing pulls each clique toward its own centroid:
    # final intra-cluster spread far below the hash-anchor spread
    assert spread(["x", "y"]) < 0.5 * spread(["x0", "y0"])
    # positions stay in range
    assert (out[["x", "y"]].to_numpy() >= 0).all()
    assert (out[["x", "y"]].to_numpy() < 1_000_000).all()


def test_layout_layout_invariant_and_zero_iters(spark):
    from hiselspark.operators.layout import graph_layout
    edges = _two_cliques()
    df1 = spark.createDataFrame(edges, "src long, dst long")
    df8 = df1.repartition(8)
    a = (graph_layout(df1, iterations=2).toPandas()
         .sort_values("node").reset_index(drop=True))
    b = (graph_layout(df8, iterations=2).toPandas()
         .sort_values("node").reset_index(drop=True))
    assert a.equals(b)
    z = graph_layout(df1, iterations=0).toPandas()
    assert (z.x == z.x0).all() and (z.y == z.y0).all()
    with pytest.raises(ValueError):
        graph_layout(df1, iterations=-1)
