"""pareto_front / cohen_kappa / triangle_count vs brute force."""
import itertools

import pytest

from hiselspark.operators.evaluate import cohen_kappa
from hiselspark.operators.graph import triangle_count
from hiselspark.operators.skyline import pareto_front


def _dominates(q, p):
    return (q[0] >= p[0] and q[1] >= p[1]
            and (q[0] > p[0] or q[1] > p[1]))


def test_pareto_front_matches_brute(spark):
    # deterministic scatter incl. duplicate points and axis ties
    pts = [((i * 37) % 23, (i * 59) % 19) for i in range(60)]
    pts += [(22, 18), (22, 18), (0, 18), (22, 0)]   # dup + corners
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid long, x long, y long")
    got = sorted((r["pid"], r["x"], r["y"]) for r in
                 pareto_front(df, "x", "y", ["pid"]).collect())
    want = sorted(
        (i, x, y) for i, (x, y) in enumerate(pts)
        if not any(_dominates(q, (x, y)) for j, q in enumerate(pts)
                   if j != i and q != (x, y)))
    assert got == want
    # duplicated undominated point survives twice
    assert sum(1 for _, x, y in got if (x, y) == (22, 18)) == 2


def test_pareto_front_single_partition_equals_many(spark):
    pts = [((i * 37) % 23, (i * 59) % 19) for i in range(60)]
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    one = spark.createDataFrame(rows, "pid long, x long, y long") \
        .coalesce(1)
    many = spark.createDataFrame(rows, "pid long, x long, y long") \
        .repartition(7)
    a = sorted(map(tuple, pareto_front(one, "x", "y", ["pid"])
                   .collect()))
    b = sorted(map(tuple, pareto_front(many, "x", "y", ["pid"])
                   .collect()))
    assert a == b


def test_cohen_kappa_matches_formula(spark):
    r1 = [0, 0, 1, 1, 2, 2, 0, 1, 2, 0, 1, 1]
    r2 = [0, 1, 1, 1, 2, 0, 0, 1, 2, 2, 1, 0]
    df = spark.createDataFrame(list(zip(r1, r2)), "r1 int, r2 int")
    row = cohen_kappa(df, "r1", "r2").collect()[0]
    n = len(r1)
    agree = sum(a == b for a, b in zip(r1, r2))
    cross = sum(r1.count(k) * r2.count(k) for k in set(r1) | set(r2))
    assert row["n"] == n
    assert row["n_agree"] == agree
    assert row["chance_cross"] == cross
    assert row["kappa"] == pytest.approx(
        (n * agree - cross) / (n * n - cross), abs=1e-12)
    # perfect agreement -> kappa 1
    perfect = spark.createDataFrame(list(zip(r1, r1)), "r1 int, r2 int")
    assert cohen_kappa(perfect, "r1", "r2").collect()[0]["kappa"] \
        == pytest.approx(1.0)


def test_triangle_count_known_and_random(spark):
    # K4 has 4 triangles; plus a pendant edge, a self-loop and a
    # duplicate/reversed edge that must all be ignored
    edges = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    edges += [(3, 4), (2, 2), (1, 0), (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["n_triangles"] == 4
    # deterministic pseudo-random graph vs brute force
    redges = [((i * 13) % 17, (i * 29 + 5) % 17) for i in range(80)]
    rdf = spark.createDataFrame(redges, "src long, dst long")
    got = triangle_count(rdf).collect()[0]
    canon = {(min(u, v), max(u, v)) for u, v in redges if u != v}
    brute = sum(1 for a, b, c in itertools.combinations(
        sorted({n for e in canon for n in e}), 3)
        if (a, b) in canon and (b, c) in canon and (a, c) in canon)
    assert got["n_edges"] == len(canon)
    assert got["n_triangles"] == brute
