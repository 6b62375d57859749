"""Neighbor-graph layout — a UMAP/t-SNE-lite placement stage.

Given a k-NN graph (the existing ANN products: ``mutual_knn``,
``lsh_topk``/``ivf_topk``/``pq_topk`` edges, dedup components), place
every node in 2-D so that neighbors land near each other — the
embedding-atlas / cluster-inspection view of a corpus.  The placement
is LAPLACIAN SMOOTHING blended with a hash-seeded anchor (the
attraction half of a force layout; Koren's spectral ACE family): per
round

    pos <- (pos + 2 * mean(neighbor pos) + init) DIV 4

in pure int64 fixed-point, where ``init`` is the node's deterministic
hash position.  The anchor term prevents the all-points-collapse that
pure averaging converges to, while repeated neighbor means pull
connected clusters into tight clumps — after a few rounds, cluster
structure is visible in (x, y) without any RNG stream or float op.

Reference scope note: hisel (`/root/reference`) has no layout code;
this is part of the grafted pipeline layer (SURVEY §2), following the
fixed-point-integer discipline of ``operators/graph.py`` (pagerank /
hits): bit-identical across partition layouts AND engines, so the
oracle unrolls the iterations as plain SQL CTEs.

Scale shape: per round one edge⋈position hash join plus one
map-side-combined groupBy — cost O(E) per round, ``iterations``
bounded and small; positions are one (node, x, y, x0, y0) row each.
No driver state, no collect.  Positions live in [0, scale) so integer
division is plain truncation in every engine (no negative floor-vs-
truncate divergence).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .splits import raw_hash

_MOD = 2147483647


def graph_layout(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    seed: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """2-D fixed-point layout of an undirected neighbor graph.

    ``edges`` is symmetrized and de-duplicated; every endpoint becomes
    a node.  Initial coordinates are the portable polynomial hash of
    the node id (salted by ``seed`` per axis) mod ``scale`` — fully
    SQL-replayable, no RNG stream.  Each round replaces a node's
    position with the integer blend ``(pos + 2·nbmean + init) DIV 4``
    (isolated nodes keep their position; ``nbmean`` is the truncated
    integer mean of the neighbors' current positions).

    Returns one row per node: (node, x, y, x0, y0) — final and anchor
    coordinates, all int64 in [0, scale).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    e = (e.unionAll(e.select(F.col("v").alias("u"),
                             F.col("u").alias("v")))
         .filter(F.col("u") != F.col("v"))
         .distinct())
    nodes = e.select(F.col("u").alias("node")).distinct()
    # polynomial fold alone is near-linear in short ids (consecutive
    # node ids would hash to consecutive coordinates) — mix it through
    # literal Carter-Wegman constants per axis, the feature_hashing
    # dispersion pattern, still fully SQL-replayable
    from .bootstrap import cw_constants
    (a1, c1), (a2, c2) = cw_constants(2, int(seed))
    h = raw_hash(F.col("node"), salt=int(seed))
    x0 = F.pmod(F.pmod(h * F.lit(a1) + F.lit(c1), F.lit(_MOD)),
                F.lit(int(scale)))
    y0 = F.pmod(F.pmod(h * F.lit(a2) + F.lit(c2), F.lit(_MOD)),
                F.lit(int(scale)))
    pos = nodes.select("node", x0.cast("long").alias("x0"),
                       y0.cast("long").alias("y0"))
    pos = pos.select("node", "x0", "y0",
                     F.col("x0").alias("x"), F.col("y0").alias("y"))
    for _ in range(int(iterations)):
        nb = (e.join(pos.select(F.col("node").alias("v"),
                                F.col("x").alias("nx"),
                                F.col("y").alias("ny")), "v")
              .groupBy(F.col("u").alias("node"))
              .agg(F.sum("nx").alias("sx"), F.sum("ny").alias("sy"),
                   F.count(F.lit(1)).alias("deg")))
        pos = (pos.join(nb, "node", "left")
               .select("node", "x0", "y0",
                       F.when(F.col("deg").isNotNull(),
                              F.expr("(x + 2 * (sx DIV deg) + x0)"
                                     " DIV 4"))
                       .otherwise(F.col("x")).cast("long").alias("x"),
                       F.when(F.col("deg").isNotNull(),
                              F.expr("(y + 2 * (sy DIV deg) + y0)"
                                     " DIV 4"))
                       .otherwise(F.col("y")).cast("long").alias("y")))
    return pos.select("node", "x", "y", "x0", "y0")
