"""Iterative graph analytics over edge DataFrames — PageRank in exact
integer arithmetic.

Float PageRank is layout-dependent (the per-node incoming sum is a
float reduction whose order depends on partitioning), which breaks both
the engine's cross-engine oracle discipline and run-to-run
reproducibility.  This implementation keeps every rank as a scaled
64-bit integer (default 10^9 = one "unit" of mass per node) and every
step in integer arithmetic:

    contrib(j) = r(j) DIV deg(j)
    r'(i)      = (1−d)·scale  +  (d_num · Σ_in contrib) DIV d_den

with damping d = d_num/d_den (default 17/20 = 0.85).  Integer sums are
associative — the result is bit-identical across any partitioning, and
a SQL engine replays it exactly (the driver-gate oracle unrolls the
same iterations as chained CTEs).  Each DIV floors away < 1 unit of
mass per node per iteration (≤ iterations·N·10⁻⁹ of total mass) — the
standard price of fixed-point PageRank, negligible for ranking.

Scale shape: one iteration = one join of ranks onto the edge list plus
one partial-aggregated ``groupBy(dst)`` — the canonical iterative
shuffle pattern.  At 10^12 edges you'd pre-bucket the edge list by
``src`` (and keep ranks co-partitioned) so the per-iteration join is
shuffle-free on the big side; the loop here declares exactly that plan
per iteration and lets AQE size the shuffles.

The reference engine (transferwise/hisel) has no graph layer — this
extends the grafted near-duplicate surface (``operators/dedup.py``
connected components) with an importance ranking over the same kind of
similarity/interaction graphs.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def symmetrize(edges: DataFrame, src: str = "src",
               dst: str = "dst") -> DataFrame:
    """Undirected view: both orientations of every edge, deduplicated."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return (e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
             .distinct())


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 1_000_000_000,
    undirected: bool = True,
) -> DataFrame:
    """Fixed-point PageRank over an edge list; returns
    ``(node, rank)`` with ``rank`` a scaled integer (see module
    docstring).  With ``undirected=True`` the edge list is symmetrized
    first, which also guarantees every node has in-degree ≥ 1 (no
    dangling-mass handling needed)."""
    e = (symmetrize(edges, src, dst) if undirected
         else edges.select(F.col(src).alias("src"),
                           F.col(dst).alias("dst")).distinct())
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    base = ((damping_den - damping_num) * scale) // damping_den
    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(scale).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = (ranks.join(deg, ranks.node == deg.src)
                        .select(F.col("node").alias("cnode"),
                                F.expr("r DIV deg").alias("c")))
        inc = (e.join(contrib, e.src == contrib.cnode)
                .groupBy("dst")
                .agg(F.sum("c").alias("inc")))
        ranks = inc.select(
            F.col("dst").alias("node"),
            (F.lit(base).cast("long")
             + F.expr(f"({damping_num} * inc) DIV {damping_den}"))
            .alias("r"))
    return ranks


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    undirected: bool = True,
) -> DataFrame:
    """Breadth-first hop distance from a source set: ``(node, hops)``
    with the MINIMUM number of edges from any source, cut off at
    ``max_hops`` (unreached nodes are absent).  Reachability /
    blast-radius analysis over similarity or interaction graphs —
    "everything within 2 hops of these flagged items".

    Frontier-relaxation loop: each hop joins the (shrinking) frontier
    to the edge list and anti-joins already-settled nodes, so a node
    is settled exactly once at its true BFS depth — results are exact
    integers, independent of partitioning.  The loop is driver-paced
    (one bounded iteration per hop, early exit on an empty frontier);
    at cluster scale each iteration is one join + one anti-join on the
    node key, the standard Pregel-style plan.  The driver-side
    emptiness check per hop is a count of the frontier — bounded by
    ``max_hops`` scheduling round-trips, not by data size."""
    e = (symmetrize(edges, src, dst) if undirected
         else edges.select(F.col(src).alias("src"),
                           F.col(dst).alias("dst")).distinct())
    dist = (sources.select(F.col(node_col).alias("node")).distinct()
                   .withColumn("hops", F.lit(0)))
    frontier = dist.select("node")
    for h in range(1, int(max_hops) + 1):
        nxt = (frontier.join(e, frontier.node == e.src)
                       .select(F.col("dst").alias("node"))
                       .distinct()
                       .join(dist.select("node"), "node", "left_anti")
                       .withColumn("hops", F.lit(h)))
        nxt = nxt.persist()
        if nxt.count() == 0:
            nxt.unpersist()
            break
        dist = dist.unionByName(nxt)
        frontier = nxt.select("node")
    return dist


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Exact global triangle count of the undirected simple graph
    (self-loops and duplicate/reverse edges removed).  Returns one
    row: (n_nodes, n_edges, n_triangles).

    The degree-orientation algorithm (node-iterator with the
    Schank-Wagner ordering): orient every edge from the
    lower-(degree, id) endpoint to the higher, form wedges by joining
    oriented edges on their source, and close each wedge against the
    oriented edge set — every triangle is counted exactly once, at its
    lowest-ordered corner.  Orientation bounds each node's out-degree
    by O(√m), so the wedge join is O(m^1.5) worst-case instead of the
    Σdeg² blowup of naive wedge counting — the property that keeps the
    plan alive on power-law graphs at 100 TB (the hub's million
    neighbors never pair up under it).

    Scale shape: canonicalize (one shuffle), degree (one groupBy),
    orientation (two broadcast-or-shuffle joins of degrees onto
    edges), wedge join + closing semi-join on equi-keys.  Exact
    integer counts end to end."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    canon = (e.filter(F.col("u") != F.col("v"))
             .select(F.least("u", "v").alias("a"),
                     F.greatest("u", "v").alias("b"))
             .distinct())
    deg = (canon.select(F.col("a").alias("node"))
           .union(canon.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    ranked = canon.join(da, "a").join(db, "b")
    # orient low (deg, id) -> high (deg, id)
    a_first = ((F.col("dega") < F.col("degb"))
               | ((F.col("dega") == F.col("degb"))
                  & (F.col("a") < F.col("b"))))
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"))
    e1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("q"))
    e2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("r"))
    wedges = e1.join(e2, "p").filter(F.col("q") < F.col("r"))
    # close the wedge: (q, r) or (r, q) must be an oriented edge; both
    # orientations checked with ONE semi-join on the unordered pair
    closing = oriented.select(
        F.least("lo", "hi").alias("q"), F.greatest("lo", "hi").alias("r"))
    tri = wedges.join(closing, ["q", "r"], "left_semi")
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


def degree_assortativity(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Newman's degree assortativity coefficient: the Pearson
    correlation of endpoint degrees over the (double-counted)
    directed edge list of the undirected simple graph — positive for
    hub-to-hub wiring, negative for hub-to-leaf (most real
    interaction graphs).  Returns one row: (n_edges, r).

    Exact integer sums Σx, Σxy, Σx² over both orientations (the
    symmetric list makes the x/y marginals identical), one fixed
    float expression at the end — both engines land on the identical
    double.  Scale shape: canonicalize + degree (two shuffles), one
    join of degrees onto edges, one scalar aggregate."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    canon = (e.filter(F.col("u") != F.col("v"))
             .select(F.least("u", "v").alias("a"),
                     F.greatest("u", "v").alias("b"))
             .distinct())
    deg = (canon.select(F.col("a").alias("node"))
           .union(canon.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da = deg.select(F.col("node").alias("a"),
                    F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"),
                    F.col("deg").alias("degb"))
    both = (canon.join(da, "a").join(db, "b")
            .select(F.col("dega").alias("x"), F.col("degb").alias("y")))
    sym = both.union(both.select(F.col("y").alias("x"),
                                 F.col("x").alias("y")))
    agg = sym.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    m2 = F.col("m2").cast("double")
    num = (m2 * F.col("sxy").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double"))
    den = (m2 * F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double"))
    r = F.when(den == 0, F.lit(None).cast("double")).otherwise(num / den)
    return agg.select((F.col("m2") / 2).cast("long").alias("n_edges"),
                      r.alias("r"))


def kcore(edges: DataFrame, k: int, rounds: int = 6,
          src: str = "src", dst: str = "dst") -> DataFrame:
    """k-core membership by BOUNDED-round peeling: ``rounds``
    iterations of [degree → drop nodes with deg < k → drop their
    edges] over the undirected simple graph — the standard graph-
    curation filter (spam/fringe removal, dense-community isolation).
    Returns (node, core_deg) for every node still in the edge set
    after the last round.

    Bounded rounds make the operator DETERMINISTIC AND REPLAYABLE (the
    oracle unrolls the same rounds as CTEs, the pagerank discipline);
    on graphs that need more peels than ``rounds`` the result is the
    declared partial peel — callers size ``rounds`` to the graph
    (peeling converges in ≤ a few rounds on bounded-degeneracy
    graphs; pytest asserts a fixpoint on the gate family).

    Scale shape per round: one degree groupBy + two semi-joins — the
    canonical iterative pattern; at 10^12 edges you'd co-partition
    edges and degrees on node id so each round's joins are
    shuffle-free on the big side."""
    if k < 1 or rounds < 1:
        raise ValueError("need k >= 1 and rounds >= 1")
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    cur = (e.filter(F.col("u") != F.col("v"))
           .select(F.least("u", "v").alias("a"),
                   F.greatest("u", "v").alias("b"))
           .distinct())
    for _ in range(rounds):
        # each round consumes `cur` three times (degree + two semi-
        # joins); materialize per round or the unrolled lineage
        # recomputes round 0 3^rounds times — the standard iterative-
        # graph discipline (same reason GraphX checkpoints)
        cur = cur.localCheckpoint(eager=True)
        deg = (cur.select(F.col("a").alias("node"))
               .union(cur.select(F.col("b").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
        keep = deg.filter(F.col("deg") >= k).select("node")
        cur = (cur.join(keep.withColumnRenamed("node", "a"), "a",
                        "left_semi")
               .join(keep.withColumnRenamed("node", "b"), "b",
                     "left_semi"))
    return (cur.select(F.col("a").alias("node"))
            .union(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_deg")))


def link_prediction(edges: DataFrame, src: str = "src",
                    dst: str = "dst", symmetrize_input: bool = True,
                    exclude_existing: bool = True,
                    max_center_degree: int | None = None) -> DataFrame:
    """Common-neighbor link prediction: for every node pair (a < b)
    that shares at least one neighbor, the exact common-neighbor
    count, the Jaccard overlap of their neighbor sets, and the
    Adamic-Adar score Σ_{w ∈ N(a)∩N(b)} 1/ln(deg(w)).

    Determinism: cn / deg are exact integer counts; Jaccard is one
    float division; the Adamic-Adar sum — the one true float
    reduction — is folded over the common-neighbor degree list in
    SORTED order (``sort_array`` → ``F.aggregate``), so it is
    bit-identical across partitionings and the DuckDB oracle replays
    it term for term with ``list_sort`` + ``list_reduce``.  Every
    common neighbor has deg ≥ 2 by construction, so ln(deg) ≥ ln 2
    and no term divides by zero.

    ``symmetrize_input=False`` treats ``edges`` as a directed
    adjacency (entity → attribute): pairs form on the ``src`` side
    through shared ``dst`` attributes — the one-mode projection of a
    bipartite graph (users sharing items, suppliers sharing parts),
    which is the corpus-curation use (co-engagement candidates).

    Scale shape: the wedge join on the center node w is the single
    heavy exchange; its fan-out is Σ_w deg(w)² — quadratic in hub
    degree, exactly like :func:`triangle_count` before orientation.
    ``max_center_degree`` drops hub centers above the cap (the
    standard mitigation: a hub contributes only 1/ln(deg) ≈ 0 per
    pair but deg² join rows); the drop is a DECLARED bias — scores
    lose those near-zero terms, and cn/jaccard are then computed on
    the capped neighbor sets.  At 10^12 edges: cap hubs, bucket the
    adjacency by w, and the wedge join is co-partitioned.

    Returns (a, b, cn, deg_a, deg_b, jaccard, adamic_adar).
    """
    if symmetrize_input:
        adj = symmetrize(edges, src, dst)  # (src=node, dst=neighbor)
    else:
        adj = edges.select(F.col(src).alias("src"),
                           F.col(dst).alias("dst")).distinct()
    adj = adj.select(F.col("src").cast("long").alias("node"),
                     F.col("dst").cast("long").alias("w"))
    degw = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg_w"))
    if max_center_degree is not None:
        degw = degw.filter(F.col("deg_w") <= max_center_degree)
        adj = adj.join(degw.select("w"), "w", "left_semi")
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    lhs = adj.select(F.col("w"), F.col("node").alias("a"))
    rhs = adj.select(F.col("w"), F.col("node").alias("b"))
    wedges = (lhs.join(rhs, "w")
              .filter(F.col("a") < F.col("b"))
              .join(degw, "w"))
    pairs = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sort_array(F.collect_list("deg_w")).alias("cn_degs"))
    if exclude_existing and symmetrize_input:
        existing = (adj.filter(F.col("node") < F.col("w"))
                    .select(F.col("node").alias("a"),
                            F.col("w").alias("b")))
        pairs = pairs.join(existing, ["a", "b"], "left_anti")
    pairs = (pairs
             .join(deg.select(F.col("node").alias("a"),
                              F.col("deg").alias("deg_a")), "a")
             .join(deg.select(F.col("node").alias("b"),
                              F.col("deg").alias("deg_b")), "b"))
    aa = F.aggregate(
        "cn_degs", F.lit(0.0),
        lambda acc, x: acc + F.lit(1.0) / F.log(x.cast("double")))
    jac = (F.col("cn").cast("double")
           / (F.col("deg_a") + F.col("deg_b") - F.col("cn"))
           .cast("double"))
    return pairs.select(
        "a", "b", "cn", "deg_a", "deg_b",
        jac.alias("jaccard"), aa.alias("adamic_adar"))


def modularity(edges: DataFrame, communities: DataFrame,
               node_col: str = "node",
               community_col: str = "community",
               src: str = "src", dst: str = "dst") -> DataFrame:
    """Newman modularity Q of a given node partition over the
    undirected simple graph:

        Q = Σ_c ( e_c/m  −  (deg_c / 2m)² )

    with e_c = intra-community edges, deg_c = total degree inside c,
    m = |edges|.  The grading metric for any community assignment
    (connected components, label propagation, LSH buckets-as-
    communities): Q ≈ 0 means the partition is no better than random
    wiring, Q ≳ 0.3 means real structure.

    All counts are exact integers; the Σ_c fold runs over communities
    in sorted-key order (collect → sort → aggregate) so the float sum
    is bit-reproducible and SQL-replayable.  Shape: canonicalize +
    degree (two shuffles), two broadcast-or-hash joins of the
    assignment onto edges, one bounded collect of per-community
    totals (communities, not nodes).  Returns one row:
    (m, n_communities, q).

    Every edge endpoint MUST appear in ``communities`` — a partial
    assignment would mix denominators (m from all edges, e_c/deg_c
    from tagged edges only) and silently bias Q low, so the operator
    counts untagged edges first and raises ``ValueError`` if any
    exist (filter the edge list to assigned nodes explicitly if a
    subgraph Q is what you want).
    """
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    canon = (e.filter(F.col("u") != F.col("v"))
             .select(F.least("u", "v").alias("a"),
                     F.greatest("u", "v").alias("b"))
             .distinct())
    asg = communities.select(
        F.col(node_col).cast("long").alias("node"),
        F.col(community_col).cast("long").alias("c"))
    ca = asg.select(F.col("node").alias("a"), F.col("c").alias("c_a"))
    cb = asg.select(F.col("node").alias("b"), F.col("c").alias("c_b"))
    untagged = (canon.join(ca, "a", "left").join(cb, "b", "left")
                .filter(F.col("c_a").isNull() | F.col("c_b").isNull())
                .count())
    if untagged:
        raise ValueError(
            f"modularity: {untagged} edges have an endpoint missing "
            "from `communities` — Q would mix denominators and bias "
            "low; assign every endpoint or filter the edge list first")
    tagged = canon.join(ca, "a").join(cb, "b")
    intra = (tagged.filter(F.col("c_a") == F.col("c_b"))
             .groupBy(F.col("c_a").alias("c"))
             .agg(F.count(F.lit(1)).alias("e_c")))
    deg = (tagged.select(F.col("c_a").alias("c"))
           .unionAll(tagged.select(F.col("c_b").alias("c")))
           .groupBy("c").agg(F.count(F.lit(1)).alias("deg_c")))
    per_c = (deg.join(intra, "c", "left")
             .select("c", "deg_c",
                     F.coalesce("e_c", F.lit(0)).alias("e_c")))
    agg = per_c.agg(
        F.count(F.lit(1)).alias("k"),
        F.sort_array(F.collect_list(F.struct(
            F.col("c").alias("c"), F.col("e_c").alias("e_c"),
            F.col("deg_c").alias("deg_c")))).alias("cs"))
    m_df = canon.agg(F.count(F.lit(1)).alias("m"))
    s = agg.crossJoin(F.broadcast(m_df))
    md = F.col("m").cast("double")
    q = F.aggregate(
        "cs", F.lit(0.0),
        lambda acc, x: acc + (x["e_c"].cast("double") / md
                              - (x["deg_c"].cast("double")
                                 / (F.lit(2.0) * md))
                              * (x["deg_c"].cast("double")
                                 / (F.lit(2.0) * md))))
    return s.select(F.col("m").cast("long").alias("m"),
                    F.col("k").cast("long").alias("n_communities"),
                    q.alias("q"))


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iterations: int = 4,
         scale: int = 1_000_000_000) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, "Authoritative sources in
    a hyperlinked environment", JACM 1999) in exact fixed-point
    integer arithmetic, the same oracle discipline as :func:`pagerank`:

        a'(v) = Σ_{u→v} h(u)        then L1-renormalize to ``scale``
        h'(u) = Σ_{u→v} a'(v)       then L1-renormalize to ``scale``

    Renormalization is integer too — ``x DIV max(total DIV scale, 1)``
    — so every iteration is a BIGINT join + sum and the result is
    bit-identical across partitionings and SQL engines (the gate
    oracle unrolls the same iterations as chained CTEs).  Classic HITS
    renormalizes in L2; L1 preserves the same ranking fixed point
    (both converge to the principal eigenvectors of AᵀA / AAᵀ up to
    scaling) and keeps the arithmetic exact.

    Scale shape: per half-step one edge⋈score join with a partial-
    aggregated groupBy, plus one scalar total pulled to the driver —
    the same driver-paced loop as :func:`bfs_hops` (one tiny action
    per half-step, bounded by ``iterations``, never by data size).
    Each raw-sum frame is persisted before its total is taken so the
    final plan reads the cache instead of re-deriving the whole
    lineage (a lazy scalar-broadcast here doubles the lineage per
    half-step — 2^(2·iterations) recomputations).  Overflow bound:
    each normalized vector sums to ≈``scale``, so a raw sum is ≤
    scale per node and the total ≤ scale·E; with the default
    ``scale`` = 1e9 that supports ~9×10⁹ edges in int64 — at a
    10¹²-edge graph pass ``scale=1e6``.

    Returns ``(node, kind, score)``, kind ∈ {'hub', 'auth'} (a node
    with both in- and out-edges appears twice, once per role).
    """
    scale = int(scale)
    # each half-step persists its raw-sum frame (the total is an
    # action, and the final plan must read the cache, not re-derive
    # the whole lineage); once the NEXT half-step has materialized,
    # everything older than the last two frames (the returned h and
    # a) is dead weight — unpersist it instead of leaking cached
    # blocks for the session
    persisted: list[DataFrame] = []

    def _normalize(raw: DataFrame, key: str) -> DataFrame:
        raw = raw.persist()
        tot = raw.agg(F.sum("raw").alias("t")).first()["t"]
        persisted.append(raw)
        while len(persisted) > 2:
            persisted.pop(0).unpersist()
        denom = max(int(tot) // scale, 1)
        return raw.select(F.col(key).alias("node"),
                          F.expr(f"raw DIV {denom}")
                           .cast("long").alias("s"))

    e = (edges.select(F.col(src).alias("src"),
                      F.col(dst).alias("dst")).distinct())
    h = (e.select(F.col("src").alias("node")).distinct()
          .withColumn("s", F.lit(scale).cast("long")))
    a = None
    for _ in range(int(iterations)):
        a = _normalize(e.join(h, e.src == h.node)
                        .groupBy("dst").agg(F.sum("s").alias("raw")),
                       "dst")
        h = _normalize(e.join(a, e.dst == a.node)
                        .groupBy("src").agg(F.sum("s").alias("raw")),
                       "src")
    return (h.select("node", F.lit("hub").alias("kind"),
                     F.col("s").alias("score"))
             .unionAll(a.select("node", F.lit("auth").alias("kind"),
                                F.col("s").alias("score"))))


def label_propagation(edges: DataFrame, src: str = "src",
                      dst: str = "dst", rounds: int = 3,
                      undirected: bool = True) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) with the
    DETERMINISTIC tie rule that makes it oracle-replayable: every node
    starts as its own label; each round every node adopts the most
    frequent label among its neighbors, ties broken by the SMALLEST
    label.  Bounded ``rounds`` (the kcore/pagerank discipline) keeps
    the operator deterministic and lets a SQL engine unroll the same
    rounds as CTEs — classic async LPA with random tie-breaking is
    neither.

    Returns (node, label, community_size) after the last round, for
    every node with ≥ 1 edge.  Nodes keep their own label only until
    a neighborhood vote exists (every node here has neighbors by
    construction).

    Scale shape per round: one labels→edges join + one (node, label)
    count + one per-node argmax window — the canonical iterative
    pattern; at 10^12 edges co-partition edges and labels on node id
    so the per-round join is shuffle-free on the big side.  Each
    round is materialized (localCheckpoint) so the unrolled lineage
    doesn't recompute round 0 exponentially.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    if undirected:
        e = symmetrize(e)
    e = e.filter(F.col("src") != F.col("dst"))
    labels = (e.select(F.col("src").alias("node")).distinct()
              .select("node", F.col("node").alias("label")))
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc())
    for _ in range(rounds):
        labels = labels.localCheckpoint(eager=True)
        votes = (e.join(labels.withColumnRenamed("node", "dst"),
                        "dst")
                 .groupBy(F.col("src").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("c")))
        labels = (votes
                  .withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .select("node", "label"))
    wsz = Window.partitionBy("label")
    return labels.select(
        "node", "label",
        F.count(F.lit(1)).over(wsz).alias("community_size"))


def weighted_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node_col: str = "node",
    undirected: bool = True,
) -> DataFrame:
    """Bounded Bellman–Ford single-source-set shortest paths with
    exact INTEGER edge weights: ``(node, dist)`` with the minimum
    total weight from any source reachable within ``max_rounds`` edge
    relaxations (unreached nodes absent).  The weighted companion of
    :func:`bfs_hops` — cost-limited blast radius, weighted similarity
    graphs, cheapest multi-hop reach.

    Each round is one join of the CURRENT distance table to the edge
    list plus a min-groupBy union — the standard Pregel-style
    relaxation, one node-keyed shuffle per round, results exact
    integers independent of partitioning.  Exactly ``max_rounds``
    relaxations are applied with NO driver-side convergence probe
    (a converged table is a fixed point, so extra rounds are
    harmless) — the SQL oracle replays the rounds as unrolled CTEs.
    Each round's distance table is materialized (localCheckpoint,
    the same convention as label_propagation/kcore in this module)
    so the union-of-union lineage doesn't recompute round 0
    exponentially."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(weight).cast("long").alias("w"))
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"), "w"))
    e = e.groupBy("src", "dst").agg(F.min("w").alias("w"))
    dist = (sources.select(F.col(node_col).alias("node")).distinct()
                   .withColumn("dist", F.lit(0).cast("long")))
    for _ in range(int(max_rounds)):
        dist = dist.localCheckpoint(eager=True)
        relaxed = (dist.join(e, dist.node == e.src)
                       .select(F.col("dst").alias("node"),
                               (F.col("dist") + F.col("w"))
                               .alias("dist")))
        dist = (dist.unionByName(relaxed)
                    .groupBy("node").agg(F.min("dist").alias("dist")))
    return dist.select("node", "dist")


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Per-node local clustering coefficient of the undirected simple
    graph — lcc(i) = triangles(i) / C(deg(i), 2), the classic "are my
    neighbors connected" feature next to :func:`triangle_count`'s
    global count.

    Same degree-orientation plan as triangle_count (wedge join
    bounded O(m^1.5), hub-proof), but the closing semi-join becomes a
    plain inner join so each found triangle {p, q, r} is kept and
    credited to ALL THREE corners via an array explode — per-node
    triangle counts stay exact int64 with one extra groupBy.  Nodes
    with deg < 2 get lcc = NULL (no possible wedge).  The division
    lcc = 2·tri / (deg·(deg−1)) is the one mirrored float expression.
    Returns one row per node: (node, degree, triangles, lcc)."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    canon = (e.filter(F.col("u") != F.col("v"))
             .select(F.least("u", "v").alias("a"),
                     F.greatest("u", "v").alias("b"))
             .distinct())
    deg = (canon.select(F.col("a").alias("node"))
           .union(canon.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da = deg.select(F.col("node").alias("a"),
                    F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"),
                    F.col("deg").alias("degb"))
    ranked = canon.join(da, "a").join(db, "b")
    a_first = ((F.col("dega") < F.col("degb"))
               | ((F.col("dega") == F.col("degb"))
                  & (F.col("a") < F.col("b"))))
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"))
    e1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("q"))
    e2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("r"))
    wedges = e1.join(e2, "p").filter(F.col("q") < F.col("r"))
    closing = oriented.select(
        F.least("lo", "hi").alias("q"), F.greatest("lo", "hi").alias("r"))
    tri = wedges.join(closing.distinct(), ["q", "r"])
    per_node = (tri.select(F.explode(F.array("p", "q", "r"))
                   .alias("node"))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("triangles")))
    out = deg.join(per_node, "node", "left").select(
        "node",
        F.col("deg").cast("long").alias("degree"),
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
         .alias("triangles"),
        F.when(F.col("deg") >= 2,
               F.lit(2.0)
               * F.coalesce(F.col("triangles"), F.lit(0))
                  .cast("double")
               / (F.col("deg").cast("double")
                  * (F.col("deg") - 1).cast("double"))).alias("lcc"))
    return out
