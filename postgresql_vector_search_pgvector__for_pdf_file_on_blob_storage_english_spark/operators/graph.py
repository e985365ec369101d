"""Iterative graph analytics: PageRank in fixed-point integer arithmetic.

PageRank (Page et al. 1999, public algorithm) is the canonical
iterative join+aggregate workload: each iteration is

    contrib(u -> v) = rank(u) / outdeg(u)
    rank'(v)        = (1 - d) / N + d * sum of incoming contribs

Scale shape: ``edges`` join ``ranks`` on src (shuffle keyed by src),
then a partial-aggregated groupBy dst — both map-side combinable, both
linear in |E| per iteration; the rank relation is |V|-sized.  No
driver-side state beyond the iteration counter.

**Fixed-point arithmetic is the determinism contract**: ranks are
BIGINT nano-units (UNIT = 1e9).  Every division is an exact integer
floor ``(x - x % y) / y`` and every aggregation is a sum of longs —
associative and order-free — so the result is bit-identical across
partitionings, engines, and replays (a float PageRank would differ in
ulps with summation order, poisoning a hash-compare oracle).  The mass
lost to floors only damps ranks uniformly; dangling-node mass is
dropped by default (the documented simplification) or redistributed
exactly with ``dangling="redistribute"`` — see :func:`pagerank`.  The
RANKING is the product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

UNIT = 1_000_000_000  # 1.0 of rank, in nano-units


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer floor division for non-negative longs, written so
    Spark and DuckDB evaluate it identically: the numerator is reduced
    to an exact multiple, making the double division exact."""
    return ((a - a % b) / b).cast("long")


def pagerank(
    edges: DataFrame,
    n_iters: int = 5,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize: bool = True,
    dangling: str = "drop",
) -> DataFrame:
    """Fixed-point PageRank; returns ``(node, rank_units)`` for every
    node appearing in ``edges`` (either side), ``rank_units`` in
    nano-units of probability mass.

    ``damping_pct`` is an integer percentage (85 = the classic 0.85) so
    the damping step stays in integer arithmetic.  Each iteration adds
    one join + one aggregate to the lineage; for hundreds of iterations
    checkpoint the rank table periodically too (same note as BPE
    training).

    ``materialize`` (default True) localCheckpoints the edge, node and
    out-degree relations ONCE — the standard iterative-lineage
    truncation: every iteration re-reads them from executor storage
    instead of re-deriving them through the upstream plan (~2x at 1M
    edges x 5 iterations, measured).  Pass False to keep the operator
    fully lazy.

    ``dangling`` (VERDICT r6 #9): ``"drop"`` (default) lets the rank
    mass of no-out-edge nodes leak each iteration — the documented
    simplification, which only damps ranks uniformly when the graph has
    no dangling nodes.  ``"redistribute"`` adds the standard correction:
    each iteration sums the dangling nodes' rank (one 1-row aggregate,
    kept in-plan and broadcast — no collect) and every node receives
    ``floor(d * D / (100 N))`` in the same exact integer arithmetic, so
    the fixed-point bit-determinism contract is preserved and the oracle
    can replay the term as a per-step CTE.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    if n_iters < 0:
        raise ValueError(f"n_iters must be >= 0, got {n_iters}")
    if dangling not in ("drop", "redistribute"):
        raise ValueError(
            f"dangling must be 'drop' or 'redistribute', got {dangling!r}"
        )
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if materialize:
        e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("_outdeg")
    )
    if materialize:
        # outdeg broadcasts into every iteration's contrib join;
        # without a pin each iteration re-runs the degree groupBy from
        # the edge checkpoint (r13 opt)
        outdeg = outdeg.localCheckpoint(eager=False)
    redistribute = dangling == "redistribute"
    if redistribute:
        # r13 opt (flag, not join): the per-step dangling-mass term
        # needs "sum of rank over nodes with no out-edge".  The old
        # shape kept a separate `dang` relation and ran a |V|-sized
        # left-semi join against the rank relation EVERY step; tagging
        # each node once with `_dang` (outdeg missing) and carrying the
        # flag through the rank relation turns every step's mass term
        # into a plain filtered 1-row aggregate — n_iters semi-joins
        # removed, the summed set (and therefore every rank) identical.
        nodes = nodes.join(outdeg, "node", "left").select(
            "node", F.col("_outdeg").isNull().cast("int").alias("_dang")
        )
    if materialize:
        # nodes joins into every iteration's spine; without a pin each
        # iteration re-runs the union+distinct (and, under
        # redistribute, the flag join) from the edge checkpoint (r13)
        nodes = nodes.localCheckpoint(eager=False)
    n = nodes.agg(F.count(F.lit(1)).alias("_n"))

    # rank_0 = UNIT / N for every node; base = (100 - d) * UNIT / (100 N)
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        *nodes.columns, _idiv(F.lit(UNIT), F.col("_n")).alias("rank_units")
    )
    base = _idiv(F.lit((100 - damping_pct) * UNIT), F.lit(100) * F.col("_n"))

    for _ in range(n_iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(F.broadcast(outdeg.withColumnRenamed("node", "src")), "src")
            .select(
                F.col("dst").alias("node"),
                _idiv(F.col("rank_units"), F.col("_outdeg")).alias("_c"),
            )
        )
        incoming = contrib.groupBy("node").agg(F.sum("_c").alias("_in"))
        nxt = (
            nodes.join(incoming, "node", "left")
            .crossJoin(F.broadcast(n))
        )
        rank_expr = base + _idiv(
            F.lit(damping_pct) * F.coalesce(F.col("_in"), F.lit(0)),
            F.lit(100),
        )
        if redistribute:
            # Dangling mass this step: a 1-row filtered sum over the
            # |V|-sized rank relation (the carried `_dang` flag — no
            # join), broadcast back as a scalar — the redistribution
            # term floor(d * D / (100 N)) stays in exact integer
            # arithmetic.
            dmass = ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("_dang") == 1, F.col("rank_units"))),
                    F.lit(0),
                ).alias("_dm")
            )
            nxt = nxt.crossJoin(F.broadcast(dmass))
            rank_expr = rank_expr + _idiv(
                F.lit(damping_pct) * F.col("_dm"), F.lit(100) * F.col("_n")
            )
        ranks = nxt.select(*nodes.columns, rank_expr.alias("rank_units"))
        if materialize:
            # Per-iteration lineage cut: iteration i's rank relation is
            # read TWICE by iteration i+1 (contrib join + the dangling
            # mass aggregate), so without this the plan tree doubles
            # per step — measured as 92 node-keyed exchanges for 4
            # dangling iterations before the cut, 1 per step after.
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank_units")


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Distinct co-occurrence edges ``(u, v), u < v``: items appearing
    in the same order.  One self-join keyed on the order id (shuffle
    bounded by the fact table), then distinct — the standard
    market-basket graph builder; per-order fan-out is quadratic only in
    the small per-order item count."""
    a = lineitem.select(F.col(order_col).alias("_o"), F.col(item_col).alias("u"))
    b = lineitem.select(F.col(order_col).alias("_o"), F.col(item_col).alias("v"))
    return (
        a.join(b, "_o")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected simple graph given as ``(u, v), u < v`` distinct edges.

    The MapReduce-classic degree orientation (Suri & Vassilvitskii
    2011, "Counting triangles and the curse of the last reducer"):
    orient every edge from the (degree, id)-smaller endpoint to the
    larger, so each wedge is generated at its LOWEST-ordered vertex and
    each triangle is produced exactly once.  Orientation caps per-vertex
    out-degree at O(sqrt(|E|)) regardless of skew — a celebrity vertex
    with a million neighbors generates no wedges at all (every edge
    points INTO it), which is what makes the wedge join feasible at
    scale where a naive u<v orientation squares the heavy tail.

    Shuffles: degree aggregate (|V|), two keyed joins to attach
    endpoint orders, the wedge self-join keyed on the apex, and the
    closing semi-join keyed on (b, c).  All integers; the clustering
    coefficient 3T / wedges is the single rounded float.
    """
    sym = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = edges.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # consumed by both wedge sides AND the closing semi-join — pin one
    # computation of the degree-attachment joins (r13 opt, the same
    # branch-copy discipline as the link-prediction operators)
    oriented = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    ).localCheckpoint(eager=False)
    e1 = oriented.select(
        F.col("src").alias("_a"), F.col("dst").alias("_b"), F.col("ddeg").alias("_bd")
    )
    e2 = oriented.select(
        F.col("src").alias("_a"), F.col("dst").alias("_c"), F.col("ddeg").alias("_cd")
    )
    wedges = e1.join(e2, "_a").filter(
        (F.col("_bd") < F.col("_cd"))
        | ((F.col("_bd") == F.col("_cd")) & (F.col("_b") < F.col("_c")))
    )
    closing = oriented.select(
        F.col("src").alias("_b"), F.col("dst").alias("_c")
    )
    tri = wedges.join(closing, ["_b", "_c"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = deg.agg(
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges")
    )
    return (
        n_edges.crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 4
            ).alias("global_clustering"),
        )
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round over a SYMMETRIC edge relation: every node u
    links each strictly-greater neighbor to min(N(u) + {u}).  GroupBy +
    re-join keyed on u — linear in |E|; the min aggregate is map-side
    partial, so a celebrity node costs one combine, not a hot reducer."""
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("u"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .distinct()
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """One small-star round: every node u links its not-greater
    neighborhood (and itself) to min(N_<=(u)).  Same linear shape."""
    lesser = sym.filter(F.col("v") < F.col("u"))
    mins = lesser.groupBy("u").agg(F.min("v").alias("_mn"))
    leaf_edges = (
        lesser.join(mins, "u")
        .filter(F.col("v") != F.col("_mn"))
        .select(F.col("v").alias("u"), F.col("_mn").alias("v"))
    )
    self_edges = mins.select("u", F.col("_mn").alias("v"))
    return leaf_edges.unionAll(self_edges).distinct()


def connected_components(
    edges: DataFrame,
    rounds: int = 5,
    check_converged: bool = True,
    self_loops: bool = True,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii
    2014, "Connected Components in MapReduce and Beyond" — the
    100 TB-scale CC algorithm: O(log^2 n) rounds worst case, a handful
    in practice, every round linear in |E| with map-side-combinable
    aggregates and no driver state).

    ``edges``: undirected simple graph as distinct ``(u, v)`` pairs
    (orientation irrelevant).  Returns ``(node, component)`` for every
    node incident to an edge, where ``component`` is the MINIMUM node
    id of the component — so the labeling is partitioning-independent
    and a ground-truth oracle can verify it without replaying rounds.

    ``rounds`` is fixed (not a driver-side convergence loop) so the
    computation is replayable; with ``check_converged`` the final edge
    set is asserted to be a forest of stars — every leaf has exactly
    one distinct neighbor, and no node appears on both sides — which
    PROVES the labels are the true component minima (one more round
    would be a no-op).  A non-converged graph raises rather than
    returning a plausible-but-wrong labeling.

    ``self_loops=False`` is a caller ASSERTION that ``edges`` cannot
    contain ``u == v`` rows (e.g. a lag-chain where v is strictly the
    next row of the same partition), skipping the self-loop weave and
    its shared edge checkpoint entirely.
    """
    proj = edges.select(
        F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v")
    )
    # One checkpointed (u, v) projection feeds BOTH the star rounds and
    # the self-loop weave below: edges is often an expensive derived
    # relation (the episodes entry builds it with a per-customer window
    # pass), and before r10 the self-loop branch re-derived it in full
    # even when the graph has no self-loops at all (VERDICT r9 #2 —
    # the graph_order_episodes drift).  The checkpoint stores |E| longs
    # once — the same order of local storage each star round already
    # uses — and every consumer reads the materialized copy.
    base = proj.localCheckpoint(eager=False) if self_loops else proj
    cur = base.filter(F.col("u") != F.col("v")).distinct()
    for i in range(rounds):
        sym = cur.unionAll(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        cur = _small_star(_large_star(sym))
        # Lineage doubles per round; cut it so round r+1's plan does not
        # re-derive rounds 1..r (the PageRank localCheckpoint pattern).
        cur = cur.localCheckpoint(eager=False)
    if check_converged:
        # Both convergence facts — every leaf has exactly one parent
        # (n_edges == n_distinct_u) and no node sits on both sides —
        # fall out of ONE side-tagged per-node aggregation over the
        # checkpointed forest.  The old shape ran two blocking jobs
        # (an agg collect, then a semi-join count); this is one job,
        # map-side combinable, same raise conditions (r13 opt).
        tagged = cur.select(
            F.col("u").alias("node"), F.lit(1).alias("_l"), F.lit(0).alias("_r")
        ).unionAll(
            cur.select(F.col("v").alias("node"), F.lit(0).alias("_l"), F.lit(1).alias("_r"))
        )
        per_node = tagged.groupBy("node").agg(
            F.max("_l").alias("_ml"), F.max("_r").alias("_mr"), F.sum("_l").alias("_su")
        )
        stats = per_node.agg(
            F.coalesce(F.sum("_su"), F.lit(0)).alias("n_edges"),
            F.coalesce(F.sum("_ml"), F.lit(0)).alias("n_leaves"),
            F.coalesce(F.sum(F.col("_ml") * F.col("_mr")), F.lit(0)).alias("overlap"),
        ).collect()[0]
        if stats.n_edges != stats.n_leaves:
            raise RuntimeError(
                f"connected_components: not converged after {rounds} rounds "
                f"(a leaf keeps {stats.n_edges - stats.n_leaves + 1} parents); raise `rounds`"
            )
        if stats.overlap:
            raise RuntimeError(
                f"connected_components: not converged after {rounds} rounds "
                f"({stats.overlap} interior nodes); raise `rounds`"
            )
    roots = cur.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    leaves = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    labeled = leaves.unionAll(roots)
    # Nodes whose ONLY edges are self-loops vanish at the u != v filter
    # but are still "incident to an edge" (ADVICE r8): weave them back
    # as size-1 components.  One anti-join bounded by the distinct
    # self-loop nodes — empty (and the filter free) on simple graphs.
    if not self_loops:
        return labeled
    self_only = (
        base.filter(F.col("u") == F.col("v"))
        .select(F.col("u").alias("node"))
        .distinct()
        .join(labeled.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return labeled.unionAll(self_only)


def bfs_levels(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Breadth-first reachability: ``(node, hop)`` with the MINIMUM hop
    count from any seed, up to ``max_hops``.  ``edges`` is a directed
    ``(src, dst)`` relation (symmetrize for undirected graphs);
    ``seeds`` a ``(node)`` relation.

    The distributed-BFS shape: each level is one keyed join (frontier
    x edges), a distinct, and an anti join against the visited set —
    per-level cost tracks frontier-edge fan-out, never |V|^2; the
    visited relation grows monotonically and is localCheckpointed so
    level L+1's plan does not re-derive levels 1..L.  Level count is
    FIXED (replayable, oracle-unrollable), the standard bounded-hop
    form of reachability reporting ("accounts within 3 hops of a
    flagged entity")."""
    visited = seeds.select(F.col("node").cast("long").alias("node")).distinct().select(
        "node", F.lit(0).alias("hop")
    ).localCheckpoint(eager=False)
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("hop"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionAll(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return visited


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002, public
    method) over an undirected graph: seeds are CLAMPED, every other
    node takes the majority label of its labeled neighbors each round
    (ties: lexicographically smallest label — a total order, so the
    fixpoint is partitioning-independent).  Returns ``(node, label)``
    for every node labeled after ``iters`` rounds.

    ``edges``: ``(u, v)`` undirected pairs; ``seeds``: ``(node,
    label)``.  Each round is one keyed join (labels x symmetric edges)
    + a count groupBy + a per-node argmax window — all linear in |E|,
    map-side-combinable, localCheckpointed between rounds.
    """
    from pyspark.sql import Window

    sym = edges.select(
        F.col("u").cast("long").alias("src"), F.col("v").cast("long").alias("dst")
    )
    sym = sym.unionAll(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # A node seeded twice with different labels would propagate BOTH and
    # emit two rows in the result; collapse to the lexicographically
    # smallest (the same total order the vote tiebreak uses).
    clamped = (
        seeds.select(
            F.col("node").cast("long").alias("node"),
            F.col("label").cast("string").alias("label"),
        )
        .groupBy("node")
        .agg(F.min("label").alias("label"))
        .localCheckpoint(eager=False)
    )
    labels = clamped
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), "label")
    for _ in range(iters):
        votes = (
            labels.join(sym, labels.node == sym.src)
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        inferred = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
            .join(clamped.select("node"), "node", "left_anti")
        )
        labels = clamped.unionAll(inferred).localCheckpoint(eager=False)
    return labels


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iters: int = 4,
    damping_pct: int = 85,
) -> DataFrame:
    """Personalized PageRank (random walk with restart): teleport mass
    returns to the SEED set instead of spreading uniformly — the
    classic graph-based recommender ("parts related to this part by
    co-purchase walk", Haveliwala 2002, public method).  Same
    fixed-point integer contract as :func:`pagerank`: BIGINT nano-unit
    ranks, exact floors, order-free sums — bit-identical across
    partitionings and replayable as unrolled SQL.

    ``edges``: directed ``(src, dst)``; ``seeds``: ``(node)``.  Rank
    starts as UNIT/|S| on seeds and 0 elsewhere; each iteration is

        rank'(v) = [v in S] * (100 - d) * UNIT / (100 |S|)
                 + d * sum_incoming floor(rank(u) / outdeg(u)) / 100

    Per-iteration cost: one |E|-keyed join + a partial-agg groupBy —
    identical shape to the uniform walk; the seed indicator joins as a
    broadcast."""
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    if n_iters < 0:
        raise ValueError(f"n_iters must be >= 0, got {n_iters}")
    e = edges.select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
    e = e.localCheckpoint(eager=True)
    s = seeds.select(F.col("node").cast("long").alias("node")).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(s.select("node"))
        .distinct()
    )
    ns = s.agg(F.count(F.lit(1)).alias("_ns"))
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("_outdeg")
    )
    seeded = nodes.join(s.withColumn("_is_seed", F.lit(1)), "node", "left").select(
        "node", F.coalesce("_is_seed", F.lit(0)).alias("_is_seed")
    ).crossJoin(F.broadcast(ns)).localCheckpoint(eager=True)
    base = F.col("_is_seed") * _idiv(
        F.lit((100 - damping_pct) * UNIT), F.lit(100) * F.col("_ns")
    )
    ranks = seeded.select(
        "node", (F.col("_is_seed") * _idiv(F.lit(UNIT), F.col("_ns"))).alias("rank_units")
    )
    for _ in range(n_iters):
        contrib = (
            ranks.join(outdeg, "node")
            .join(e, ranks.node == e.src)
            .select(
                F.col("dst").alias("node"),
                _idiv(F.col("rank_units"), F.col("_outdeg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            seeded.join(contrib, "node", "left")
            .select(
                "node",
                "_is_seed",
                "_ns",
                F.coalesce("_in", F.lit(0)).alias("_in"),
            )
            .select(
                "node",
                (base + _idiv(F.lit(damping_pct) * F.col("_in"), F.lit(100))).alias("rank_units"),
            )
        )
    return ranks


def hits(
    edges: DataFrame,
    n_iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Fixed-point HITS (Kleinberg 1999, public method) over a directed
    graph; returns ``(node, hub_units, auth_units)`` for every node, in
    integer nano-units of L1-normalized score mass.

    Uses L1 normalization instead of the classic L2 so every step stays
    in exact integer arithmetic (the ranking it induces is identical —
    normalization only rescales): each half-step is

        auth_raw(v) = sum_{u->v} hub(u)          (order-free BIGINT sum)
        auth(v)     = floor(auth_raw * UNIT / sum_w auth_raw(w))

    then symmetrically for hubs from the NEW auth scores.  The
    normalizing division runs through DECIMAL(38,0) (:func:`_idiv_unit`)
    so ``raw * UNIT`` cannot overflow; raw totals themselves are bounded
    by ``|E| * UNIT`` — document limit ``|E| < 9e9`` per shard, far past
    the fixture and bench scales (shard the graph above that).

    Bit-identical across partitionings, so a DuckDB oracle replays the
    loop as unrolled CTE stages with HUGEINT arithmetic.  Per
    iteration: two |E|-keyed join+partial-agg passes and two 1-row
    total aggregates (broadcast back in-plan — no collect).
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    if materialize:
        e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if materialize:
        nodes = nodes.localCheckpoint(eager=True)

    def _l1_normalize(scored: DataFrame, col: str) -> DataFrame:
        # scored (|V| rows) is read twice — the L1 total and the
        # normalize projection; as a plain branch each read re-ran the
        # half-step's |E| join+groupBy (r13 opt) — pin it
        if materialize:
            scored = scored.localCheckpoint(eager=False)
        tot = scored.agg(F.sum(col).alias("_tot"))
        return (
            scored.crossJoin(F.broadcast(tot))
            .select(
                "node",
                F.expr(
                    f"CAST((CAST({col} AS DECIMAL(38,0)) * {UNIT}) div "
                    f"CAST(_tot AS DECIMAL(38,0)) AS LONG)"
                ).alias(col),
            )
        )

    # r14 opt: the per-iteration "fill absent nodes with 0" joins
    # (nodes LEFT JOIN raw, 2 x |V| x |V| per iteration) are gone —
    # zero-score rows contribute nothing anywhere they were used:
    #   * the L1 total is unchanged (zeros add 0),
    #   * normalization of a zero row yields 0, and the next half-step
    #     join contributes 0 for it — identical to the row being absent,
    #   * every edge still matches: auth_raw's domain is exactly the
    #     dst side of e and hub_raw's the src side, so e ⋈ score joins
    #     hit every edge with or without the fill.
    # The final SELECT already left-joins + coalesces, so returned rows
    # are identical.  The post-normalize checkpoints also go: each
    # normalized relation has exactly ONE consumer (the next half-step
    # join; the loop exit's is the final select), and the lineage is
    # already cut at the pinned pre-normalize relation — 2 pins per
    # iteration instead of 4, and 2 fewer |V| joins.
    hub = nodes.select("node", F.lit(UNIT).cast("long").alias("hub_units"))
    auth = None
    for _ in range(n_iters):
        auth_raw = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_units").alias("auth_units"))
        )
        auth = _l1_normalize(auth_raw, "auth_units")
        hub_raw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_units").alias("hub_units"))
        )
        hub = _l1_normalize(hub_raw, "hub_units")
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce("hub_units", F.lit(0)).alias("hub_units"),
            F.coalesce("auth_units", F.lit(0)).alias("auth_units"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    n_rounds: int = 8,
    u_col: str = "u",
    v_col: str = "v",
    assert_fixpoint: bool = True,
) -> DataFrame:
    """k-core decomposition membership (Seidman 1983, public method) by
    the standard peel: repeatedly delete nodes of degree < k from the
    undirected simple graph until none remain.  Returns ``(node,
    degree)`` — the surviving nodes with their degree *inside* the
    core.

    ``edges``: ``(u, v)`` undirected pairs (self-loops dropped — a
    self-loop cannot contribute to coreness).  The peel runs a FIXED
    ``n_rounds`` so a SQL oracle can replay it as unrolled CTE stages;
    with ``assert_fixpoint`` (default) one extra degree pass then
    PROVES convergence — if any surviving node still has degree < k the
    operator raises instead of returning a non-core — the same
    fixpoint-proof pattern as connected_components' star-forest check.

    Each round: one map-side-combinable degree count over the canonical
    (u < v) edge list + two anti-joins against the round's DROPPED node
    set (an edge survives iff neither end dropped) — linear in |E|,
    localCheckpointed so the lineage stays one round deep.  Peeling is
    monotone (nodes only leave), so round count is bounded by the
    graph's degeneracy ordering depth; real corpora converge in a
    handful of rounds, after which dropped is empty and the anti-join
    passes edges through against a broadcast-sized (empty) build side.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    base = edges.select(
        F.col(u_col).cast("long").alias("u"), F.col(v_col).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    # r14 opt (VERDICT r13 item 3, guide §2.3 — shrink the peel's
    # shuffled bytes, not its join shape): the peel state is now the
    # CANONICAL (u < v) distinct edge list — half the rows of the old
    # symmetric list — and each round's degree comes from exploding
    # both endpoints into a map-side-combinable count.  Degrees are
    # identical (node n appears once per incident edge either way), so
    # every surviving edge — and the returned (node, degree) rows — are
    # unchanged.  Every per-round relation (checkpoint materialization,
    # degree scan, filter joins) moves half the bytes.
    canon = (
        base.select(
            F.least(F.col("u"), F.col("v")).alias("u"),
            F.greatest(F.col("u"), F.col("v")).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # r13 opt note: an early-exit variant (per-round `degree < k` count,
    # break at the fixpoint) was implemented and MEASURED SLOWER at the
    # bench fixture — each per-round driver action costs ~1-2 s of job
    # latency here while the skipped no-op rounds run as a single lazy
    # cascade in one action (~5 s total for all 12).  The peel depth at
    # the gated fixtures is <= 5, so 7+ rounds are no-ops, yet skipping
    # them does not pay for 5 synchronous round-trips.  At 100 TB the
    # trade inverts (a no-op round is a full |E| pass); a deployment
    # driving hundreds of rounds should add the check every N rounds.
    # r13 opt note (#3, window peel): a join-free round — deg(u)/deg(v)
    # as count() over (partition by u / v) windows on the symmetric
    # list, filter both ends — was implemented, oracle-verified at both
    # SFs, and A/B'd in-session (7 alternating reps): OLD 4.183/4.062
    # med/min vs NEW 4.221/4.136 — a wash.  Makes sense on bytes: the
    # degree groupBys partial-aggregate map-side, so BOTH forms shuffle
    # the full edge list exactly twice per round; the window form only
    # removes join machinery while adding per-node sort/buffering, and
    # a hub key in WindowExec cannot be split by AQE, where the
    # semi-join's skewed partition can.  Kept the join form.
    # r14 opt (same verdict item): filter against the DROPPED node set
    # (degree < k this round) with anti-joins instead of the survivor
    # set with semi-joins.  Equivalent by construction — every endpoint
    # of a live edge appears in the degree relation, so "u not in
    # dropped" <=> "u in keep" — but dropped SHRINKS round over round
    # (empty once converged), so AQE can demote each filter join to a
    # broadcast at runtime where the |V|-sized keep side never could.
    e = canon
    for _ in range(n_rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        # dropped feeds both anti-joins from the round's pinned e; a
        # per-round localCheckpoint of it was measured SLOWER at bench
        # scale in the r13 keep-pin experiment (adds a blocking job
        # boundary every round), so the degree aggregation runs twice
        # off the checkpointed edges instead.
        dropped = deg.filter(F.col("degree") < k).select("node")
        e = (
            e.join(dropped.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(dropped.withColumnRenamed("node", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
    final_deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    if assert_fixpoint:
        n_below = final_deg.filter(F.col("degree") < k).count()
        if n_below:
            raise RuntimeError(
                f"kcore(k={k}) did not converge in {n_rounds} rounds: "
                f"{n_below} surviving nodes still below degree {k}; raise n_rounds"
            )
    return final_deg


def link_prediction_jaccard(
    edges: DataFrame,
    max_center_degree: int = 64,
    k: int = 20,
) -> DataFrame:
    """Common-neighbor / Jaccard link prediction over an undirected
    simple graph given as ``(u, v), u < v`` distinct edges: for every
    NON-adjacent pair sharing at least one neighbor, score
    ``jaccard = |N(u) ∩ N(w)| / |N(u) ∪ N(w)|`` and return the top-k
    predicted links.

    Wedges are generated at their CENTER vertex (the shared neighbor),
    which is quadratic in the center's degree — so centers above
    ``max_center_degree`` are dropped before the pair join, the
    standard hub-suppression lever (a hub connected to everything
    predicts nothing: its wedges are noise, and at 100x it is exactly
    the curse-of-the-last-reducer key).  The cap bounds per-center
    fan-out at cap^2 and makes the candidate stage linear in |E| * cap.
    Degrees in the Jaccard denominator stay the TRUE degrees (the cap
    only prunes candidate GENERATION).

    Scores are exact ppm integers — ``cn * 10^6 div (deg_u + deg_w -
    cn)`` — ranked with (score desc, cn desc, u, w) tiebreaks.
    """
    # edges is typically an EXPENSIVE derived relation (the co-purchase
    # builder is a fact-table self-join + distinct) and it feeds the
    # wedge machinery AND the non-adjacency anti-join; sym/deg/cc are
    # each read 2-3 times downstream.  Without lineage cuts every branch
    # re-derives the whole chain from the source — 52 parquet scans / 44
    # exchanges measured in the gated entry's plan (r13 opt:
    # plans/r13/graph_link_prediction_jaccard_before.txt).  Lazy
    # checkpoints pin each relation to one computation (|E|-order local
    # storage, the same budget the star rounds use).
    edges = edges.localCheckpoint(eager=False)
    sym = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=False
    )
    # adjacency keyed by CENTER (the neighbor), true-degree preserved
    centered = sym.select(F.col("nbr").alias("c"), F.col("node").alias("x"))
    small_centers = deg.filter(F.col("deg") <= max_center_degree).select(
        F.col("node").alias("c")
    )
    cc = centered.join(small_centers, "c").localCheckpoint(eager=False)
    a = cc.select("c", F.col("x").alias("pu"))
    b = cc.select("c", F.col("x").alias("pw"))
    cand = (
        a.join(b, "c")
        .filter(F.col("pu") < F.col("pw"))
        .groupBy("pu", "pw")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    # drop already-adjacent pairs (edges are (u, v) with u < v, same order)
    non_adj = cand.join(
        edges.withColumnRenamed("u", "pu").withColumnRenamed("v", "pw"),
        ["pu", "pw"],
        "left_anti",
    )
    scored = (
        non_adj.join(deg.withColumnRenamed("node", "pu").withColumnRenamed("deg", "deg_u"), "pu")
        .join(deg.withColumnRenamed("node", "pw").withColumnRenamed("deg", "deg_w"), "pw")
        .withColumn(
            "jaccard_ppm",
            F.expr("(cn * CAST(1000000 AS BIGINT)) div (deg_u + deg_w - cn)"),
        )
    )
    return (
        scored.orderBy(
            F.col("jaccard_ppm").desc(), F.col("cn").desc(), "pu", "pw"
        )
        .limit(k)
        .select(
            F.col("pu").alias("u"), F.col("pw").alias("w"),
            "cn", "deg_u", "deg_w", "jaccard_ppm",
        )
    )


def link_prediction_adamic_adar(
    edges: DataFrame,
    max_center_degree: int = 64,
    k: int = 20,
) -> DataFrame:
    """Adamic-Adar link prediction over the same wedge machinery as
    :func:`link_prediction_jaccard` — but each shared neighbor z
    contributes 1/ln(deg(z)) instead of 1, so RARE shared neighbors
    dominate (sharing a 3-degree niche part predicts a link; sharing a
    hub predicts nothing).  The standard second baseline next to
    Jaccard in every link-prediction benchmark (Liben-Nowell & Kleinberg
    2003).

    Exactness: a float sum over wedges would be partition-order-
    dependent, so each center's term is quantized FIRST —
    ``term = 10^12 div ln_micro(deg)`` with ``ln_micro(d) =
    floor(ln(d) * 10^6 + 0.5)`` from the identical integer degree on
    both engines — and the score is an order-free INTEGER sum of those
    terms.  Centers need deg >= 2 to form a wedge (ln(1) = 0 never
    divides).  Hub capping and tiebreaks mirror the Jaccard operator;
    true degrees are reported alongside.
    """
    # same lineage-cut discipline as link_prediction_jaccard (r13 opt):
    # edges/deg/cc are each consumed by 2-3 downstream branches, and the
    # un-checkpointed plan re-derived the co-purchase self-join once per
    # branch (52 parquet scans measured).
    edges = edges.localCheckpoint(eager=False)
    sym = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=False
    )
    centers = (
        deg.filter((F.col("deg") >= 2) & (F.col("deg") <= max_center_degree))
        .select(
            F.col("node").alias("c"),
            F.expr(
                "CAST(1000000000000 AS BIGINT)"
                " div CAST(floor(ln(CAST(deg AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
            ).alias("term"),
        )
    )
    cc = sym.select(F.col("nbr").alias("c"), F.col("node").alias("x")).join(
        centers, "c"
    ).localCheckpoint(eager=False)
    a = cc.select("c", F.col("x").alias("pu"), "term")
    b = cc.select("c", F.col("x").alias("pw"))
    cand = (
        a.join(b, "c")
        .filter(F.col("pu") < F.col("pw"))
        .groupBy("pu", "pw")
        .agg(F.count(F.lit(1)).alias("cn"), F.sum("term").alias("aa_micro"))
    )
    non_adj = cand.join(
        edges.withColumnRenamed("u", "pu").withColumnRenamed("v", "pw"),
        ["pu", "pw"],
        "left_anti",
    )
    # r14 opt tried and REVERTED (measured): ranking + limit BEFORE the
    # two degree-decoration joins (the sort key doesn't involve deg) —
    # A/B med/min 3.409/3.270 -> 3.797/3.248 s.  The mid-plan
    # orderBy+limit loses the terminal TakeOrderedAndProject (a global
    # sort + single-partition exchange appears instead), which costs
    # more than decorating the candidate pairs.  Kept the decorate-
    # then-TakeOrdered form.
    scored = non_adj.join(
        deg.withColumnRenamed("node", "pu").withColumnRenamed("deg", "deg_u"), "pu"
    ).join(deg.withColumnRenamed("node", "pw").withColumnRenamed("deg", "deg_w"), "pw")
    return (
        scored.orderBy(F.col("aa_micro").desc(), F.col("cn").desc(), "pu", "pw")
        .limit(k)
        .select(
            F.col("pu").alias("u"), F.col("pw").alias("w"),
            "cn", "deg_u", "deg_w", "aa_micro",
        )
    )


def hash_walks(
    edges: DataFrame,
    n_steps: int = 4,
    broadcast_frontier: bool | None = None,
) -> DataFrame:
    """Deterministic 'random' walks — the corpus-generation stage of
    DeepWalk/node2vec-style graph embeddings: one walk per node, each
    step choosing among the current vertex's neighbors by a salted
    hash of (position, current, start).  Every walk is replayable
    bit-for-bit (no RNG state, no seed coordination across executors)
    — the property that makes a 1000-executor walk corpus resumable
    and its oracle checkable.

    Returns ``(start, path)`` where path is the '->'-joined vertex
    list (length n_steps + 1).  Walks stop early at sinks (isolated
    direction) only if the graph is directed; edges here are treated
    UNDIRECTED as ``(u, v), u < v`` distinct pairs.

    Scale shape: one degree/rank table (per-node partitioned window),
    then n_steps keyed joins — each linear in |V| walks, with the
    neighbor lookup a (node, rank) equi-join, never a per-row UDF.

    ``broadcast_frontier`` (r14 opt, guide §3.1 — pick the join
    strategy deliberately): each step joins the |V|-row frontier
    against the 2|E|-row adjacency; when the frontier fits a broadcast,
    building it as the BHJ build side means the adjacency is never
    shuffled OR sorted — each step becomes one streamed pass over the
    pinned adjacency (measured −21%% at sf0.1, where |V|=20k vs
    2|E|=2.39M).  ``None`` (default) decides from the data: one |V|
    count against ``SPARK_GRAFT_WALK_BC_MAX_ROWS`` (default 2M rows ~
    tens of MB built — well inside guide §3.1's broadcast comfort
    zone).  A 100 TB graph with billions of walks fails the guard and
    keeps today's sort-merge plan.
    """
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    sym = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    w = Window.partitionBy("node").orderBy("nbr")
    # The adjacency is joined by EVERY step; without the lineage cut
    # each step's plan re-derives the edge relation, the symmetric
    # union and the ranking window from the source — measured 8
    # SortMergeJoins / 78 Exchanges in the 4-step plan, zero reuse
    # (r13 opt: plans/r13/graph_walk_corpus_before.txt).  Checkpoints
    # pin it to a single computation, the same iterative-lineage
    # discipline as pagerank/hits.
    #
    # r13 opt (step fusion): the old loop joined TWO relations per
    # step — deg (to mod the hash) then ranked on (cur, rk).  Attaching
    # the DESTINATION vertex's degree to every adjacency row once at
    # build time means a walk arrives at its next vertex already
    # carrying that vertex's degree, so the per-step deg join
    # disappears: n_steps joins instead of 2 x n_steps, at the cost of
    # one build-time |2E| x |V| join (run once, checkpointed).  deg is
    # recovered as count() over the SAME per-node partition as the
    # ranking window (one exchange, one sort); values are identical to
    # the old groupBy/max(rk) relation, so rk picks — and therefore
    # every path string — are bit-identical.
    base = (
        sym.withColumn("rk", F.row_number().over(w))
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("node")))
        .localCheckpoint(eager=False)
    )
    ndeg = base.filter(F.col("rk") == 1).select(
        F.col("node").alias("nbr"), F.col("deg").alias("nbr_deg")
    )
    ranked = (
        base.join(ndeg, "nbr")
        .select("node", "rk", "nbr", "nbr_deg")
        .localCheckpoint(eager=False)
    )

    # r14 opt (VERDICT r13 item 1, guide §2.3): the frontier used to
    # carry the CONCATENATED PATH STRING through every per-step
    # exchange, so the per-step shuffle payload grew O(steps).  The
    # frontier now carries only fixed-width (start, cur, deg) rows;
    # each step emits a narrow (start, step, v) visit row off the
    # step's pinned frontier, and the path string is assembled ONCE at
    # the end — a single map-side-combinable conditional aggregation
    # per walk (steps are unique per start, so max(when(step=i, v))
    # recovers each position exactly) followed by one concat_ws.  The
    # per-step pins replace the implicit lineage chain: each join is
    # still computed exactly once, and the assembled strings are
    # bit-identical (same cast long -> string rendering, same '->'
    # separator, every walk has exactly n_steps+1 visits because every
    # node in the symmetric adjacency has deg >= 1).
    if broadcast_frontier is None:
        import os as _os

        max_rows = int(_os.environ.get("SPARK_GRAFT_WALK_BC_MAX_ROWS", "2000000"))
        # one bounded count over the pinned base (|V| rows pass the
        # filter); base materializes here instead of at the first
        # action — same total work, and the answer picks the join
        # strategy for every step
        broadcast_frontier = (
            base.filter(F.col("rk") == 1).count() <= max_rows
        )
    cur = base.filter(F.col("rk") == 1).select(
        F.col("node").alias("start"),
        F.col("node").alias("cur"),
        F.col("deg").alias("deg"),
    )
    visits = [cur.select("start", F.lit(0).alias("step"), F.col("cur").alias("v"))]
    for pos in range(1, n_steps + 1):
        pick = cur.withColumn(
            "rk",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "§",
                                F.lit(f"walk{pos}"),
                                F.col("cur").cast("string"),
                                F.col("start").cast("string"),
                            )
                        ),
                        1, 15,
                    ),
                    16, 10,
                ).cast("long") % F.col("deg")
            ) + 1,
        )
        if broadcast_frontier:
            pick = F.broadcast(pick)
        stepped = pick.join(
            ranked.withColumnRenamed("node", "cur"), ["cur", "rk"]
        )
        cur = stepped.select(
            "start",
            F.col("nbr").alias("cur"),
            F.col("nbr_deg").alias("deg"),
        )
        if pos < n_steps:
            # the frontier feeds BOTH the next step's join and this
            # step's visit branch; pin it so the join runs once (the
            # last step's frontier has a single consumer — no pin)
            cur = cur.localCheckpoint(eager=False)
        visits.append(
            cur.select("start", F.lit(pos).alias("step"), F.col("cur").alias("v"))
        )
    corpus = visits[0]
    for vdf in visits[1:]:
        corpus = corpus.unionAll(vdf)
    agg = corpus.groupBy("start").agg(
        *[
            F.max(F.when(F.col("step") == i, F.col("v"))).alias(f"_v{i}")
            for i in range(n_steps + 1)
        ]
    )
    return agg.select(
        "start",
        F.concat_ws(
            "->", *[F.col(f"_v{i}").cast("string") for i in range(n_steps + 1)]
        ).alias("path"),
    )
