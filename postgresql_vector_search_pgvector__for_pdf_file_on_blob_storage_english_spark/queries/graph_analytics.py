# ==========================================================================
# Iterative graph analytics (round 6) — fixed-point PageRank over the
# customer<->supplier trade graph (operators/graph.py).  Edges = distinct
# (custkey, suppkey) trading pairs from orders x lineitem, both
# directions, nodes namespaced 2k / 2k+1.  Integer nano-unit arithmetic
# makes every iteration's sums order-free, so the DuckDB oracle replays
# the loop as unrolled MATERIALIZED CTE stages (the BPE-oracle pattern)
# and the rank table is bit-identical.
# ==========================================================================
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _register,
    _t,
)

_PR_ITERS = 5
_PR_UNIT = 1_000_000_000
_PR_TOP = 20


def _graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes of the trade graph by fixed-point PageRank — "which
    customers and suppliers sit at the center of the order network".
    Scale shape: one distinct-pair aggregate over lineitem x orders,
    then 5 iterations of (edges join ranks) + partial-agg groupBy —
    linear in |E| per iteration, no driver state, no floats."""
    from ..operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        (F.col("o_custkey") * 2).alias("src"), (F.col("l_suppkey") * 2 + 1).alias("dst")
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(edges, n_iters=_PR_ITERS)
    return (
        ranks.orderBy(F.col("rank_units").desc(), "node")
        .limit(_PR_TOP)
        .select("node", "rank_units")
    )


def _dd_pagerank_sql(n_iters: int) -> str:
    u = _PR_UNIT
    head = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS MATERIALIZED (
  SELECT 2 * c AS src, 2 * s + 1 AS dst FROM pairs
  UNION ALL
  SELECT 2 * s + 1, 2 * c FROM pairs
),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes),
od AS MATERIALIZED (SELECT src AS node, count(*)::BIGINT AS outdeg FROM e GROUP BY src),
r0 AS MATERIALIZED (
  SELECT node, CAST(({u} - {u} % nn.n) / nn.n AS BIGINT) AS r FROM nodes, nn
),"""
    steps = []
    for i in range(1, n_iters + 1):
        steps.append(f"""
r{i} AS MATERIALIZED (
  SELECT nodes.node,
         CAST((({15 * u}) - ({15 * u}) % (100 * nn.n)) / (100 * nn.n) AS BIGINT)
         + CAST(((85 * coalesce(inc.s, 0)) - (85 * coalesce(inc.s, 0)) % 100) / 100 AS BIGINT) AS r
  FROM nodes
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(CAST((p.r - p.r % od.outdeg) / od.outdeg AS BIGINT)) AS BIGINT) AS s
    FROM e JOIN r{i - 1} p ON e.src = p.node JOIN od ON od.node = e.src
    GROUP BY e.dst
  ) inc ON inc.node = nodes.node
  CROSS JOIN nn
),""")
    body = (head + "".join(steps)).rstrip(",")
    return f"""{body}
SELECT node, r AS rank_units
FROM r{n_iters}
ORDER BY r DESC, node
LIMIT {_PR_TOP}
"""


_register("graph_pagerank_trade", _graph_pagerank, _dd_pagerank_sql(_PR_ITERS))


# --------------------------------------------------------------------------
# Dangling-mass redistribution (VERDICT r6 #9): the DIRECTED trade graph
# (customer -> supplier only) makes every supplier node dangling — half
# the node set — so the correction term is maximally non-vacuous.  Each
# step's dangling mass D is a 1-row in-plan aggregate; every node gains
# floor(85 * D / (100 N)) in the same exact integer arithmetic, and the
# oracle replays D as a per-step materialized CTE.
# --------------------------------------------------------------------------

_PRD_ITERS = 4


def _graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank with dangling-mass redistribution over the
    directed customer->supplier graph (suppliers have no out-edges)."""
    from ..operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = pairs.select(
        (F.col("o_custkey") * 2).alias("src"), (F.col("l_suppkey") * 2 + 1).alias("dst")
    )
    ranks = pagerank(edges, n_iters=_PRD_ITERS, dangling="redistribute")
    return (
        ranks.orderBy(F.col("rank_units").desc(), "node")
        .limit(_PR_TOP)
        .select("node", "rank_units")
    )


def _dd_pagerank_dangling_sql(n_iters: int) -> str:
    u = _PR_UNIT
    head = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS MATERIALIZED (SELECT 2 * c AS src, 2 * s + 1 AS dst FROM pairs),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes),
od AS MATERIALIZED (SELECT src AS node, count(*)::BIGINT AS outdeg FROM e GROUP BY src),
r0 AS MATERIALIZED (
  SELECT node, CAST(({u} - {u} % nn.n) / nn.n AS BIGINT) AS r FROM nodes, nn
),"""
    steps = []
    for i in range(1, n_iters + 1):
        steps.append(f"""
d{i} AS MATERIALIZED (
  SELECT CAST(coalesce(sum(p.r), 0) AS BIGINT) AS dm
  FROM r{i - 1} p LEFT JOIN od ON od.node = p.node
  WHERE od.node IS NULL
),
r{i} AS MATERIALIZED (
  SELECT nodes.node,
         CAST((({15 * u}) - ({15 * u}) % (100 * nn.n)) / (100 * nn.n) AS BIGINT)
         + CAST(((85 * coalesce(inc.s, 0)) - (85 * coalesce(inc.s, 0)) % 100) / 100 AS BIGINT)
         + CAST(((85 * d.dm) - (85 * d.dm) % (100 * nn.n)) / (100 * nn.n) AS BIGINT) AS r
  FROM nodes
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(CAST((p.r - p.r % od.outdeg) / od.outdeg AS BIGINT)) AS BIGINT) AS s
    FROM e JOIN r{i - 1} p ON e.src = p.node JOIN od ON od.node = e.src
    GROUP BY e.dst
  ) inc ON inc.node = nodes.node
  CROSS JOIN nn
  CROSS JOIN d{i} d
),""")
    body = (head + "".join(steps)).rstrip(",")
    return f"""{body}
SELECT node, r AS rank_units
FROM r{n_iters}
ORDER BY r DESC, node
LIMIT {_PR_TOP}
"""


_register(
    "graph_pagerank_dangling",
    _graph_pagerank_dangling,
    _dd_pagerank_dangling_sql(_PRD_ITERS),
)


# ==========================================================================
# Z-order layout skipping report (round 6) — the operators/layout.py
# zorder_write machinery was tests-only (real-footer pruning gates in
# test_layout.py); this entry puts the Morton arithmetic itself under
# the CORRECTNESS gate with fully deterministic quantization (modulo /
# day-offset instead of engine-specific approxQuantile), and the report
# states the skipping property: every z-range bucket bounds BOTH
# dimensions, so min/max file stats prune on either predicate.
# ==========================================================================

_Z_BITS = 8  # 256 x 256 grid -> 16-bit z
_Z_BUCKETS = 16


def _layout_zorder_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import _morton2

    orders = _t(spark, sf_dir, "orders")
    ck = (F.col("o_custkey") % (1 << _Z_BITS)).cast("long")
    dd = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        % (1 << _Z_BITS)
    ).cast("long")
    z = _morton2(ck, dd, _Z_BITS)
    step = (1 << (2 * _Z_BITS)) // _Z_BUCKETS
    staged = orders.select(ck.alias("ck"), dd.alias("dd"), z.alias("z"))
    return (
        staged.groupBy(((F.col("z") - F.col("z") % step) / step).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ck").alias("min_ck"),
            F.max("ck").alias("max_ck"),
            F.min("dd").alias("min_dd"),
            F.max("dd").alias("max_dd"),
        )
    )


def _dd_zorder_sql() -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(((ck >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"(((dd >> {i}) & 1) * {1 << (2 * i + 1)})")
    zexpr = " + ".join(terms)
    step = (1 << (2 * _Z_BITS)) // _Z_BUCKETS
    return f"""
WITH q AS (
  SELECT (o_custkey % {1 << _Z_BITS})::BIGINT AS ck,
         (date_diff('day', DATE '1992-01-01', o_orderdate) % {1 << _Z_BITS})::BIGINT AS dd
  FROM orders
),
z AS (SELECT ck, dd, ({zexpr})::BIGINT AS z FROM q)
SELECT CAST((z - z % {step}) / {step} AS BIGINT) AS zbucket,
       count(*) AS n_rows,
       min(ck) AS min_ck, max(ck) AS max_ck,
       min(dd) AS min_dd, max(dd) AS max_dd
FROM z GROUP BY 1
"""


_register("layout_zorder_report", _layout_zorder_report, _dd_zorder_sql())


# ==========================================================================
# Bucketed co-located join (round 8) — the pay-the-shuffle-once layout.
# Both fact tables are persisted bucketBy(orderkey) catalog tables; the
# recurring orders x lineitem equi-join then plans with ZERO Exchange
# (asserted from the executed plan in tests/test_layout.py) — at 100 TB
# the per-query fact-fact shuffle is the bottleneck this layout deletes.
# The gate checks the VALUES against the plain-parquet oracle join, so
# the layout is proven side-effect-free on results.  Revenue is
# quantized to integer cents before summing (module convention).
# ==========================================================================

_BKT_N = 8


def _layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.layout import bucketed_write, cobucketed_join

    pid = os.getpid()
    ot, lt = f"graft_bkt_orders_{pid}", f"graft_bkt_lineitem_{pid}"
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.floor(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("rev_cents"),
    )
    bucketed_write(orders, ot, ["o_orderkey"], _BKT_N)
    bucketed_write(li, lt, ["o_orderkey"], _BKT_N)
    return (
        cobucketed_join(spark, ot, lt, ["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
        )
    )


_register(
    "layout_bucketed_join",
    _layout_bucketed_join,
    """
SELECT o_orderpriority,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
)


# ==========================================================================
# Hilbert-clustered layout report (round 8) — layout.py::hilbert2_frame.
# Same grid and bucket protocol as layout_zorder_report so the two are
# directly comparable; the Hilbert index has no Morton seam jumps, so
# equal-count d-ranges cover tighter (ck, dd) boxes — visible in the
# per-bucket min/max spans this entry gates.  The oracle unrolls the
# same xy->d walk as a chain of CTEs (one per bit level, DuckDB reads
# the INPUT column when an alias reuses its name — verified, so each
# level's simultaneous (x, y, d) update is literal).
# ==========================================================================


def _layout_hilbert_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import hilbert2_frame

    orders = _t(spark, sf_dir, "orders")
    ck = (F.col("o_custkey") % (1 << _Z_BITS)).cast("long")
    dd = (
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        % (1 << _Z_BITS)
    ).cast("long")
    staged = orders.select(ck.alias("ck"), dd.alias("dd"))
    hed = hilbert2_frame(staged, "ck", "dd", _Z_BITS, out="h")
    step = (1 << (2 * _Z_BITS)) // _Z_BUCKETS
    return (
        hed.groupBy(
            ((F.col("h") - F.col("h") % step) / step).cast("long").alias("hbucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ck").alias("min_ck"),
            F.max("ck").alias("max_ck"),
            F.min("dd").alias("min_dd"),
            F.max("dd").alias("max_dd"),
        )
    )


def _dd_hilbert_sql() -> str:
    levels = []
    prev = "q0"
    for i in range(_Z_BITS - 1, -1, -1):
        s = 1 << i
        rx = f"((x >> {i}) & 1)"
        ry = f"((y >> {i}) & 1)"
        levels.append(
            f"""h{i} AS (
  SELECT ck, dd,
         CASE WHEN {ry} = 1 THEN x
              WHEN {rx} = 1 THEN {s - 1} - y
              ELSE y END AS x,
         CASE WHEN {ry} = 1 THEN y
              WHEN {rx} = 1 THEN {s - 1} - x
              ELSE x END AS y,
         d + {s * s}::BIGINT * xor(3 * {rx}, {ry}) AS d
  FROM {prev}
)"""
        )
        prev = f"h{i}"
    step = (1 << (2 * _Z_BITS)) // _Z_BUCKETS
    chain = ",\n".join(levels)
    return f"""
WITH q AS (
  SELECT (o_custkey % {1 << _Z_BITS})::BIGINT AS ck,
         (date_diff('day', DATE '1992-01-01', o_orderdate) % {1 << _Z_BITS})::BIGINT AS dd
  FROM orders
),
q0 AS (SELECT ck, dd, ck AS x, dd AS y, 0::BIGINT AS d FROM q),
{chain}
SELECT CAST((d - d % {step}) / {step} AS BIGINT) AS hbucket,
       count(*) AS n_rows,
       min(ck) AS min_ck, max(ck) AS max_ck,
       min(dd) AS min_dd, max(dd) AS max_dd
FROM {prev} GROUP BY 1
"""


_register("layout_hilbert_report", _layout_hilbert_report, _dd_hilbert_sql())


# ==========================================================================
# Exact triangle counting (round 8) — operators/graph.py::triangle_stats
# over the co-purchase graph (parts sharing an order).  Degree
# orientation (Suri & Vassilvitskii 2011) generates each wedge at its
# lowest-(degree, id) vertex, capping wedge fan-out at O(sqrt(|E|)) per
# vertex regardless of skew; each triangle is produced exactly once.
# All counters integers; the clustering coefficient is the one rounded
# float.  The oracle replays orientation, wedge join, and closing
# semi-join literally.
# ==========================================================================


def _graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, triangle_stats

    li = _t(spark, sf_dir, "lineitem")
    return triangle_stats(copurchase_edges(li))


_DD_TRIANGLES = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e),
deg AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM sym GROUP BY 1),
oriented AS MATERIALIZED (
  SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst,
         CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
              THEN dv.deg ELSE du.deg END AS ddeg
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM oriented e1
  JOIN oriented e2 ON e2.src = e1.src
   AND ((e1.ddeg < e2.ddeg) OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
  WHERE EXISTS (
    SELECT 1 FROM oriented e3 WHERE e3.src = e1.dst AND e3.dst = e2.dst
  )
),
ne AS (SELECT count(*)::BIGINT AS n_edges FROM e),
nw AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
SELECT n_edges, n_wedges, n_triangles,
       round(3.0 * n_triangles / n_wedges, 4) AS global_clustering
FROM ne, nw, tri
"""

_register("graph_triangles_copurchase", _graph_triangles, _DD_TRIANGLES)


# ==========================================================================
# Connected components (round 8, session 2) — operators/graph.py::
# connected_components, alternating large-star/small-star contraction
# (Kiveris et al. 2014).  Workload: "order episodes" — consecutive
# orders of the same customer at most 30 days apart form a chain; the
# components are the episodes, and the entry gates the episode-size
# histogram (singleton orders included as size-1 components).
#
# Oracle strength: NOT a round replay.  The engine asserts the final
# edge set is a star forest (which proves its labels are the true
# component minima), so the oracle can compute ground truth
# independently — a recursive-CTE label propagation to fixpoint.  The
# two implementations share nothing but the edge definition.
# ==========================================================================

_CC_GAP_DAYS = 30
_CC_ROUNDS = 5


def _cc_order_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("_pk"),
        F.lag("o_orderdate").over(w).alias("_pd"),
    )
    edges = seq.filter(
        F.col("_pk").isNotNull()
        & (F.datediff("o_orderdate", "_pd") <= _CC_GAP_DAYS)
    ).select(F.col("_pk").alias("u"), F.col("o_orderkey").alias("v"))
    # self_loops=False: u is strictly the PREVIOUS row of the same
    # (o_orderdate, o_orderkey)-ordered partition, so u == v is
    # impossible by construction — skip the weave and its checkpoint.
    labeled = connected_components(edges, rounds=_CC_ROUNDS, self_loops=False)
    nodes = orders.select(F.col("o_orderkey").alias("node"))
    full = nodes.join(labeled, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
    sizes = full.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .select(F.col("size").cast("long").alias("size"), "n_components")
    )


_DD_CC_EPISODES = f"""
WITH RECURSIVE seq AS (
  SELECT o_orderkey, o_orderdate,
         lag(o_orderkey) OVER w AS pk, lag(o_orderdate) OVER w AS pd
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
e AS (
  SELECT pk AS u, o_orderkey AS v FROM seq
  WHERE pk IS NOT NULL AND date_diff('day', pd, o_orderdate) <= {_CC_GAP_DAYS}
),
sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
reach(node, lab) AS (
  SELECT o_orderkey, o_orderkey FROM orders
  UNION
  SELECT sym.v, reach.lab FROM reach JOIN sym ON sym.u = reach.node
),
labels AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, count(*)::BIGINT AS size FROM labels GROUP BY component)
SELECT size, count(*)::BIGINT AS n_components FROM sizes GROUP BY size
"""

_register("graph_order_episodes", _cc_order_episodes, _DD_CC_EPISODES)


# ==========================================================================
# Bounded-hop BFS reachability (round 8, session 2 — operators/graph.py::
# bfs_levels): "how much of the trade network sits within 3 hops of
# customer 1?"  Same namespaced bipartite graph as PageRank (customers
# 2k, suppliers 2k+1).  Each level is frontier x edges + distinct +
# anti-join-visited; the oracle unrolls the three levels as CTEs.
# Gated output: newly-reached node count per hop.
# ==========================================================================

_BFS_HOPS = 3
_BFS_SEED_CUST = 1


def _graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_levels

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        (F.col("o_custkey") * 2).alias("src"), (F.col("l_suppkey") * 2 + 1).alias("dst")
    )
    # the edge relation is loop-invariant but sat in every BFS level's
    # frontier-join lineage — each of the 3 hops re-ran the
    # lineitem x orders join + distinct (r13 opt, same pin as the
    # pagerank nodes/outdeg fix)
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    seeds = spark.range(1).select(F.lit(2 * _BFS_SEED_CUST).cast("long").alias("node"))
    levels = bfs_levels(edges, seeds, max_hops=_BFS_HOPS)
    return (
        levels.groupBy("hop")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(F.col("hop").cast("int").alias("hop"), "n_nodes")
    )


_DD_KHOP = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS MATERIALIZED (
  SELECT 2 * c AS src, 2 * s + 1 AS dst FROM pairs
  UNION ALL
  SELECT 2 * s + 1, 2 * c FROM pairs
),
l0 AS (SELECT {2 * _BFS_SEED_CUST}::BIGINT AS node),
l1 AS (
  SELECT DISTINCT e.dst AS node FROM l0 JOIN e ON e.src = l0.node
  WHERE e.dst NOT IN (SELECT node FROM l0)
),
l2 AS (
  SELECT DISTINCT e.dst AS node FROM l1 JOIN e ON e.src = l1.node
  WHERE e.dst NOT IN (SELECT node FROM l0)
    AND e.dst NOT IN (SELECT node FROM l1)
),
l3 AS (
  SELECT DISTINCT e.dst AS node FROM l2 JOIN e ON e.src = l2.node
  WHERE e.dst NOT IN (SELECT node FROM l0)
    AND e.dst NOT IN (SELECT node FROM l1)
    AND e.dst NOT IN (SELECT node FROM l2)
)
SELECT 0 AS hop, count(*)::BIGINT AS n_nodes FROM l0
UNION ALL SELECT 1, count(*)::BIGINT FROM l1
UNION ALL SELECT 2, count(*)::BIGINT FROM l2
UNION ALL SELECT 3, count(*)::BIGINT FROM l3
"""

_register("graph_khop_reach", _graph_khop, _DD_KHOP)


# ==========================================================================
# Semi-supervised label propagation (round 8, session 2 — operators/
# graph.py::label_propagation): brand inference over the co-purchase
# graph.  20% of parts keep their true p_brand (seeds, clamped); two
# rounds of clamped majority vote label the rest; the entry grades
# itself — the gated output is the (is_seed, correct) confusion with
# counts, so a propagation-quality regression fails CORRECTNESS.
# Ties break on the lexicographically smallest label (total order =>
# partitioning-independent).  Oracle: both rounds unrolled as CTEs.
# ==========================================================================

_LP_ITERS = 2


def _graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, label_propagation

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    edges = copurchase_edges(li)
    seeds = part.filter(F.col("p_partkey") % 5 == 0).select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("label")
    )
    labels = label_propagation(edges, seeds, iters=_LP_ITERS)
    truth = part.select(
        F.col("p_partkey").alias("node"),
        F.col("p_brand").alias("true_brand"),
        (F.col("p_partkey") % 5 == 0).alias("is_seed"),
    )
    return (
        truth.join(labels, "node", "left")
        .select(
            "is_seed",
            F.when(F.col("label").isNull(), F.lit("unlabeled"))
            .when(F.col("label") == F.col("true_brand"), F.lit("correct"))
            .otherwise(F.lit("wrong"))
            .alias("outcome"),
        )
        .groupBy("is_seed", "outcome")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _dd_lp_body(iters: int) -> str:
    """Shared CTE chain (edges, sym adjacency, seeds, iters rounds of
    clamped majority vote) — the label-prop oracle's body, reused by
    the modularity entry below so both gates replay ONE definition."""
    head = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0),
seeds AS MATERIALIZED (
  SELECT p_partkey AS node, p_brand AS label FROM part WHERE p_partkey % 5 = 0
),
l0 AS (SELECT node, label FROM seeds),"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
v{i} AS (
  SELECT sym.dst AS node, l.label, count(*)::BIGINT AS cnt
  FROM l{i - 1} l JOIN sym ON sym.src = l.node
  GROUP BY 1, 2
),
i{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
    FROM v{i}) WHERE rn = 1
),
l{i} AS (
  SELECT node, label FROM seeds
  UNION ALL
  SELECT node, label FROM i{i} WHERE node NOT IN (SELECT node FROM seeds)
),""")
    return (head + "".join(steps)).rstrip(",")


def _dd_lp_sql(iters: int) -> str:
    return f"""{_dd_lp_body(iters)}
SELECT (p.p_partkey % 5 = 0) AS is_seed,
       CASE WHEN l.label IS NULL THEN 'unlabeled'
            WHEN l.label = p.p_brand THEN 'correct'
            ELSE 'wrong' END AS outcome,
       count(*)::BIGINT AS n
FROM part p LEFT JOIN l{iters} l ON l.node = p.p_partkey
GROUP BY 1, 2
"""


_register("graph_label_propagation", _graph_label_prop, _dd_lp_sql(_LP_ITERS))


# ==========================================================================
# Personalized PageRank (round 8, session 2 — operators/graph.py::
# personalized_pagerank): random walk with restart from one seed part
# over the co-purchase graph — "parts related to part 7 by purchase
# structure", the graph-based recommender complementing the item-item
# cosine entry (walks see transitive structure; cosine sees direct
# co-counts only).  Same fixed-point integer contract as PageRank, so
# the oracle unrolls the 4 iterations as exact CTEs.
# ==========================================================================

_PPR_ITERS = 4
_PPR_SEED = 7
_PPR_TOP = 20


def _graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, personalized_pagerank

    li = _t(spark, sf_dir, "lineitem")
    und = copurchase_edges(li)
    edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    seeds = spark.range(1).select(F.lit(_PPR_SEED).cast("long").alias("node"))
    ranks = personalized_pagerank(edges, seeds, n_iters=_PPR_ITERS)
    return (
        ranks.filter(F.col("rank_units") > 0)
        .orderBy(F.col("rank_units").desc(), "node")
        .limit(_PPR_TOP)
        .select("node", "rank_units")
    )


def _dd_ppr_sql(n_iters: int) -> str:
    from ..operators.graph import UNIT

    seed = _PPR_SEED
    base = (15 * UNIT) // 100
    head = f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0
),
nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e UNION SELECT {seed}
),
od AS MATERIALIZED (SELECT src AS node, count(*)::BIGINT AS outdeg FROM e GROUP BY src),
r0 AS MATERIALIZED (
  SELECT node, CASE WHEN node = {seed} THEN {UNIT}::BIGINT ELSE 0::BIGINT END AS r
  FROM nodes
),"""
    steps = []
    for i in range(1, n_iters + 1):
        steps.append(f"""
r{i} AS MATERIALIZED (
  SELECT nodes.node,
         CASE WHEN nodes.node = {seed} THEN {base}::BIGINT ELSE 0::BIGINT END
         + CAST(((85 * coalesce(inc.s, 0)) - (85 * coalesce(inc.s, 0)) % 100) / 100 AS BIGINT) AS r
  FROM nodes
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(CAST((p.r - p.r % od.outdeg) / od.outdeg AS BIGINT)) AS BIGINT) AS s
    FROM e JOIN r{i - 1} p ON e.src = p.node JOIN od ON od.node = e.src
    GROUP BY e.dst
  ) inc ON inc.node = nodes.node
),""")
    body = (head + "".join(steps)).rstrip(",")
    return f"""{body}
SELECT node, r AS rank_units
FROM r{n_iters} WHERE r > 0
ORDER BY r DESC, node
LIMIT {_PPR_TOP}
"""


_register("graph_ppr_copurchase", _graph_ppr, _dd_ppr_sql(_PPR_ITERS))


# ==========================================================================
# Modularity (round 10): the quality score of the label-propagation
# communities above — Q = sum_c [e_c/m - (d_c/2m)^2], the number that
# says whether a partition beats random edge placement.  Computed
# CROSS-MULTIPLIED: Q_ppm = (sum_c (4 m e_c - d_c^2)) * 10^6 //
# (4 m^2), exact integers end-to-end with the explicit negative floor
# branch (Q < 0 is possible).  Unlabeled nodes form singleton
# communities (they contribute only -d_c^2 mass).  Oracle replays the
# SAME label-prop CTE chain (_dd_lp_body) plus the modularity algebra.
# ==========================================================================


def _graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, label_propagation

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # the edge relation feeds label-prop (2 rounds), degrees, AND the
    # intra-edge count — derive the distinct self-join ONCE
    edges = copurchase_edges(li).localCheckpoint(eager=False)
    seeds = part.filter(F.col("p_partkey") % 5 == 0).select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("label")
    )
    labels = label_propagation(edges, seeds, iters=_LP_ITERS)

    sym = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    com = deg.join(labels, "node", "left").select(
        "node", "deg",
        F.coalesce(F.col("label"), F.concat(F.lit("n"), F.col("node"))).alias("com"),
    )
    cu = com.select(F.col("node").alias("u"), F.col("com").alias("cu"))
    cv = com.select(F.col("node").alias("v"), F.col("com").alias("cv"))
    intra = (
        edges.join(cu, "u").join(cv, "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("com"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    dsum = com.groupBy("com").agg(F.sum("deg").alias("d_c"))
    per_c = dsum.join(intra, "com", "left").select(
        "com", "d_c", F.coalesce("e_c", F.lit(0)).alias("e_c")
    )
    m = edges.count()
    agg = per_c.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum("e_c").alias("intra_edges"),
        F.sum(
            4 * F.lit(m).cast("decimal(38,0)") * F.col("e_c")
            - F.col("d_c").cast("decimal(38,0)") * F.col("d_c")
        ).alias("_qnum"),
    )
    den = 4 * m * m
    return agg.selectExpr(
        f"CAST({m} AS BIGINT) AS n_edges",
        "CAST(n_communities AS BIGINT) AS n_communities",
        "CAST(intra_edges AS BIGINT) AS intra_edges",
        f"""CAST(CASE WHEN _qnum >= 0
             THEN (_qnum * 1000000) div CAST({den} AS DECIMAL(38,0))
             ELSE -((-_qnum * 1000000 + {den} - 1) div CAST({den} AS DECIMAL(38,0)))
        END AS BIGINT) AS q_ppm""",
    )


def _dd_modularity_sql(iters: int) -> str:
    return f"""{_dd_lp_body(iters)},
nodes AS (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0),
deg AS (SELECT node, count(*)::BIGINT AS deg FROM nodes GROUP BY 1),
com AS (
  SELECT deg.node, deg.deg,
         coalesce(l.label, 'n' || deg.node::VARCHAR) AS com
  FROM deg LEFT JOIN l{iters} l ON l.node = deg.node
),
m AS (SELECT count(*)::BIGINT AS m FROM e0),
intra AS (
  SELECT a.com, count(*)::BIGINT AS e_c
  FROM e0 JOIN com a ON a.node = e0.u JOIN com b ON b.node = e0.v
  WHERE a.com = b.com GROUP BY 1
),
dsum AS (SELECT com, sum(deg)::BIGINT AS d_c FROM com GROUP BY 1),
per_c AS (
  SELECT dsum.com, d_c, coalesce(e_c, 0)::BIGINT AS e_c
  FROM dsum LEFT JOIN intra ON dsum.com = intra.com
),
agg AS (
  SELECT count(*)::BIGINT AS n_communities, sum(e_c)::BIGINT AS intra_edges,
         sum(4 * m::HUGEINT * e_c - d_c::HUGEINT * d_c) AS qnum, max(m) AS m
  FROM per_c, m
)
SELECT m AS n_edges, n_communities, intra_edges,
       CAST(CASE WHEN qnum >= 0
            THEN (qnum * 1000000) // (4 * m::HUGEINT * m)
            ELSE -((-qnum * 1000000 + 4 * m::HUGEINT * m - 1) // (4 * m::HUGEINT * m))
       END AS BIGINT) AS q_ppm
FROM agg
"""


_register("graph_modularity_labelprop", _graph_modularity, _dd_modularity_sql(_LP_ITERS))
