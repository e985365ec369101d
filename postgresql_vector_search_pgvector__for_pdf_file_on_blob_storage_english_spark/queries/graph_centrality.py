# ==========================================================================
# Graph centrality & cohesion (round 9, wave 3) — HITS hubs/authorities
# and k-core decomposition (operators/graph.py::hits / kcore).  Both are
# integer fixed points: every iteration's sums are order-free BIGINTs
# and every normalization is an exact floor (HUGEINT on the DuckDB
# side, DECIMAL(38,0) on the Spark side), so the oracle replays the
# loops as unrolled MATERIALIZED CTE stages and the score tables are
# bit-identical — the PageRank/BPE oracle pattern.
# ==========================================================================
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    _register,
    _t,
)

_HITS_ITERS = 3
_HITS_UNIT = 1_000_000_000
_HITS_TOP = 20
_KCORE_ROUNDS = 12
_KCORE_TOP = 20


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed customer->supplier trade edges, nodes namespaced
    2k (customers) / 2k+1 (suppliers) — the PageRank fixture graph,
    kept directed so hubs (buyers) and authorities (sellers) are
    distinct roles."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )


def _graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hub customers and top-20 authority suppliers of the trade
    graph by fixed-point HITS — "which buyers aggregate the most
    authoritative sellers, and vice versa".  Scale shape: one
    distinct-pair aggregate, then 3 iterations of two |E|-keyed
    join+partial-agg passes; normalization totals are in-plan 1-row
    aggregates, no driver state, no floats."""
    from ..operators.graph import hits

    scores = hits(_trade_edges(spark, sf_dir), n_iters=_HITS_ITERS)
    hubs = (
        scores.orderBy(F.col("hub_units").desc(), "node")
        .limit(_HITS_TOP)
        .select(F.lit("hub").alias("role"), "node", F.col("hub_units").alias("score_units"))
    )
    auths = (
        scores.orderBy(F.col("auth_units").desc(), "node")
        .limit(_HITS_TOP)
        .select(F.lit("authority").alias("role"), "node", F.col("auth_units").alias("score_units"))
    )
    return hubs.unionAll(auths).orderBy("role", F.col("score_units").desc(), "node")


def _dd_hits_sql(n_iters: int) -> str:
    u = _HITS_UNIT
    head = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS MATERIALIZED (SELECT 2 * c AS src, 2 * s + 1 AS dst FROM pairs),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
h0 AS MATERIALIZED (SELECT node, {u}::BIGINT AS hub FROM nodes),"""
    steps = []
    for i in range(1, n_iters + 1):
        steps.append(f"""
ar{i} AS MATERIALIZED (
  SELECT nodes.node, coalesce(x.s, 0)::BIGINT AS raw
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, sum(h.hub)::BIGINT AS s
    FROM e JOIN h{i - 1} h ON e.src = h.node GROUP BY e.dst
  ) x ON x.node = nodes.node
),
at{i} AS MATERIALIZED (SELECT sum(raw)::BIGINT AS t FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT node, CAST((raw::HUGEINT * {u}) // t::HUGEINT AS BIGINT) AS auth
  FROM ar{i}, at{i}
),
hr{i} AS MATERIALIZED (
  SELECT nodes.node, coalesce(x.s, 0)::BIGINT AS raw
  FROM nodes LEFT JOIN (
    SELECT e.src AS node, sum(a.auth)::BIGINT AS s
    FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src
  ) x ON x.node = nodes.node
),
ht{i} AS MATERIALIZED (SELECT sum(raw)::BIGINT AS t FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT node, CAST((raw::HUGEINT * {u}) // t::HUGEINT AS BIGINT) AS hub
  FROM hr{i}, ht{i}
),""")
    body = (head + "".join(steps)).rstrip(",")
    return f"""{body}
, hubs AS (
  SELECT 'hub' AS role, node, hub AS score_units
  FROM h{n_iters} ORDER BY hub DESC, node LIMIT {_HITS_TOP}
),
auths AS (
  SELECT 'authority' AS role, node, auth AS score_units
  FROM a{n_iters} ORDER BY auth DESC, node LIMIT {_HITS_TOP}
)
SELECT * FROM hubs UNION ALL SELECT * FROM auths
ORDER BY role, score_units DESC, node
"""


_register("graph_hits_trade", _graph_hits, _dd_hits_sql(_HITS_ITERS))


# ==========================================================================
# k-core (half-mean-degree core) over the REPEAT co-purchase graph —
# parts bought together in >= 2 distinct orders, the signal-bearing
# subgraph (single co-occurrence is mostly noise at basket scale).  k
# is derived from the graph itself — max(2, floor(|E| / |V|)), half the
# mean symmetric degree — so the entry is meaningful at every scale
# factor without a hand-tuned constant; the peel runs a fixed round
# count and the operator PROVES the fixpoint (one extra degree pass)
# before returning.  Measured: fixpoint in <= 4 rounds at both gated
# fixtures (12 replayed rounds are idempotent past the fixpoint, so
# the unrolled oracle stays exact).
# ==========================================================================


def _repeat_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("v"))
    return (
        a.join(b, "_o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.countDistinct("_o").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("u", "v")
    )


def _graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 members of the repeat-co-purchase graph's half-mean-degree
    core by in-core degree — "the cohesive center of the basket graph
    after peeling off weakly attached parts".  k = max(2, floor(|E| /
    |V|)) comes from two 1-row counts (bounded driver actions); each
    peel round is one degree aggregate + two semi-joins, linear in
    |E|."""
    from ..operators.graph import kcore

    e = _repeat_copurchase(spark, sf_dir).localCheckpoint(eager=True)
    n_edges = e.count()
    n_nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .count()
    )
    k = max(2, n_edges // n_nodes)
    core = kcore(e, k=k, n_rounds=_KCORE_ROUNDS)
    total = core.agg(
        F.count(F.lit(1)).alias("core_size"),
        F.sum("degree").alias("sym_degree_sum"),
    )
    return (
        core.crossJoin(F.broadcast(total))
        .orderBy(F.col("degree").desc(), "node")
        .limit(_KCORE_TOP)
        .select(
            "node",
            "degree",
            F.lit(k).cast("long").alias("k_used"),
            F.col("core_size").cast("long").alias("core_size"),
            F.col("sym_degree_sum").cast("long").alias("sym_degree_sum"),
        )
    )


def _dd_kcore_sql(n_rounds: int) -> str:
    head = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
base AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2
),
e0 AS MATERIALIZED (
  SELECT u, v FROM base UNION ALL SELECT v, u FROM base
),
kk AS MATERIALIZED (
  SELECT greatest(2, (SELECT count(*) FROM base)
          // (SELECT count(*) FROM (SELECT u FROM base UNION SELECT v FROM base)))::BIGINT AS k
),"""
    steps = []
    for i in range(1, n_rounds + 1):
        steps.append(f"""
k{i} AS MATERIALIZED (
  SELECT u AS node FROM e{i - 1} GROUP BY u
  HAVING count(*) >= (SELECT k FROM kk)
),
e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{i - 1} e
  JOIN k{i} a ON e.u = a.node JOIN k{i} b ON e.v = b.node
),""")
    body = (head + "".join(steps)).rstrip(",")
    return f"""{body}
, core AS MATERIALIZED (
  SELECT u AS node, count(*)::BIGINT AS degree FROM e{n_rounds} GROUP BY u
),
tot AS (SELECT count(*)::BIGINT AS core_size, sum(degree)::BIGINT AS sym_degree_sum FROM core)
SELECT node, degree, (SELECT k FROM kk) AS k_used, core_size, sym_degree_sum
FROM core, tot
ORDER BY degree DESC, node
LIMIT {_KCORE_TOP}
"""


_register("graph_kcore_copurchase", _graph_kcore, _dd_kcore_sql(_KCORE_ROUNDS))


# ==========================================================================
# TextRank keyword extraction (Mihalcea & Tarau 2004, public method) —
# the word co-occurrence graph (adjacent surviving tokens, window 2)
# ranked by the SAME integer fixed-point PageRank operator the trade
# graph uses.  Word ids come from the two-pass global_rank over the
# bounded vocabulary (no 1-partition window); the oracle replays
# tokenization, adjacency, id assignment, and the unrolled walk.
# ==========================================================================

_TR_ITERS = 4
_TR_TOP = 20
_TR_UNIT = 1_000_000_000


def _textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus keywords by TextRank — PageRank over words linked
    when adjacent in a document (after dropping short/non-alpha
    tokens, the classic POS-filter stand-in).  Scale shape: token
    explode (linear), per-doc lead window (never global), distinct
    pair aggregate, then the |E|-linear iterations; the vocabulary and
    its id table are bounded by the language, not the corpus."""
    from ..operators.graph import pagerank
    from ..operators.ranking import global_rank
    from ..operators.retrieval import tokenize_pos

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokenize_pos(docs).filter(F.col("term").rlike("^[a-z]{4,}$"))
    wseq = Window.partitionBy("doc_id").orderBy("pos")
    adj = (
        toks.withColumn("_next", F.lead("term").over(wseq))
        .filter(F.col("_next").isNotNull() & (F.col("_next") != F.col("term")))
    )
    pairs = (
        adj.select(
            F.least("term", "_next").alias("wu"),
            F.greatest("term", "_next").alias("wv"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    vocab = (
        pairs.select(F.col("wu").alias("term"))
        .union(pairs.select(F.col("wv").alias("term")))
        .distinct()
    )
    vocab = (
        global_rank(vocab, [F.col("term")])
        .select("term", F.col("_rank").alias("id"))
        .localCheckpoint(eager=False)
    )
    fwd = (
        pairs.join(vocab.select(F.col("term").alias("wu"), F.col("id").alias("src")), "wu")
        .join(vocab.select(F.col("term").alias("wv"), F.col("id").alias("dst")), "wv")
        .select("src", "dst")
    )
    edges = fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(edges, n_iters=_TR_ITERS)
    return (
        ranks.join(vocab, ranks.node == vocab.id)
        .orderBy(F.col("rank_units").desc(), "term")
        .limit(_TR_TOP)
        .select(F.col("term").alias("word"), "rank_units")
    )


def _dd_textrank_sql(n_iters: int) -> str:
    u = _TR_UNIT
    from ._base import _DD_NORMALIZE, dd_sql

    head = f"""
WITH n AS (SELECT doc_id, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents),
terms AS MATERIALIZED (
  SELECT doc_id,
         list_filter(list_transform(string_split(trim(norm), ' '), x -> lower(x)),
                     x -> x != '') AS ts
  FROM n
),
pos AS (
  SELECT doc_id, i.i AS pos, ts[i.i + 1] AS term
  FROM terms, unnest(range(0, len(ts))) AS i(i)
),
filt AS (SELECT doc_id, pos, term FROM pos WHERE regexp_full_match(term, '[a-z]{{4,}}')),
seq AS (
  SELECT doc_id, term,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM filt
),
pairs AS MATERIALIZED (
  SELECT DISTINCT least(term, nxt) AS wu, greatest(term, nxt) AS wv
  FROM seq WHERE nxt IS NOT NULL AND nxt != term
),
vocab AS MATERIALIZED (
  SELECT term, row_number() OVER (ORDER BY term) AS id
  FROM (SELECT DISTINCT wu AS term FROM pairs UNION SELECT wv FROM pairs)
),
e AS MATERIALIZED (
  SELECT u.id AS src, v.id AS dst
  FROM pairs JOIN vocab u ON wu = u.term JOIN vocab v ON wv = v.term
  UNION ALL
  SELECT v.id, u.id
  FROM pairs JOIN vocab u ON wu = u.term JOIN vocab v ON wv = v.term
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
SELECT v.term AS word, r.r AS rank_units
FROM r{n_iters} r JOIN vocab v ON r.node = v.id
ORDER BY rank_units DESC, word
LIMIT {_TR_TOP}
"""


_register("text_textrank_keywords", _textrank_keywords, _dd_textrank_sql(_TR_ITERS))


# ==========================================================================
# Jaccard link prediction (round 10) — operators/graph.py::
# link_prediction_jaccard over the co-purchase graph: top-20
# non-adjacent part pairs by common-neighbor Jaccard, wedges generated
# at hub-capped centers (<= 64 true degree) so candidate fan-out is
# bounded per center; scores exact ppm integers.
# ==========================================================================

_LP_CAP = 64
_LP_K = 20


def _graph_link_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, link_prediction_jaccard

    li = _t(spark, sf_dir, "lineitem")
    return link_prediction_jaccard(copurchase_edges(li), _LP_CAP, _LP_K)


_DD_LINKPRED = f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
deg AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM sym GROUP BY 1),
small AS (SELECT node FROM deg WHERE deg <= {_LP_CAP}),
cc AS (SELECT s.nbr AS c, s.node AS x FROM sym s JOIN small ON small.node = s.nbr),
cand AS (
  SELECT a.x AS pu, b.x AS pw, count(*)::BIGINT AS cn
  FROM cc a JOIN cc b ON a.c = b.c AND a.x < b.x
  GROUP BY 1, 2
),
non_adj AS (
  SELECT cand.* FROM cand
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = cand.pu AND e.v = cand.pw)
)
SELECT pu AS u, pw AS w, cn, du.deg AS deg_u, dw.deg AS deg_w,
       (cn * 1000000) // (du.deg + dw.deg - cn) AS jaccard_ppm
FROM non_adj JOIN deg du ON du.node = pu JOIN deg dw ON dw.node = pw
ORDER BY jaccard_ppm DESC, cn DESC, pu, pw
LIMIT {_LP_K}
"""

_register("graph_link_prediction_jaccard", _graph_link_pred, _DD_LINKPRED)


# ==========================================================================
# Adamic-Adar link prediction (round 12) — operators/graph.py::
# link_prediction_adamic_adar: the rarity-weighted companion to the
# Jaccard entry above (each shared neighbor z contributes
# 1/ln(deg(z)), so niche shared parts dominate hubs).  Per-center
# terms are quantized to exact integers (10^12 div micro-nats of the
# degree) BEFORE the wedge sum, so the score is an order-free integer
# aggregation — no float sum over partitions.  Same hub cap, same
# non-adjacency anti-join, same tiebreak discipline.
# ==========================================================================


def _graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, link_prediction_adamic_adar

    li = _t(spark, sf_dir, "lineitem")
    return link_prediction_adamic_adar(copurchase_edges(li), _LP_CAP, _LP_K)


_DD_ADAMIC = f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
deg AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM sym GROUP BY 1),
centers AS (
  SELECT node AS c,
         CAST(1000000000000 // CAST(floor(ln(deg::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS BIGINT) AS term
  FROM deg WHERE deg >= 2 AND deg <= {_LP_CAP}
),
cc AS (SELECT s.nbr AS c, s.node AS x, centers.term
       FROM sym s JOIN centers ON centers.c = s.nbr),
cand AS (
  SELECT a.x AS pu, b.x AS pw, count(*)::BIGINT AS cn,
         sum(a.term)::BIGINT AS aa_micro
  FROM cc a JOIN cc b ON a.c = b.c AND a.x < b.x
  GROUP BY 1, 2
),
non_adj AS (
  SELECT cand.* FROM cand
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = cand.pu AND e.v = cand.pw)
)
SELECT pu AS u, pw AS w, cn, du.deg AS deg_u, dw.deg AS deg_w, aa_micro
FROM non_adj JOIN deg du ON du.node = pu JOIN deg dw ON dw.node = pw
ORDER BY aa_micro DESC, cn DESC, pu, pw
LIMIT {_LP_K}
"""

_register("graph_adamic_adar", _graph_adamic_adar, _DD_ADAMIC)


# ==========================================================================
# Deterministic walk corpus (round 10) — operators/graph.py::
# hash_walks.  The DeepWalk/node2vec corpus-generation stage with
# hash-driven (replayable, coordination-free) neighbor choice; the
# gated output is EVERY walk (start, path), so one divergent step
# anywhere in the corpus fails the value hash.  n_steps keyed joins,
# each linear in |V|; neighbor lookup is a (node, rank) equi-join.
# ==========================================================================

_WALK_STEPS = 4


def _graph_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges, hash_walks

    li = _t(spark, sf_dir, "lineitem")
    return hash_walks(copurchase_edges(li), n_steps=_WALK_STEPS).orderBy("start")


def _dd_walks_sql(n_steps: int) -> str:
    head = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT u AS node, v AS nbr FROM e0 UNION ALL SELECT v, u FROM e0),
ranked AS MATERIALIZED (
  SELECT node, nbr, row_number() OVER (PARTITION BY node ORDER BY nbr) AS rk
  FROM sym
),
deg AS MATERIALIZED (SELECT node, max(rk)::BIGINT AS deg FROM ranked GROUP BY 1),
c0 AS (SELECT node AS start, node AS cur, node::VARCHAR AS path FROM deg)"""
    steps = []
    for pos in range(1, n_steps + 1):
        steps.append(f""",
c{pos} AS (
  SELECT c.start, r.nbr AS cur, c.path || '->' || r.nbr::VARCHAR AS path
  FROM c{pos - 1} c
  JOIN deg d ON d.node = c.cur
  JOIN ranked r ON r.node = c.cur
   AND r.rk = ('0x' || substr(md5('walk{pos}' || '§' || c.cur::VARCHAR || '§' || c.start::VARCHAR), 1, 15))::BIGINT % d.deg + 1
)""")
    return (
        head + "".join(steps)
        + f"\nSELECT start, path FROM c{n_steps} ORDER BY start"
    )


_register("graph_walk_corpus", _graph_walks, _dd_walks_sql(_WALK_STEPS))


# ==========================================================================
# Degree assortativity (round 10): do high-degree parts co-purchase
# with high-degree parts?  Pearson r over the DIRECTED edge list (both
# orientations of each undirected edge — the standard Newman 2002
# formulation): all sums exact integers over one |E| pass; r is the
# one rounded double (identical short IEEE expression both engines).
# The skew-strategy signal: disassortative graphs (hubs-to-leaves)
# are exactly where the hub-cap levers earn their keep.
# ==========================================================================


def _graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import copurchase_edges

    li = _t(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li)
    sym = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "dx")
    dv = deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dy")
    directed = edges.join(du, "u").join(dv, "v").select("dx", "dy")
    both = directed.unionAll(directed.select(F.col("dy").alias("dx"), F.col("dx").alias("dy")))
    agg = both.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m2"),
        F.sum(F.col("dx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("dx").cast("decimal(38,0)") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dx").cast("decimal(38,0)") * F.col("dy")).alias("sxy"),
    )
    return agg.selectExpr(
        "CAST(m2 AS BIGINT) AS n_directed_edges",
        "CAST(sxy AS BIGINT) AS sum_dxdy",
        """round(
             CAST(m2 * sxy - sx * sx AS DOUBLE)
             / CAST(m2 * sxx - sx * sx AS DOUBLE), 4) AS assortativity_r4""",
    )


_DD_ASSORT = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e),
deg AS (SELECT node, count(*)::BIGINT AS deg FROM sym GROUP BY 1),
directed AS (
  SELECT du.deg AS dx, dv.deg AS dy
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
),
both_dir AS (SELECT dx, dy FROM directed UNION ALL SELECT dy, dx FROM directed),
agg AS (
  SELECT count(*)::HUGEINT AS m2, sum(dx)::HUGEINT AS sx,
         sum(dx::HUGEINT * dx) AS sxx, sum(dx::HUGEINT * dy) AS sxy
  FROM both_dir
)
SELECT CAST(m2 AS BIGINT) AS n_directed_edges,
       CAST(sxy AS BIGINT) AS sum_dxdy,
       round(CAST(m2 * sxy - sx * sx AS DOUBLE)
             / CAST(m2 * sxx - sx * sx AS DOUBLE), 4) AS assortativity_r4
FROM agg
"""

_register("graph_degree_assortativity", _graph_assortativity, _DD_ASSORT)
