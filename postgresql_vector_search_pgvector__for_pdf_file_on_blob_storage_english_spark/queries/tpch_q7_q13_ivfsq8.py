# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _dd_l2, _register, _t, dd_sql  # noqa: F401
from .ann_ivf_lsh import _IVF_PROBE_ID, _N_CENTROIDS  # noqa: F401
from .quant_search import _SQ8_POOL  # noqa: F401
# TPC-H Q7 / Q13 analogs (round 4) — volume shipping between nation pairs
# and the customer order-count distribution; widen the relational
# substrate the fixtures can express (no l_shipmode/partsupp columns, so
# Q12/Q2-class queries are out of fixture scope).
# ==========================================================================

def _tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: revenue shipped between two nations, by year and direction.
    Both nation dims broadcast; the lineitem->orders join is the only
    large join; year extraction stays in codegen.

    Nation pair + date range chosen to be NON-EMPTY at every fixture
    scale (ADVICE r4: the original NATION_1/NATION_2 + 1996-1997 window
    yielded 0 rows at sf0.001, making the oracle comparison vacuous);
    NATION_20/NATION_11 over 1995-2001 returns 6 groups at sf0.001 and
    12 at sf0.01/sf0.1 — verified against the shipped fixtures."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_20") & (F.col("cust_nation") == "NATION_11") | (
        (F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_20")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_register(
    "tpch_q7_volume_shipping",
    _tpch_q7_volume_shipping,
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '2001-01-01'
  AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)


def _tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of customers by order count (incl. zero via the
    left outer join).  Two aggregations, both map-side combinable; the
    orders->customer side shuffles once on custkey."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_register(
    "tpch_q13_customer_distribution",
    _tpch_q13_customer_distribution,
    """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)


# ==========================================================================
# IVF + SQ8 combined index (round 4) — the two 100 TB levers composed:
# static partition prune to nprobe inverted lists AND int8 codes inside
# them (operators/quant.py::ivf_sq8_index_*).  Same centroid set and
# probe as the IVF entries; same quantizer as the SQ8 entries.
# ==========================================================================

def _ivf_sq8_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from ..operators.quant import ivf_sq8_index_search, ivf_sq8_index_write

    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_ivfsq8_index_{tag}")
    ivf_sq8_index_write(emb, centroids, path, payload_cols=["label"])
    q = list(emb.filter(F.col("vec_id") == _IVF_PROBE_ID).first()["embedding"])
    out = ivf_sq8_index_search(
        spark, path, centroids, emb, q, k=5, nprobe=1, oversample=10,
        payload_cols=["label"],
    )
    return out.select("vec_id", "label", F.round("distance", 4).alias("distance"))


_DD_IVF_SQ8 = dd_sql(
    """
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings WHERE vec_id < {nc}
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {probe}),
probe AS (
  SELECT centroid_id FROM cent, q ORDER BY {cdist}, centroid_id LIMIT 1
),
assigned AS (
  SELECT e.vec_id, e.label, e.embedding, c.centroid_id
  FROM embeddings e CROSS JOIN cent c
  QUALIFY row_number() OVER (
    PARTITION BY e.vec_id ORDER BY {adist_assign}, c.centroid_id) = 1
),
codes AS (
  SELECT vec_id, label, embedding, centroid_id,
         greatest(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 1e-30) / 127.0 AS scale,
         list_transform(embedding,
           x -> floor(x::DOUBLE / (greatest(list_max(list_transform(embedding, y -> abs(y::DOUBLE))), 1e-30) / 127.0) + 0.5)) AS code
  FROM assigned
  WHERE centroid_id IN (SELECT centroid_id FROM probe)
),
pool AS (
  SELECT c.vec_id, c.label, c.embedding, q.qe,
         list_sum(list_transform(range(1, len(code)+1),
           i -> (code[i] * scale - qe[i]::DOUBLE) ^ 2)) AS adist
  FROM codes c, q
  ORDER BY adist, c.vec_id
  LIMIT {pool}
)
SELECT vec_id, label, round({dist}, 4) AS distance
FROM pool ORDER BY {dist}, vec_id LIMIT 5
""",
    nc=_N_CENTROIDS,
    probe=_IVF_PROBE_ID,
    cdist=_dd_l2("cvec", "q.qe"),
    adist_assign=_dd_l2("e.embedding", "c.cvec"),
    pool=_SQ8_POOL,
    dist=_dd_l2("pool.embedding", "pool.qe"),
)

_register("quant_ivf_sq8_index_search", _ivf_sq8_index_search, _DD_IVF_SQ8)


# ==========================================================================
