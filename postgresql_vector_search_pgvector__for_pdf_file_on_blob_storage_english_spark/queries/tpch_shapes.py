# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _register, _t  # noqa: F401
# Classic analytical shapes adapted to the fixture star schema (TPC-H
# Q3/Q5/Q10/Q18 patterns): fact-fact shuffle joins with broadcast
# dimensions, correlated-aggregate semi-filters, group-filter HAVING.
# ==========================================================================

def _tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
    )
    return out


_register(
    "tpch_q3_shipping_priority",
    _tpch_q3_shipping_priority,
    """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)


def _tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        # "local": the supplying nation is the customer's nation
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )
    return out


_register(
    "tpch_q5_local_supplier_volume",
    _tpch_q5_local_supplier_volume,
    """
SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND c_nationkey = s_nationkey
GROUP BY n_name
""",
)


def _tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name", "revenue")
    )


_register(
    "tpch_q10_returned_items",
    _tpch_q10_returned_items,
    """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum(l_extendedprice * (1.0 - l_discount)) DESC, c_custkey
LIMIT 20
""",
)


def _tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


_register(
    "tpch_q18_large_volume_customers",
    _tpch_q18_large_volume,
    """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(total_qty, 2) AS total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)


# ==========================================================================


# ==========================================================================
# TPC-H Q21 analog (round 7) — "suppliers who kept orders waiting": the
# hardest relational shape in the suite, EXISTS + NOT EXISTS correlated
# over the same derived relation with different predicates.  The fixture
# lacks l_commitdate/l_receiptdate, so "late" adapts to l_shipdate more
# than 60 days after o_orderdate (pure timestamp+interval arithmetic —
# no session-timezone dependence).  Spark-first: the per-(order,
# supplier) late flag is ONE partial-agg groupBy; EXISTS becomes a
# left-semi join and NOT EXISTS a left-anti join, both keyed on
# orderkey with the supplier inequality as a residual condition, so
# each correlated subquery is a single keyed shuffle, not a per-row
# probe.  Counting only — no money columns, no float rounding anywhere.
# ==========================================================================


def _tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    fo = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    spo = (
        li.join(fo, li.l_orderkey == fo.o_orderkey)
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_suppkey").alias("supp"),
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).cast("int").alias("late_row"),
        )
        .groupBy("okey", "supp")
        .agg(F.max("late_row").alias("late"))
        # three consumers below (l1, the EXISTS side, the NOT EXISTS
        # side) — materialize the per-(order, supplier) relation once
        # instead of replaying the lineitem join per consumer (the CTE
        # materialization a TPC-H engine would do)
        .localCheckpoint(eager=True)
    )
    l1 = spo.filter(F.col("late") == 1)
    others = spo.select(F.col("okey").alias("o2"), F.col("supp").alias("supp2"))
    has_other = l1.join(
        others,
        (F.col("okey") == F.col("o2")) & (F.col("supp") != F.col("supp2")),
        "left_semi",
    )
    other_late = spo.filter(F.col("late") == 1).select(
        F.col("okey").alias("o3"), F.col("supp").alias("supp3")
    )
    waiters = has_other.join(
        other_late,
        (F.col("okey") == F.col("o3")) & (F.col("supp") != F.col("supp3")),
        "left_anti",
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiters.groupBy("supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


_register(
    "tpch_q21_waiting_suppliers",
    _tpch_q21_waiting_suppliers,
    """
WITH fo AS (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'),
spo AS (
  SELECT l_orderkey AS okey, l_suppkey AS supp,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN fo ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT s_name, count(*)::BIGINT AS numwait
FROM spo l1
JOIN supplier ON s_suppkey = l1.supp
WHERE l1.late = 1
  AND EXISTS (SELECT 1 FROM spo l2 WHERE l2.okey = l1.okey AND l2.supp <> l1.supp)
  AND NOT EXISTS (
    SELECT 1 FROM spo l3
    WHERE l3.okey = l1.okey AND l3.supp <> l1.supp AND l3.late = 1)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
