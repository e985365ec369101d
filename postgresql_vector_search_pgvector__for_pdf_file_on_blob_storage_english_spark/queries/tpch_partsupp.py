# TPC-H analogs needing the PARTSUPP relation (round 8) — the fixture
# star schema ships no partsupp table, so these six shapes (Q2, Q9,
# Q11, Q12*, Q16, Q20; *Q12 needs only date/priority adaptations)
# synthesize one DETERMINISTICALLY from modular arithmetic over
# (p_partkey, s_suppkey) — the same style of keyed synthesis dbgen
# itself uses — identically in Spark and in the oracle SQL, so the
# relation is bit-equal by construction.  With these, all 22 TPC-H
# query shapes have an analog in the registry (Q1 = the pricing
# summary, Q6 = forecast revenue, ... Q21/Q22 from earlier rounds).
#
# Money discipline (queries/_base.py header): every money product is
# quantized to integer cents (floor(x*100+0.5) BIGINT) BEFORE any
# cross-row sum or comparison, so aggregates are order-independent
# integer math; share thresholds are integer cross-multiplications
# (sum*1000 > total), never float fractions.  All oracle finals cast
# away HUGEINT.
# ==========================================================================
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _register, _t  # noqa: F401

_PS_FANOUT = 4  # candidate suppliers synthesized per part (pre-distinct)


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized partsupp: ``(ps_partkey, ps_suppkey,
    ps_availqty int, ps_cents bigint, ps_supplycost double)``.
    ``distinct`` collapses modular collisions; every derived column is
    pure integer arithmetic on the pair, so both engines produce the
    identical relation."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    ns = _t(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("_ns"))
    pairs = (
        part.crossJoin(F.broadcast(ns))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(_PS_FANOUT)])).alias("_i"),
            "_ns",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 3 + F.col("_i") * 7) % F.col("_ns"))
            .cast("long")
            .alias("ps_suppkey"),
        )
        .distinct()
    )
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 19) % 1000 + 1)
        .cast("int")
        .alias("ps_availqty"),
        ((F.col("ps_partkey") * 11 + F.col("ps_suppkey") * 7) % 9000 + 100)
        .cast("long")
        .alias("ps_cents"),
        (
            ((F.col("ps_partkey") * 11 + F.col("ps_suppkey") * 7) % 9000 + 100)
            / F.lit(100.0)
        ).alias("ps_supplycost"),
    )


_DD_PARTSUPP = f"""
pspairs AS MATERIALIZED (
  SELECT DISTINCT p_partkey AS ps_partkey,
         (p_partkey * 3 + i.i * 7) % (SELECT count(*) FROM supplier) AS ps_suppkey
  FROM part CROSS JOIN range(0, {_PS_FANOUT}) i(i)
),
partsupp AS MATERIALIZED (
  SELECT ps_partkey, ps_suppkey,
         CAST((ps_partkey * 17 + ps_suppkey * 19) % 1000 + 1 AS INT) AS ps_availqty,
         CAST((ps_partkey * 11 + ps_suppkey * 7) % 9000 + 100 AS BIGINT) AS ps_cents,
         ((ps_partkey * 11 + ps_suppkey * 7) % 9000 + 100) / 100.0 AS ps_supplycost
  FROM pspairs
)"""


# ---- Q2: min-cost supplier per part in a region ---------------------------


def _tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size").between(10, 30)) & (F.col("p_type") == "LARGE")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(eu_sup), ps.ps_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "p_type", "ps_cents", "s_name", "s_acctbal", "n_name")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("ps_cents").alias("_min_cents")
    )
    out = cand.join(
        F.broadcast(mins),
        (F.col("p_partkey") == F.col("_pk"))
        & (F.col("ps_cents") == F.col("_min_cents")),
    )
    return (
        out.select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.round(F.col("ps_cents") / 100.0, 2).alias("ps_supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(50)
    )


_DD_Q2 = f"""
WITH {_DD_PARTSUPP},
eu_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS MATERIALIZED (
  SELECT p.p_partkey, ps.ps_cents, s.s_name, s.s_acctbal, s.n_name
  FROM partsupp ps
  JOIN part p ON ps.ps_partkey = p.p_partkey
  JOIN eu_sup s ON ps.ps_suppkey = s.s_suppkey
  WHERE p.p_size BETWEEN 10 AND 30 AND p.p_type = 'LARGE'
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
       round(ps_cents / 100.0, 2) AS ps_supplycost
FROM cand c
WHERE ps_cents = (SELECT min(ps_cents) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 50
"""

_register("tpch_q2_min_cost_supplier", _tpch_q2, _DD_Q2)


# ---- Q9: product-type profit by nation and year ---------------------------


def _tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    # supply cost per part: the min synthesized cost (the fixture's
    # lineitem (partkey, suppkey) pairs are independent of partsupp's,
    # so the per-pair lookup of real Q9 is adapted to a per-part cost)
    cost = ps.groupBy(F.col("ps_partkey").alias("_pk")).agg(
        F.min("ps_cents").alias("_cost_cents")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    rev_cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    amount = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cost), li.l_partkey == F.col("_pk"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            "n_name",
            F.year("l_shipdate").alias("o_year"),
            (rev_cents - F.col("_cost_cents") * F.col("l_quantity").cast("long"))
            .alias("_amt_cents"),
        )
    )
    return (
        amount.groupBy("n_name", "o_year")
        .agg(F.round(F.sum("_amt_cents") / 100.0, 2).alias("profit"))
        .orderBy("n_name", F.col("o_year").desc())
    )


_DD_Q9 = f"""
WITH {_DD_PARTSUPP},
cost AS MATERIALIZED (
  SELECT ps_partkey, min(ps_cents) AS cost_cents FROM partsupp GROUP BY 1
),
amount AS MATERIALIZED (
  SELECT n.n_name, CAST(year(l.l_shipdate) AS INT) AS o_year,
         CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5) AS BIGINT)
         - c.cost_cents * CAST(l.l_quantity AS BIGINT) AS amt_cents
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN cost c ON l.l_partkey = c.ps_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%bolt%'
)
SELECT n_name, o_year, round(CAST(sum(amt_cents) AS BIGINT) / 100.0, 2) AS profit
FROM amount
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""

_register("tpch_q9_product_profit", _tpch_q9, _DD_Q9)


# ---- Q11: important stock (share-of-total HAVING) -------------------------


def _tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    scoped = ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_cents") * F.col("ps_availqty").cast("long")).alias("_v_cents"),
    )
    per_part = scoped.groupBy("ps_partkey").agg(
        F.sum("_v_cents").alias("_part_cents")
    )
    total = scoped.agg(F.sum("_v_cents").alias("_total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        # integer cross-multiplication: value > total/1000, exactly
        .filter(F.col("_part_cents") * 1000 > F.col("_total_cents"))
        .select(
            "ps_partkey",
            F.round(F.col("_part_cents") / 100.0, 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
        .limit(50)
    )


_DD_Q11 = f"""
WITH {_DD_PARTSUPP},
scoped AS MATERIALIZED (
  SELECT ps_partkey, ps_cents * CAST(ps_availqty AS BIGINT) AS v_cents
  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
  WHERE s_nationkey < 5
),
per_part AS MATERIALIZED (
  SELECT ps_partkey, CAST(sum(v_cents) AS BIGINT) AS part_cents
  FROM scoped GROUP BY 1
),
total AS (SELECT CAST(sum(v_cents) AS BIGINT) AS total_cents FROM scoped)
SELECT ps_partkey, round(part_cents / 100.0, 2) AS value
FROM per_part, total
WHERE part_cents * 1000 > total_cents
ORDER BY value DESC, ps_partkey
LIMIT 50
"""

_register("tpch_q11_important_stock", _tpch_q11, _DD_Q11)


# ---- Q12: priority classes by lateness bucket -----------------------------
# Adaptation: the fixture lineitem has no shipmode/commitdate/
# receiptdate; the Q12 SHAPE (join + date-window filter + two
# conditional counts per group) keys on l_returnflag with lateness =
# shipped > 30 days after order date, mirroring the Q4/Q21 adaptation.


def _tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_DD_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

_register("tpch_q12_priority_lateness", _tpch_q12, _DD_Q12)


# ---- Q16: supplier count per part attribute group -------------------------
# Adaptation: no s_comment — the "customer complaints" exclusion keys
# on s_acctbal < 1000 (non-trivially selective on the fixtures).


def _tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad_sup = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_sup), ps.ps_suppkey == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(40)
    )


_DD_Q16 = f"""
WITH {_DD_PARTSUPP}
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""

_register("tpch_q16_supplier_cnt", _tpch_q16, _DD_Q16)


# ---- Q20: excess inventory (nested semi-joins + correlated agg) -----------
# Adaptation: the availability threshold compares against the part's
# 1996 shipped quantity (per-part, not per-(part, supplier) — the
# synthesized pairs are independent of lineitem's); quantities are
# whole-valued doubles, so the comparison is exact integer math.


def _tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li96 = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = li96.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("_qty96")
    )
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    excess = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey, "left_semi")
        .join(F.broadcast(qty), ps.ps_partkey == F.col("_pk"))
        .filter(F.col("ps_availqty").cast("long") * 2 > F.col("_qty96"))
        .select("ps_suppkey")
        .distinct()
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        sup.join(excess, sup.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
        .limit(40)
    )


_DD_Q20 = f"""
WITH {_DD_PARTSUPP},
qty AS MATERIALIZED (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty96
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
),
excess AS MATERIALIZED (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN qty ON ps_partkey = l_partkey
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
    AND CAST(ps_availqty AS BIGINT) * 2 > qty96
)
SELECT s_name
FROM supplier
WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
  AND s_nationkey IN (
    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA')
ORDER BY s_name
LIMIT 40
"""

_register("tpch_q20_excess_inventory", _tpch_q20, _DD_Q20)
