# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _dd_l2,
    _events,
    _pin_if_large,
    _register,
    _t,
    dd_sql,
)
from .pii_decontam_mixture import (  # noqa: F401
    _DD_MIX_CASE,
    _MIX_DEFAULT,
    _MIX_RATES,
    mixture_sample,
)
from .train_export import _DD_SHARD_STATS, _N_SHARDS, _shard_stats  # noqa: F401
# URL hygiene (round 5) — host extraction + blocklist + per-host stats
# (operators/urls.py).  Fixtures carry no URL column; deterministic URLs
# are woven from (source, doc_id) on both engines, including malformed
# rows (every 41st doc) that must be dropped.
# ==========================================================================

from ..operators.urls import registrable_domain, url_blocklist_filter  # noqa: E402

_URL_BLOCKED = ["src0-3.example.com", "src1-0.example.com", "src2-5.example.com"]


def _woven_urls(docs: DataFrame) -> DataFrame:
    url = F.when(F.col("doc_id") % 41 == 0, F.lit("not a url")).otherwise(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("-"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/page/"),
            F.col("doc_id").cast("string"),
        )
    )
    return docs.withColumn("url", url)


def _url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _woven_urls(_t(spark, sf_dir, "documents").select("doc_id", "source"))
    filt = url_blocklist_filter(docs, _URL_BLOCKED)
    return (
        filt.withColumn("domain", registrable_domain(F.col("host")))
        .groupBy("host", "domain")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


_DD_URL_BLOCKED_LIST = ", ".join(f"'{h}'" for h in sorted(_URL_BLOCKED))

_DD_URL_STATS = f"""
WITH u AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 41 = 0 THEN 'not a url'
              ELSE 'https://' || source || '-' || (doc_id % 7)::VARCHAR
                   || '.example.com/page/' || doc_id::VARCHAR END AS url
  FROM documents
),
h AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)) AS host
  FROM u
),
f AS (SELECT * FROM h WHERE host != '' AND host NOT IN ({_DD_URL_BLOCKED_LIST})),
d AS (
  SELECT doc_id, host,
         array_to_string(
           string_split(host, '.')[greatest(len(string_split(host, '.')) - 1, 1)
                                   : len(string_split(host, '.'))], '.') AS domain
  FROM f
)
SELECT host, domain, count(*) AS n_docs, min(doc_id) AS first_doc
FROM d GROUP BY host, domain
"""

_register("url_host_stats", _url_host_stats, _DD_URL_STATS)


# --------------------------------------------------------------------------
# TPC-H analog breadth, round 5 second wave: Q8 / Q15 / Q17 / Q19 / Q22.
# The fixtures carry no partsupp / l_shipmode / l_commitdate / c_phone, so
# Q2/Q9/Q11/Q12/Q16/Q20/Q21 remain out of reach and the five below are
# adapted to the columns that exist (noted per query).  Every predicate is
# checked non-vacuous at sf0.001 AND sf0.01 (the ADVICE r4 tpch_q7 lesson).
# --------------------------------------------------------------------------


def _tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share), adapted: p_type = 'ECONOMY' (the
    fixtures use bare type names), supplier nation NATION_19 (nonzero
    share at every fixture scale), customer region AMERICA, 1995-1996.

    Scale shape: the fact-side join chain is lineitem->orders (the only
    big-big join, on the natural key), every dimension (part, customer,
    supplier, nation, region) is broadcast; the yearly ratio is a 2-group
    final aggregate after a map-side partial."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nat = cust.join(
        F.broadcast(
            nation.join(
                F.broadcast(region), nation.n_regionkey == region.r_regionkey
            ).select("n_nationkey")
        ),
        cust.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nat = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust_nat), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_19", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_register(
    "tpch_q8_market_share",
    _tpch_q8_market_share,
    """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_19'
                      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1.0 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY year(o_orderdate)
ORDER BY o_year
""",
)


def _tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): revenue per supplier over a quarter,
    then the supplier(s) achieving the max.  Revenue is rounded to 2
    decimals BEFORE the max comparison on both sides, so the winner set
    is identical across engines despite summation-order ulps.

    Scale shape: one shuffle (groupBy l_suppkey — at most |supplier|
    groups), the scalar max comes back as a broadcast 1-row join, and
    supplier is broadcast.  No window over the full fact table."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("max_revenue"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_register(
    "tpch_q15_top_supplier",
    _tpch_q15_top_supplier,
    """
WITH revenue AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)


def _tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted: brand pair
    Brand#13/Brand#14 (no p_container column), threshold 0.5*avg
    (0.2*avg would be vacuous at min quantity 1 on the uniform 1..50
    fixture distribution).

    Scale shape: the correlated scalar subquery becomes a per-part
    partial aggregate joined back on l_partkey — both sides shuffle on
    the same key once; part (dimension) is broadcast into the fact scan
    before the agg so the brand filter prunes early."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand").isin("Brand#13", "Brand#14"))
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


_register(
    "tpch_q17_small_quantity",
    _tpch_q17_small_quantity,
    """
WITH per_part AS (
  SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS qty_thr
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pk
WHERE p_brand IN ('Brand#13', 'Brand#14') AND l_quantity < qty_thr
""",
)


def _tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: the three OR-arms keep
    the brand/size/quantity envelope shape but drop l_shipinstruct /
    l_shipmode (absent from the fixtures).

    Scale shape: part is broadcast; the disjunction is a single codegen
    filter over the joined row — one pass over lineitem, no shuffle
    before the final scalar aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    arm1 = (b == "Brand#12") & s.between(1, 15) & q.between(1, 15)
    arm2 = (b == "Brand#23") & s.between(1, 25) & q.between(10, 25)
    arm3 = (b == "Brand#3") & s.between(1, 35) & q.between(20, 35)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


_register(
    "tpch_q19_discounted_revenue",
    _tpch_q19_discounted_revenue,
    """
SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 35)
""",
)


def _tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: the fixtures have
    no c_phone, so the country-code grouping becomes the customer's
    nation, and "no orders at all" (vacuous here — every customer
    orders) becomes "no orders since 2000-07-01", i.e. churned
    above-average-balance customers per nation (~13 at sf0.001).

    Scale shape: the scalar avg is a broadcast 1-row cross join; the
    NOT EXISTS is a left-anti join shuffling only (o_custkey) pairs
    from the date-pruned orders slice; nation is broadcast."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
    )
    nation = _t(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


_register(
    "tpch_q22_sales_opportunity",
    _tpch_q22_sales_opportunity,
    """
WITH ab AS (SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0)
SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg_bal FROM ab)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY n_name
ORDER BY n_name
""",
)


# --------------------------------------------------------------------------
# Behavioral analytics (round 5): ordered funnel + cohort retention over
# the events table (operators/funnel.py).  The two canonical
# product-analytics shapes; both pure keyed aggregates/joins.
# --------------------------------------------------------------------------


def _events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import funnel_counts

    return funnel_counts(
        _events(spark, sf_dir), ["view", "click", "purchase"],
        pin=_pin_if_large(sf_dir, "events"),
    )


_register(
    "events_funnel_conversion",
    _events_funnel,
    """
WITH s0 AS (
  SELECT user_id, min(ts) AS conv FROM events WHERE event_type = 'view' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS conv
  FROM events e JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.conv
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS conv
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.conv
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 0 AS step_idx, 'view' AS step, count(*) AS n_users FROM s0
UNION ALL
SELECT 1 AS step_idx, 'click' AS step, count(*) AS n_users FROM s1
UNION ALL
SELECT 2 AS step_idx, 'purchase' AS step, count(*) AS n_users FROM s2
""",
)


def _events_funnel_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-deadline funnel: later steps must land within 6 h of
    the first view (the deadline bites hard at every fixture scale:
    15->3->1 at sf0.001, 150->19->0 at sf0.01 — a 0-count step still
    emits its report row)."""
    from ..operators.funnel import funnel_counts

    return funnel_counts(
        _events(spark, sf_dir), ["view", "click", "purchase"],
        within_seconds=6 * 3600,
        pin=_pin_if_large(sf_dir, "events"),
    )


_register(
    "events_funnel_deadline",
    _events_funnel_deadline,
    """
WITH s0 AS (
  SELECT user_id, min(ts) AS conv FROM events WHERE event_type = 'view' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS conv, min(s0.conv) AS t0
  FROM events e JOIN s0 ON e.user_id = s0.user_id
   AND e.ts > s0.conv AND e.ts <= s0.conv + INTERVAL 6 HOUR
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS conv
  FROM events e JOIN s1 ON e.user_id = s1.user_id
   AND e.ts > s1.conv AND e.ts <= s1.t0 + INTERVAL 6 HOUR
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 0 AS step_idx, 'view' AS step, count(*) AS n_users FROM s0
UNION ALL
SELECT 1 AS step_idx, 'click' AS step, count(*) AS n_users FROM s1
UNION ALL
SELECT 2 AS step_idx, 'purchase' AS step, count(*) AS n_users FROM s2
""",
)


def _events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import cohort_retention

    return cohort_retention(_events(spark, sf_dir), unit="week")


_register(
    "events_weekly_retention",
    _events_retention,
    """
WITH p AS (SELECT user_id, date_trunc('week', ts) AS w FROM events),
firsts AS (SELECT user_id, min(w) AS cohort FROM p GROUP BY user_id),
act AS (SELECT DISTINCT user_id, w FROM p)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
       CAST(date_diff('day', f.cohort, a.w) / 7 AS INT) AS "offset",
       count(DISTINCT a.user_id) AS n_users
FROM act a JOIN firsts f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
)


# --------------------------------------------------------------------------
# Data profiling + declarative quality constraints (round 5): the Deequ-
# class validation stage (operators/profile.py) — the gate a training
# pipeline runs on a fresh snapshot before anything trains on it.
# --------------------------------------------------------------------------


def _profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import column_profile

    return column_profile(_t(spark, sf_dir, "documents"))


_register(
    "profile_documents",
    _profile_documents,
    """
SELECT 'doc_id' AS "column", count(*) AS n_rows, count(*) - count(doc_id) AS n_nulls,
       count(DISTINCT doc_id) AS n_distinct, min(doc_id)::VARCHAR AS min_value,
       max(doc_id)::VARCHAR AS max_value, round(avg(doc_id), 6) AS mean
FROM documents
UNION ALL
SELECT 'text', count(*), count(*) - count(text), count(DISTINCT text),
       min(text)::VARCHAR, max(text)::VARCHAR, NULL::DOUBLE
FROM documents
UNION ALL
SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
       min(lang)::VARCHAR, max(lang)::VARCHAR, NULL::DOUBLE
FROM documents
UNION ALL
SELECT 'source', count(*), count(*) - count(source), count(DISTINCT source),
       min(source)::VARCHAR, max(source)::VARCHAR, NULL::DOUBLE
FROM documents
UNION ALL
SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars),
       min(n_chars)::VARCHAR, max(n_chars)::VARCHAR, round(avg(n_chars), 6)
FROM documents
""",
)


def _quality_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite over orders; the last check is
    deliberately calibrated to FAIL (observed ~0.7 < 0.99) so the report
    proves both verdict paths, not just a vacuous all-green."""
    from ..operators.profile import (
        check_constraints,
        completeness,
        fraction_in_range,
        fraction_in_set,
        fraction_matching,
        uniqueness,
    )

    orders = _t(spark, sf_dir, "orders")
    return check_constraints(orders, [
        ("custkey_complete", completeness("o_custkey"), 1.0),
        ("orderkey_unique", uniqueness("o_orderkey"), 1.0),
        ("price_in_bounds", fraction_in_range("o_totalprice", 0.0, 500000.0), 1.0),
        ("status_in_set", fraction_in_set("o_orderstatus", ["F", "O", "P"]), 1.0),
        ("priority_format", fraction_matching("o_orderpriority", "^[1-5]-"), 1.0),
        ("price_under_100k", fraction_in_range("o_totalprice", 0.0, 100000.0), 0.99),
    ])


_register(
    "quality_checks_orders",
    _quality_checks_orders,
    """
WITH obs AS (
  SELECT
    round(avg(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS custkey_complete,
    round(count(DISTINCT o_orderkey) / count(*), 6) AS orderkey_unique,
    round(avg(CASE WHEN o_totalprice BETWEEN 0.0 AND 500000.0 THEN 1.0 ELSE 0.0 END), 6) AS price_in_bounds,
    round(avg(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 1.0 ELSE 0.0 END), 6) AS status_in_set,
    round(avg(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1.0 ELSE 0.0 END), 6) AS priority_format,
    round(avg(CASE WHEN o_totalprice BETWEEN 0.0 AND 100000.0 THEN 1.0 ELSE 0.0 END), 6) AS price_under_100k
  FROM orders
)
SELECT 'custkey_complete' AS "constraint", custkey_complete AS observed, custkey_complete >= 1.0 AS passed FROM obs
UNION ALL SELECT 'orderkey_unique', orderkey_unique, orderkey_unique >= 1.0 FROM obs
UNION ALL SELECT 'price_in_bounds', price_in_bounds, price_in_bounds >= 1.0 FROM obs
UNION ALL SELECT 'status_in_set', status_in_set, status_in_set >= 1.0 FROM obs
UNION ALL SELECT 'priority_format', priority_format, priority_format >= 1.0 FROM obs
UNION ALL SELECT 'price_under_100k', price_under_100k, price_under_100k >= 0.99 FROM obs
""",
)


def _profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import histogram

    return histogram(_events(spark, sf_dir), "value", n_buckets=10)


_register(
    "profile_value_histogram",
    _profile_histogram,
    """
WITH b AS (SELECT min(value::DOUBLE) AS lo, max(value::DOUBLE) AS hi FROM events)
SELECT CAST(least(greatest(floor((value::DOUBLE - lo) / ((hi - lo) / 10.0)), 0), 9) AS INT) AS bucket,
       round(lo + CAST(least(greatest(floor((value::DOUBLE - lo) / ((hi - lo) / 10.0)), 0), 9) AS INT) * (hi - lo) / 10.0, 6) AS bucket_lo,
       round(lo + (CAST(least(greatest(floor((value::DOUBLE - lo) / ((hi - lo) / 10.0)), 0), 9) AS INT) + 1) * (hi - lo) / 10.0, 6) AS bucket_hi,
       count(*) AS n
FROM events, b
WHERE value IS NOT NULL AND value::DOUBLE >= lo AND value::DOUBLE <= hi
GROUP BY 1, 2, 3
""",
)


# --------------------------------------------------------------------------
# JSONL shard export (round 5): the text-shard twin of the parquet
# training export (operators/export.py::shard_export_jsonl).
# --------------------------------------------------------------------------


def _train_shard_jsonl_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the JSONL export: write hive-partitioned .json shards,
    read them back with an explicit schema, recompute the shard stats —
    must equal the in-memory assignment (same oracle), proving the text
    sink preserves membership, keys, and long fidelity."""
    import hashlib
    import os
    import tempfile

    from ..operators.export import shard_export_jsonl

    docs = _t(spark, sf_dir, "documents")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_jsonl_shards_{tag}")
    shard_export_jsonl(docs, path, n_shards=_N_SHARDS)
    back = (
        spark.read.schema(
            "doc_id long, text string, lang string, source string, n_chars long, sort_key long"
        )
        .json(path)
        .withColumn(
            "shard",
            F.regexp_extract(F.input_file_name(), r"shard=(\d+)", 1).cast("int"),
        )
    )
    return _shard_stats(back)


_register("train_shard_export_jsonl_read", _train_shard_jsonl_read, _DD_SHARD_STATS)


# --------------------------------------------------------------------------
# Snapshot drift (round 5): per-column profile deltas between a corpus
# snapshot and its mixture-sampled successor (operators/profile.py::
# profile_drift) — the "did the data change under me" retraining gate.
# --------------------------------------------------------------------------


def _profile_drift_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import column_profile, profile_drift

    docs = _t(spark, sf_dir, "documents")
    cols = ["doc_id", "n_chars"]
    before = column_profile(docs.select(*cols))
    after = column_profile(
        mixture_sample(docs, _MIX_RATES, default_rate=_MIX_DEFAULT).select(*cols)
    )
    return profile_drift(before, after)


_register(
    "profile_drift_mixture",
    _profile_drift_mixture,
    dd_sql(
        """
WITH kept AS (
  SELECT * FROM documents
  WHERE (('0x' || substr(md5('mixture' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000)
        < (CASE source {cases} ELSE {dflt} END)
)
SELECT 'doc_id' AS "column",
       (SELECT count(*) FROM documents) AS n_rows_before,
       (SELECT count(*) FROM kept) AS n_rows_after,
       round((SELECT (count(*) - count(doc_id)) / count(*)::DOUBLE FROM kept)
             - (SELECT (count(*) - count(doc_id)) / count(*)::DOUBLE FROM documents), 6) AS null_frac_delta,
       round((SELECT count(DISTINCT doc_id) / count(*)::DOUBLE FROM kept)
             - (SELECT count(DISTINCT doc_id) / count(*)::DOUBLE FROM documents), 6) AS distinct_ratio_delta,
       round((SELECT round(avg(doc_id), 6) FROM kept)
             - (SELECT round(avg(doc_id), 6) FROM documents), 6) AS mean_delta
UNION ALL
SELECT 'n_chars',
       (SELECT count(*) FROM documents),
       (SELECT count(*) FROM kept),
       round((SELECT (count(*) - count(n_chars)) / count(*)::DOUBLE FROM kept)
             - (SELECT (count(*) - count(n_chars)) / count(*)::DOUBLE FROM documents), 6),
       round((SELECT count(DISTINCT n_chars) / count(*)::DOUBLE FROM kept)
             - (SELECT count(DISTINCT n_chars) / count(*)::DOUBLE FROM documents), 6),
       round((SELECT round(avg(n_chars), 6) FROM kept)
             - (SELECT round(avg(n_chars), 6) FROM documents), 6)
""",
        cases=_DD_MIX_CASE,
        dflt=int(round(_MIX_DEFAULT * 10000)),
    ),
)


# --------------------------------------------------------------------------
# Class-balanced downsampling (round 5): data-dependent per-class rates,
# equalizing the language mix (operators/groupwise.py::rebalance_classes).
# --------------------------------------------------------------------------


def _rebalance_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance documents across languages: en is ~2.7x the smallest
    class at every fixture scale, so the rebalance bites everywhere."""
    from ..operators.groupwise import rebalance_classes

    docs = _t(spark, sf_dir, "documents")
    out = rebalance_classes(docs, label_col="lang", id_col="doc_id")
    return out.select("doc_id", "lang")


_register(
    "rebalance_lang_classes",
    _rebalance_langs,
    """
WITH counts AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
m AS (SELECT min(cnt) AS mn FROM counts),
rates AS (SELECT lang, floor(mn * 10000 / cnt) AS thr FROM counts, m)
SELECT doc_id, lang
FROM documents JOIN rates USING (lang)
WHERE (('0x' || substr(md5('rebalance' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000) < thr
""",
)


def _stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified 80/20 split by language: per-class train counts
    are exactly floor(0.8 * n_c) — verified by the (lang, split, n)
    report this entry emits (operators/groupwise.py::
    stratified_split_exact)."""
    from ..operators.groupwise import stratified_split_exact

    docs = _t(spark, sf_dir, "documents")
    out = stratified_split_exact(docs, train_frac=0.8, label_col="lang")
    return out.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n"))


_register(
    "stratified_split_counts",
    _stratified_split,
    """
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
r AS (
  SELECT d.lang, d.doc_id, c.cnt,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY ('0x' || substr(md5('strat' || '§' || d.doc_id::VARCHAR), 1, 8))::BIGINT,
                    d.doc_id) AS rk
  FROM documents d JOIN c USING (lang)
)
SELECT lang, CASE WHEN rk <= floor(cnt * 0.8) THEN 'train' ELSE 'test' END AS split,
       count(*) AS n
FROM r GROUP BY 1, 2
""",
)


# --------------------------------------------------------------------------
# Contrastive-pair mining (round 5): per-anchor nearest positives + hard
# negatives for embedding training (operators/mining.py).
# --------------------------------------------------------------------------


def _train_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import triplet_mining

    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("anchor_vec"),
    )
    return triplet_mining(emb, anchors, n_pos=1, n_neg=3)


def _label_protos(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import label_prototypes

    return label_prototypes(_t(spark, sf_dir, "embeddings"))


_register(
    "embed_label_prototypes",
    _label_protos,
    """
WITH ex AS (
  SELECT label, unnest(range(1, len(embedding) + 1)) AS pos, unnest(embedding) AS val
  FROM embeddings
),
per AS (
  SELECT label, pos, round(sum(val::DOUBLE) / count(*), 4) + 0.0 AS v, count(*) AS c
  FROM ex GROUP BY 1, 2
)
SELECT label, max(c) AS n_members, list(v ORDER BY pos) AS prototype
FROM per GROUP BY label
""",
)


def _proto_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import label_prototypes, prototype_confusion

    emb = _t(spark, sf_dir, "embeddings")
    return prototype_confusion(emb, label_prototypes(emb))


_register(
    "embed_prototype_confusion",
    _proto_confusion,
    """
WITH ex AS (
  SELECT label, unnest(range(1, len(embedding) + 1)) AS pos, unnest(embedding) AS val
  FROM embeddings
),
per AS (
  SELECT label, pos, round(sum(val::DOUBLE) / count(*), 4) + 0.0 AS v
  FROM ex GROUP BY 1, 2
),
proto AS (SELECT label AS proto_label, list(v ORDER BY pos) AS p FROM per GROUP BY label),
scored AS (
  SELECT e.vec_id, e.label, pr.proto_label,
         list_sum(list_transform(range(1, len(pr.p) + 1),
           i -> (e.embedding[i]::DOUBLE - pr.p[i]) * (e.embedding[i]::DOUBLE - pr.p[i]))) AS d
  FROM embeddings e, proto pr
),
pred AS (
  SELECT vec_id, label, proto_label FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, proto_label) = 1
)
SELECT label, proto_label AS pred_label, count(*) AS n
FROM pred GROUP BY 1, 2
""",
)


def _proto_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift between snapshots, measured at the class level:
    per-label prototype L2 shift between the full corpus and a
    deterministic half-sample (the monitoring check that catches an
    embedding-model or upstream-distribution change before retraining).
    Both snapshots' prototypes come from the same distributed operator;
    the shift math is a zip_with fold over the two rounded prototypes,
    so the oracle replays it exactly."""
    from ..operators.mining import label_prototypes

    emb = _t(spark, sf_dir, "embeddings")
    half = emb.filter(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("§", F.lit("protodrift"), F.col("vec_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 2 == 0
    )
    a = label_prototypes(emb).select(
        "label",
        F.col("n_members").alias("n_full"),
        F.col("prototype").alias("_p_full"),
    )
    b = label_prototypes(half).select(
        "label",
        F.col("n_members").alias("n_half"),
        F.col("prototype").alias("_p_half"),
    )
    shift = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("_p_full"), F.col("_p_half"), lambda x, y: F.pow(x - y, F.lit(2.0))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return a.join(b, "label").select(
        "label", "n_full", "n_half", F.round(shift, 4).alias("proto_shift")
    )


_register(
    "embed_prototype_drift",
    _proto_drift,
    """
WITH ex AS (
  SELECT label, vec_id, unnest(range(1, len(embedding) + 1)) AS pos, unnest(embedding) AS val
  FROM embeddings
),
pf AS (
  SELECT label, pos, round(sum(val::DOUBLE) / count(*), 4) + 0.0 AS v, count(*) AS c
  FROM ex GROUP BY 1, 2
),
full_p AS (SELECT label, max(c) AS n_full, list(v ORDER BY pos) AS p FROM pf GROUP BY label),
hx AS (
  SELECT * FROM ex
  WHERE (('0x' || substr(md5('protodrift' || '§' || vec_id::VARCHAR), 1, 8))::BIGINT % 2) = 0
),
ph AS (
  SELECT label, pos, round(sum(val::DOUBLE) / count(*), 4) + 0.0 AS v, count(*) AS c
  FROM hx GROUP BY 1, 2
),
half_p AS (SELECT label, max(c) AS n_half, list(v ORDER BY pos) AS p FROM ph GROUP BY label)
SELECT f.label, f.n_full, h.n_half,
       round(sqrt(list_sum(list_transform(range(1, len(f.p) + 1),
             i -> (f.p[i] - h.p[i]) * (f.p[i] - h.p[i])))), 4) AS proto_shift
FROM full_p f JOIN half_p h ON f.label = h.label
""",
)


_register(
    "train_triplet_mining",
    _train_triplets,
    dd_sql("""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS av
  FROM embeddings WHERE vec_id < 4
),
scored AS (
  SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label, {dist} AS d
  FROM embeddings e, a
),
pos AS (
  SELECT anchor_id, 'positive' AS role,
         row_number() OVER (PARTITION BY anchor_id ORDER BY d, vec_id) AS rank,
         vec_id, label, round(d, 4) AS distance
  FROM scored WHERE label = anchor_label AND vec_id != anchor_id
  QUALIFY rank <= 1
),
neg AS (
  SELECT anchor_id, 'hard_negative' AS role,
         row_number() OVER (PARTITION BY anchor_id ORDER BY d, vec_id) AS rank,
         vec_id, label, round(d, 4) AS distance
  FROM scored WHERE label != anchor_label
  QUALIFY rank <= 3
)
SELECT * FROM pos UNION ALL SELECT * FROM neg
""", dist=_dd_l2("e.embedding", "a.av")),
)


# --------------------------------------------------------------------------
# Source/sink format matrix (round 5): the documents table written and
# re-read through every text-capable format the engine serves (parquet /
# JSON-lines / CSV), each round-trip reduced to the same invariants.
# CSV is the adversarial one — document text carries newlines, quotes,
# and commas — so the writer emits quoted/escaped fields and the reader
# runs multiLine; a fidelity bug in either direction breaks the hash.
# --------------------------------------------------------------------------


def _source_format_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_fmt_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    paths = {f: os.path.join(base, f) for f in ("parquet", "json", "csv")}
    docs.write.parquet(paths["parquet"])
    docs.write.json(paths["json"])
    (
        docs.write.option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(paths["csv"])
    )
    readers = {
        "parquet": spark.read.schema(schema).parquet(paths["parquet"]),
        "json": spark.read.schema(schema).json(paths["json"]),
        "csv": spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(paths["csv"]),
    }
    stats = [
        back.agg(
            F.lit(fmt).alias("fmt"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").alias("sum_ids"),
            F.count_distinct(F.md5(F.col("text"))).alias("n_distinct_texts"),
            F.sum("n_chars").alias("sum_chars"),
        )
        for fmt, back in sorted(readers.items())
    ]
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out


_register(
    "source_format_matrix",
    _source_format_matrix,
    """
SELECT fmt, count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS sum_ids,
       count(DISTINCT md5(text)) AS n_distinct_texts, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents, (SELECT unnest(['csv', 'json', 'parquet']) AS fmt)
GROUP BY fmt
""",
)


# --------------------------------------------------------------------------
# UNPIVOT + ordered string aggregation (round 5): the two relational
# surface pieces not yet exercised — melt wide measures to long form
# (the inverse of pivot_event_type_counts) and listagg with declared
# order (non-deterministic without one; the ORDER BY inside the
# aggregate is the portability contract).
# --------------------------------------------------------------------------


def _unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )


_register(
    "unpivot_lineitem_measures",
    _unpivot_measures,
    """
WITH long AS (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
)
SELECT measure, count(*) AS n, round(sum(value), 2) AS total
FROM long GROUP BY measure
""",
)


def _listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations")
        )
        .orderBy("n_regionkey")
    )


_register(
    "listagg_nations_per_region",
    _listagg_nations,
    """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
)


# --------------------------------------------------------------------------
# Distributed statistics via sufficient statistics (round 5): closed-form
# OLS and a correlation matrix — the "train a (linear) model inside the
# engine" primitives.  Everything reduces to one aggregation pass of
# sums/products; the closed forms are exact algebra over those sums, so
# the cross-engine replay is exact after rounding.
# --------------------------------------------------------------------------


def _linreg_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of l_extendedprice on l_quantity from sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) — the map-side-combinable shape every
    distributed regression starts from; slope/intercept/r² in closed
    form, one scan, one 1-row aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity").cast("double"), F.col("l_extendedprice").cast("double")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r_den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 2).alias("intercept"),
        F.round(F.pow(r_num / r_den, F.lit(2.0)), 4).alias("r2"),
    )


_register(
    "stats_linreg_price_qty",
    _linreg_price_qty,
    """
WITH s AS (
  SELECT count(*)::DOUBLE AS n,
         sum(l_quantity::DOUBLE) AS sx, sum(l_extendedprice::DOUBLE) AS sy,
         sum(l_quantity::DOUBLE * l_extendedprice::DOUBLE) AS sxy,
         sum(l_quantity::DOUBLE * l_quantity::DOUBLE) AS sxx,
         sum(l_extendedprice::DOUBLE * l_extendedprice::DOUBLE) AS syy
  FROM lineitem
)
SELECT n::BIGINT AS n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 2) AS intercept,
       round(((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))) ^ 2, 4) AS r2
FROM s
""",
)


def _corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem numeric measures,
    long form (col_x < col_y).  Built from the same one-pass sufficient
    statistics, unpivoted into rows — N columns correlate in one scan."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        x = F.col(c).cast("double")
        aggs.append(F.sum(x).alias(f"s_{c}"))
        aggs.append(F.sum(x * x).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast("double") * F.col(b).cast("double")).alias(f"sp_{a}_{b}")
            )
    wide = _t(spark, sf_dir, "lineitem").agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            num = F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            den = F.sqrt(
                (F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * (F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    (F.round(num / den, 4) + F.lit(0.0)).alias("corr"),
                )
            )
    return wide.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")


def _dd_corr_pair(a: str, b: str) -> str:
    return (
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
        f"round((n * sp_{a}_{b} - s_{a} * s_{b}) / "
        f"sqrt((n * ss_{a} - s_{a} * s_{a}) * (n * ss_{b} - s_{b} * s_{b})), 4) + 0.0 AS corr FROM s"
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_DD_CORR_SUMS = ", ".join(
    [f"sum({c}::DOUBLE) AS s_{c}, sum({c}::DOUBLE * {c}::DOUBLE) AS ss_{c}" for c in _CORR_COLS]
    + [
        f"sum({a}::DOUBLE * {b}::DOUBLE) AS sp_{a}_{b}"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
)
_DD_CORR_PAIRS = "\nUNION ALL\n".join(
    _dd_corr_pair(a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
)

_register(
    "stats_correlation_matrix",
    _corr_matrix,
    f"""
WITH s AS (
  SELECT count(*)::DOUBLE AS n, {_DD_CORR_SUMS}
  FROM lineitem
)
{_DD_CORR_PAIRS}
""",
)


# ==========================================================================


# ---- row-level snapshot diff (round 8) — operators/profile.py ------------
# The data-version-control primitive next to the statistical
# profile_drift: every id classified added/removed/changed/unchanged by
# a portable md5 content hash; only (id, hash) pairs cross the
# full-outer join's exchange.  The "after" snapshot is synthesized
# deterministically from documents on both engines: ids % 7 == 0
# dropped, ids % 5 == 0 text-uppercased, ids % 11 == 0 re-keyed above
# max(doc_id) as additions.

def _corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text", "lang", "source")
    mx = base.agg((F.max("doc_id") + 1).alias("_m"))
    kept = base.filter(F.col("doc_id") % 7 != 0)
    changed = F.when(F.col("doc_id") % 5 == 0, F.upper(F.col("text"))).otherwise(
        F.col("text")
    )
    after = kept.select("doc_id", changed.alias("text"), "lang", "source")
    additions = (
        base.filter(F.col("doc_id") % 11 == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("doc_id") + F.col("_m")).alias("doc_id"),
            "text", "lang", "source",
        )
    )
    diff = snapshot_diff(base, after.unionAll(additions), id_col="doc_id")
    return (
        diff.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("status")
    )


_DD_SNAPSHOT_DIFF = """
WITH base AS (SELECT doc_id, text, lang, source FROM documents),
mx AS (SELECT max(doc_id) + 1 AS m FROM base),
after AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END AS text,
         lang, source
  FROM base WHERE doc_id % 7 != 0
  UNION ALL
  SELECT doc_id + mx.m, text, lang, source FROM base, mx WHERE doc_id % 11 = 0
),
hb AS (
  -- per-column digests (null -> literal 'null', disjoint from hex) then
  -- a hash of the digest concatenation: separator-proof, like the engine
  SELECT doc_id,
         md5(CASE WHEN lang IS NULL THEN 'null' ELSE md5(lang) END
             || CASE WHEN source IS NULL THEN 'null' ELSE md5(source) END
             || CASE WHEN text IS NULL THEN 'null' ELSE md5(text) END) AS h
  FROM base
),
ha AS (
  SELECT doc_id,
         md5(CASE WHEN lang IS NULL THEN 'null' ELSE md5(lang) END
             || CASE WHEN source IS NULL THEN 'null' ELSE md5(source) END
             || CASE WHEN text IS NULL THEN 'null' ELSE md5(text) END) AS h
  FROM after
),
diff AS (
  SELECT CASE WHEN hb.h IS NULL THEN 'added'
              WHEN ha.h IS NULL THEN 'removed'
              WHEN hb.h != ha.h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM hb FULL OUTER JOIN ha USING (doc_id)
)
SELECT status, count(*)::BIGINT AS n_docs
FROM diff GROUP BY status ORDER BY status
"""

_register("corpus_snapshot_diff", _corpus_snapshot_diff, _DD_SNAPSHOT_DIFF)


# --------------------------------------------------------------------------
# SSL-prototypes data pruning (round 8, session 2 — operators/mining.py::
# prototypicality_prune): with dedup_semantic_clusters upstream this
# completes the D4 pipeline (SemDeDup -> prototypicality prune).  Drops
# the 40% most prototypical (easiest) examples per class, keeping the
# hard set; distances rank against the ROUNDED class prototypes, so the
# oracle replays the ranking bit-exactly.
# --------------------------------------------------------------------------


def _prune_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import prototypicality_prune

    emb = _t(spark, sf_dir, "embeddings")
    return prototypicality_prune(emb, pct_prune=40, keep="hard")


_register(
    "train_prune_prototypes",
    _prune_prototypes,
    """
WITH ex AS (
  SELECT label, vec_id, unnest(range(1, len(embedding) + 1)) AS pos, unnest(embedding) AS val
  FROM embeddings
),
per AS (
  SELECT label, pos, round(sum(val::DOUBLE) / count(*), 4) + 0.0 AS v, count(*) AS c
  FROM ex GROUP BY 1, 2
),
proto AS (SELECT label, max(c) AS n_members, list(v ORDER BY pos) AS p FROM per GROUP BY label),
scored AS (
  SELECT e.vec_id, e.label, pr.n_members,
         list_sum(list_transform(range(1, len(pr.p) + 1),
           i -> (e.embedding[i]::DOUBLE - pr.p[i]) * (e.embedding[i]::DOUBLE - pr.p[i]))) AS d
  FROM embeddings e JOIN proto pr ON pr.label = e.label
),
ranked AS (
  SELECT vec_id, label, d, n_members,
         row_number() OVER (PARTITION BY label ORDER BY d, vec_id) AS rn
  FROM scored
)
SELECT vec_id, label, round(d, 4) AS proto_dist2
FROM ranked WHERE rn > (n_members * 40) // 100
""",
)


# --------------------------------------------------------------------------
# Schema evolution read (round 8, session 2): two parquet batches with
# DIFFERENT schemas in one table directory — batch 0 writes
# (o_orderkey, o_totalprice), batch 1 adds o_orderpriority — read back
# with mergeSchema: the unified scan must null-fill the pre-evolution
# rows, keep types, and still allow column pruning.  The lakehouse
# append-a-column migration, gated end to end: the entry writes the
# batches (pid-keyed temp dir, derived deterministically from orders),
# reads the evolved table, and aggregates per batch; the oracle
# replays the same arithmetic from the source rows.
# --------------------------------------------------------------------------


def _schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    orders = _t(spark, sf_dir, "orders")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_schema_evo_{tag}_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.parquet(f"{base}/b0")
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.parquet(f"{base}/b1")
    evolved = spark.read.option("mergeSchema", "true").parquet(f"{base}/b0", f"{base}/b1")
    return (
        evolved.groupBy(
            F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias("o_orderpriority")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


_register(
    "source_schema_evolution",
    _schema_evolution,
    """
SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
            ELSE '<pre-evolution>' END AS o_orderpriority,
       count(*)::BIGINT AS n_rows,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1
""",
)


# ==========================================================================
# Prototype-distance PSI (round 13, VERDICT r12 item 7): the PSI-gated
# twin of embed_prototype_drift above — that entry reports the raw L2
# shift of each class prototype; this one closes the monitoring loop
# with the population-stability index the drift family (events PSI /
# CUSUM / Page-Hinkley) already speaks, over EMBEDDINGS: bucket every
# vector's squared distance to its class prototype (reference-half
# prototypes), compare the reference half's bucket distribution to the
# current half's, PSI = sum_b (pA - pB) ln(pA/pB) in micro-nats.
#
# Exactness: d2 is the same ordered float fold the confusion/drift
# entries gate (identical IEEE arithmetic on both engines), quantized
# at 1e4 BEFORE binning; buckets are the Brier-style integer-range
# split over the global [lo, hi]; Laplace +1 on the COMPLETE
# label x bucket grid makes every proportion positive; each bucket's
# term is (cA'nB' - cB'nA') * (lnm(cA'nB') - lnm(cB'nA')) — both
# factors share a sign (lnm is monotone), so the per-label sum is an
# order-free aggregation of NON-NEGATIVE integers, divided once by
# nA'nB' (truncation == floor).  DECIMAL(38,0)/HUGEINT intermediates:
# c*n <= N^2 stays exact to N ~ 1e16 per label.
#
# Scale shape: prototypes are |labels| x dim (broadcast); the corpus
# is touched twice (prototype partial-agg, then one scoring pass);
# the grid is domain-bounded (|labels| x 8); no windows, no collect.
# ==========================================================================

_PSI_B = 8


def _embed_prototype_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import label_prototypes

    emb = _t(spark, sf_dir, "embeddings")
    is_ref = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("§", F.lit("protopsi"), F.col("vec_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 2 == 0
    )
    ref = emb.filter(is_ref)
    protos = label_prototypes(ref).select("label", "prototype")
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("prototype"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = emb.join(F.broadcast(protos), "label").select(
        "label",
        is_ref.cast("long").alias("is_ref"),
        F.floor(d2 * 10000 + F.lit(0.5)).cast("long").alias("d2q"),
    )
    # bounds and bucketed both consume scored, whose lineage is the
    # full corpus distance fold plus the prototype aggregation — as
    # plain branches each re-ran that chain (24 parquet scans in the
    # gated plan, r13 opt); pin the 3-int-per-row scored relation
    scored = scored.localCheckpoint(eager=False)
    bounds = scored.agg(F.min("d2q").alias("lo"), F.max("d2q").alias("hi"))
    bucketed = scored.crossJoin(F.broadcast(bounds)).selectExpr(
        "label", "is_ref",
        f"CAST(((d2q - lo) * {_PSI_B}) div (hi - lo + 1) AS INT) AS bucket",
    )
    counts = bucketed.groupBy("label", "bucket").agg(
        F.sum("is_ref").alias("ca"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("cb"),
    )
    # counts (|labels| x 8 rows) feeds three branches (labels grid,
    # left join, per-label totals) — pin it so the bucketing pass over
    # the corpus runs once (r13 opt)
    counts = counts.localCheckpoint(eager=False)
    labels = counts.select("label").distinct()
    grid = (
        labels.select(
            "label", F.explode(F.sequence(F.lit(0), F.lit(_PSI_B - 1))).alias("bucket")
        )
        .join(counts, ["label", "bucket"], "left")
        .selectExpr(
            "label", "bucket",
            "coalesce(ca, CAST(0 AS BIGINT)) + 1 AS ca1",
            "coalesce(cb, CAST(0 AS BIGINT)) + 1 AS cb1",
        )
    )
    per_label = counts.groupBy("label").agg(
        F.sum("ca").alias("n_ref"), F.sum("cb").alias("n_cur")
    )
    lnm = "CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
    term = (
        "(axb - bxa) * ("
        + lnm.format(x="axb")
        + " - "
        + lnm.format(x="bxa")
        + ")"
    )
    return (
        grid.join(F.broadcast(per_label), "label")
        .selectExpr(
            "label", "n_ref", "n_cur",
            f"CAST(ca1 AS DECIMAL(38,0)) * (n_cur + {_PSI_B}) AS axb",
            f"CAST(cb1 AS DECIMAL(38,0)) * (n_ref + {_PSI_B}) AS bxa",
        )
        .groupBy("label")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.expr(f"sum({term})").alias("_num"),
        )
        .selectExpr(
            "label",
            "CAST(n_ref AS BIGINT) AS n_ref",
            "CAST(n_cur AS BIGINT) AS n_cur",
            f"CAST(_num div (CAST(n_ref + {_PSI_B} AS DECIMAL(38,0))"
            f" * (n_cur + {_PSI_B})) AS BIGINT) AS psi_micro",
        )
        .orderBy("label")
    )


def _dd_psi_lnm(x: str) -> str:
    return f"CAST(floor(ln(({x})::DOUBLE) * 1000000 + 0.5) AS BIGINT)"


_DD_PROTO_PSI = f"""
WITH flagged AS (
  SELECT label, vec_id, embedding,
         (('0x' || substr(md5('protopsi' || '§' || vec_id::VARCHAR), 1, 8))::BIGINT % 2) = 0 AS is_ref
  FROM embeddings
),
ex AS (
  SELECT label, pos, val FROM (
    SELECT label, unnest(range(1, len(embedding) + 1)) AS pos, unnest(embedding) AS val
    FROM flagged WHERE is_ref
  )
),
per AS (
  SELECT label, pos, round(sum(val::DOUBLE) / count(*), 4) + 0.0 AS v
  FROM ex GROUP BY 1, 2
),
protos AS (SELECT label, list(v ORDER BY pos) AS p FROM per GROUP BY label),
scored AS (
  SELECT f.label, f.is_ref::BIGINT AS is_ref,
         CAST(floor(list_sum(list_transform(range(1, len(pr.p) + 1),
              i -> (f.embedding[i]::DOUBLE - pr.p[i]) * (f.embedding[i]::DOUBLE - pr.p[i])))
              * 10000 + 0.5) AS BIGINT) AS d2q
  FROM flagged f JOIN protos pr ON f.label = pr.label
),
bounds AS (SELECT min(d2q) AS lo, max(d2q) AS hi FROM scored),
bucketed AS (
  SELECT label, is_ref,
         CAST(((d2q - lo) * {_PSI_B}) // (hi - lo + 1) AS INT) AS bucket
  FROM scored, bounds
),
counts AS (
  SELECT label, bucket, sum(is_ref)::BIGINT AS ca, sum(1 - is_ref)::BIGINT AS cb
  FROM bucketed GROUP BY 1, 2
),
grid AS (
  SELECT l.label, b.bucket,
         coalesce(c.ca, 0)::BIGINT + 1 AS ca1,
         coalesce(c.cb, 0)::BIGINT + 1 AS cb1
  FROM (SELECT DISTINCT label FROM counts) l
  CROSS JOIN (SELECT unnest(range(0, {_PSI_B})) AS bucket) b
  LEFT JOIN counts c ON c.label = l.label AND c.bucket = b.bucket
),
per_label AS (
  SELECT label, sum(ca)::BIGINT AS n_ref, sum(cb)::BIGINT AS n_cur
  FROM counts GROUP BY 1
),
terms AS (
  SELECT g.label, p.n_ref, p.n_cur,
         ca1::HUGEINT * (p.n_cur + {_PSI_B}) AS axb,
         cb1::HUGEINT * (p.n_ref + {_PSI_B}) AS bxa
  FROM grid g JOIN per_label p ON g.label = p.label
)
SELECT label, max(n_ref)::BIGINT AS n_ref, max(n_cur)::BIGINT AS n_cur,
       CAST(sum((axb - bxa) * ({_dd_psi_lnm('axb')} - {_dd_psi_lnm('bxa')}))
            // (max(n_ref)::HUGEINT + {_PSI_B}) // (max(n_cur) + {_PSI_B})
            AS BIGINT) AS psi_micro
FROM terms GROUP BY label
ORDER BY label
"""

_register("embed_prototype_psi", _embed_prototype_psi, _DD_PROTO_PSI)


# ==========================================================================
# Simplified silhouette (round 13, wave 2): the label-quality gauge the
# prototype family was missing — for every vector, a = distance to its
# OWN class prototype, b = distance to the NEAREST OTHER prototype,
# s = (b - a)/max(a, b) in [-1, 1]; per-label mean answers "is this
# class a coherent region or an annotation soup" (the centroid-based
# simplified silhouette — O(n L), not the O(n^2) pairwise original).
#
# Exactness: each distance is the family's ordered fold + sqrt
# (identical IEEE on both engines), quantized to micro BEFORE the
# ratio, so s_ppm = ((b - a) * 1e6) div max(a, b) is pure integer
# arithmetic (truncation agrees cross-engine, negative s included);
# floor-of-min == min-of-floors (monotone), so DuckDB may min first.
# The per-label mean is an integer sum div count.
#
# Scale shape: prototypes (|labels| x dim) collapse to ONE broadcast
# row (collect_list of structs); every vector computes its full
# distance profile inside a single codegen projection — transform/
# filter/array_min over the broadcast array, ZERO shuffle for scoring;
# the only exchange is the |labels|-bounded final groupBy.
# ==========================================================================

_SIL_DIST = (
    "sqrt(aggregate(zip_with(embedding, p.prototype,"
    " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)


def _embed_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import label_prototypes

    emb = _t(spark, sf_dir, "embeddings")
    parr = label_prototypes(emb).agg(
        F.collect_list(F.struct("label", "prototype")).alias("parr")
    )
    scored = emb.crossJoin(F.broadcast(parr)).select(
        "label",
        F.expr(
            f"transform(parr, p -> struct(p.label AS l, {_SIL_DIST} AS d))"
        ).alias("ds"),
    ).select(
        "label",
        F.expr(
            "CAST(floor(element_at(filter(ds, s -> s.l = label), 1).d"
            " * 1000000 + 0.5) AS BIGINT) AS a_micro"
        ),
        F.expr(
            "CAST(floor(array_min(transform(filter(ds, s -> s.l != label),"
            " s -> s.d)) * 1000000 + 0.5) AS BIGINT) AS b_micro"
        ),
    )
    return (
        scored.selectExpr(
            "label",
            "CASE WHEN greatest(a_micro, b_micro) = 0 THEN CAST(0 AS BIGINT)"
            " ELSE ((b_micro - a_micro) * 1000000) div greatest(a_micro, b_micro)"
            " END AS s_ppm",
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.expr("sum(s_ppm) div count(1)").alias("mean_silhouette_ppm"),
        )
        .selectExpr(
            "label",
            "CAST(n_members AS BIGINT) AS n_members",
            "CAST(mean_silhouette_ppm AS BIGINT) AS mean_silhouette_ppm",
        )
        .orderBy("label")
    )


_DD_PROTO_CTE = """
pex AS (
  SELECT label, unnest(range(1, len(embedding) + 1)) AS pos, unnest(embedding) AS val
  FROM embeddings
),
pper AS (
  SELECT label, pos, round(sum(val::DOUBLE) / count(*), 4) + 0.0 AS v
  FROM pex GROUP BY 1, 2
),
protos AS (SELECT label, list(v ORDER BY pos) AS p FROM pper GROUP BY label)
"""

_DD_SIL = f"""
WITH {_DD_PROTO_CTE},
scored AS (
  SELECT e.vec_id, e.label, pr.label AS pl,
         sqrt(list_sum(list_transform(range(1, len(pr.p) + 1),
           i -> (e.embedding[i]::DOUBLE - pr.p[i]) * (e.embedding[i]::DOUBLE - pr.p[i])))) AS d
  FROM embeddings e CROSS JOIN protos pr
),
ab AS (
  SELECT vec_id, label,
         CAST(floor(min(CASE WHEN pl = label THEN d END) * 1000000 + 0.5) AS BIGINT) AS a_micro,
         CAST(floor(min(CASE WHEN pl != label THEN d END) * 1000000 + 0.5) AS BIGINT) AS b_micro
  FROM scored GROUP BY 1, 2
),
s AS (
  SELECT label,
         CASE WHEN greatest(a_micro, b_micro) = 0 THEN 0
              ELSE ((b_micro - a_micro) * 1000000) // greatest(a_micro, b_micro)
         END AS s_ppm
  FROM ab
)
SELECT label, count(*)::BIGINT AS n_members,
       CAST(sum(s_ppm) // count(*) AS BIGINT) AS mean_silhouette_ppm
FROM s GROUP BY label ORDER BY label
"""

_register("embed_silhouette_labels", _embed_silhouette, _DD_SIL)


# ==========================================================================
# Davies-Bouldin confusability report (round 13, wave 2): silhouette's
# per-class companion from the other direction — for each class i,
# sigma_i = mean member distance to its prototype (tightness) and
# max_{j != i} (sigma_i + sigma_j) / d(c_i, c_j) (the worst-confusable
# neighbor ratio; the mean of these maxima is the classic DB index,
# left to the reader — per-class rows name WHICH class is the problem).
#
# Fully integer after quantization: member and centroid-pair distances
# floor to micro from the identical ordered-fold + sqrt doubles;
# sigma_micro = sum div n; ratios are ((sigma_i + sigma_j) * 1e6) div
# d_micro — exact rationals, argmax tiebroken to the LOWEST other
# label via a max-then-filter-min second pass (no order-dependent
# arg_max).  Coincident centroids (d_micro = 0) pin the ratio to the
# loud sentinel 1e12.
#
# Scale shape: one corpus pass for sigma (the silhouette projection's
# own-label distance, |labels|-bounded groupBy); everything pairwise
# runs on the |labels|^2 prototype grid — broadcast joins, no windows.
# ==========================================================================

_DB_SENTINEL = 1000000000000


def _embed_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import label_prototypes

    emb = _t(spark, sf_dir, "embeddings")
    protos = label_prototypes(emb).select("label", "prototype")
    # protos (|labels| rows, each a full corpus aggregation) feeds three
    # branches (parr / a / b) and sigma feeds two (si / sj) — as plain
    # branch copies the gated plan re-ran the corpus prototype pass per
    # branch (24 parquet scans, r13 opt); pin both bounded relations
    protos = protos.localCheckpoint(eager=False)
    parr = protos.agg(
        F.collect_list(F.struct("label", "prototype")).alias("parr")
    )
    sigma = (
        emb.crossJoin(F.broadcast(parr))
        .select(
            "label",
            F.expr(
                "CAST(floor(element_at(filter(transform(parr,"
                f" p -> struct(p.label AS l, {_SIL_DIST} AS d)),"
                " s -> s.l = label), 1).d * 1000000 + 0.5) AS BIGINT)"
                " AS a_micro"
            ),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.expr("sum(a_micro) div count(1)").alias("sigma_micro"),
        )
    )
    # one corpus tightness pass, reused by si and sj (r13 opt)
    sigma = sigma.localCheckpoint(eager=False)
    a = protos.select(F.col("label").alias("li"), F.col("prototype").alias("pi"))
    b = protos.select(F.col("label").alias("lj"), F.col("prototype").alias("pj"))
    pd_ = (
        a.join(F.broadcast(b), F.col("li") != F.col("lj"))
        .select(
            "li", "lj",
            F.expr(
                "CAST(floor(sqrt(aggregate(zip_with(pi, pj,"
                " (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE),"
                " (acc, v) -> acc + v)) * 1000000 + 0.5) AS BIGINT) AS d_micro"
            ),
        )
    )
    si = sigma.selectExpr("label AS li", "sigma_micro AS s_i", "n_members")
    sj = sigma.selectExpr("label AS lj", "sigma_micro AS s_j")
    ratios = (
        pd_.join(F.broadcast(si), "li")
        .join(F.broadcast(sj), "lj")
        .selectExpr(
            "li", "lj", "n_members", "s_i",
            f"CASE WHEN d_micro = 0 THEN CAST({_DB_SENTINEL} AS BIGINT)"
            " ELSE ((s_i + s_j) * 1000000) div d_micro END AS r_ppm",
        )
    )
    # the |labels|^2 ratio grid is read by worst AND the argmax filter
    # join — pin it so the pairwise-distance join runs once (r13 opt)
    ratios = ratios.localCheckpoint(eager=False)
    worst = ratios.groupBy("li").agg(
        F.max("n_members").alias("n_members"),
        F.max("s_i").alias("sigma_micro"),
        F.max("r_ppm").alias("worst_ratio_ppm"),
    )
    return (
        ratios.select("li", "lj", "r_ppm")
        .join(F.broadcast(worst), "li")
        .where("r_ppm = worst_ratio_ppm")
        .groupBy("li")
        .agg(
            F.max("n_members").alias("n_members"),
            F.max("sigma_micro").alias("sigma_micro"),
            F.max("worst_ratio_ppm").alias("worst_ratio_ppm"),
            F.min("lj").alias("worst_other_label"),
        )
        .selectExpr(
            "CAST(li AS INT) AS label",
            "CAST(n_members AS BIGINT) AS n_members",
            "CAST(sigma_micro AS BIGINT) AS sigma_micro",
            "CAST(worst_other_label AS INT) AS worst_other_label",
            "CAST(worst_ratio_ppm AS BIGINT) AS worst_ratio_ppm",
        )
        .orderBy("label")
    )


_DD_DB = f"""
WITH {_DD_PROTO_CTE},
am AS (
  SELECT e.vec_id, e.label,
         CAST(floor(sqrt(list_sum(list_transform(range(1, len(pr.p) + 1),
           i -> (e.embedding[i]::DOUBLE - pr.p[i]) * (e.embedding[i]::DOUBLE - pr.p[i]))))
           * 1000000 + 0.5) AS BIGINT) AS a_micro
  FROM embeddings e JOIN protos pr ON pr.label = e.label
),
sigma AS (
  SELECT label, count(*)::BIGINT AS n_members,
         CAST(sum(a_micro) // count(*) AS BIGINT) AS sigma_micro
  FROM am GROUP BY 1
),
pd AS (
  SELECT a.label AS li, b.label AS lj,
         CAST(floor(sqrt(list_sum(list_transform(range(1, len(a.p) + 1),
           i -> (a.p[i] - b.p[i]) * (a.p[i] - b.p[i])))) * 1000000 + 0.5) AS BIGINT) AS d_micro
  FROM protos a JOIN protos b ON a.label != b.label
),
ratios AS (
  SELECT pd.li, pd.lj, si.n_members, si.sigma_micro AS s_i,
         CASE WHEN pd.d_micro = 0 THEN CAST({_DB_SENTINEL} AS BIGINT)
              ELSE ((si.sigma_micro + sj.sigma_micro) * 1000000) // pd.d_micro
         END AS r_ppm
  FROM pd JOIN sigma si ON si.label = pd.li JOIN sigma sj ON sj.label = pd.lj
),
worst AS (
  SELECT li, max(n_members) AS n_members, max(s_i) AS sigma_micro,
         max(r_ppm) AS worst_ratio_ppm
  FROM ratios GROUP BY 1
)
SELECT CAST(r.li AS INT) AS label,
       CAST(w.n_members AS BIGINT) AS n_members,
       CAST(w.sigma_micro AS BIGINT) AS sigma_micro,
       CAST(min(r.lj) AS INT) AS worst_other_label,
       CAST(w.worst_ratio_ppm AS BIGINT) AS worst_ratio_ppm
FROM ratios r JOIN worst w ON w.li = r.li AND r.r_ppm = w.worst_ratio_ppm
GROUP BY r.li, w.n_members, w.sigma_micro, w.worst_ratio_ppm
ORDER BY label
"""

_register("embed_davies_bouldin", _embed_davies_bouldin, _DD_DB)
