# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, Window, _events, _register, _t  # noqa: F401
# Generic relational substrate (engine completeness over TPC-H-ish tables)
# ==========================================================================

def _agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


_register(
    "agg_pricing_summary",
    _agg_pricing_summary,
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)


def _topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


_register(
    "topk_orders_by_price",
    _topk_orders,
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
)


def _join_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # Fact table drives; dimensions broadcast (nation/region/customer are
    # tiny at every SF — at 100 TB, orders is the only large relation here).
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


_register(
    "join_revenue_per_nation",
    _join_revenue_per_nation,
    """
SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)


def _window_top_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


_register(
    "window_top_event_per_user",
    _window_top_event,
    """
SELECT user_id, event_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) = 1
""",
)


def _json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


_register(
    "json_extract_events",
    _json_extract,
    "SELECT event_id, json_extract_string(props, '$.k')::INT AS k_value FROM events",
)


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        ev.groupBy(hour.alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


_register(
    "events_hourly_rollup",
    _events_hourly,
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
)


# ==========================================================================


# ==========================================================================
# SCD2 change history (round 6) — the warehouse "type-2 slowly changing
# dimension" build: collapse an event log into per-key state-validity
# intervals (change rows -> [valid_from, valid_to), open current row).
# Pure partitioned lag/lead windows keyed by user — never a global sort.
# ==========================================================================

def _events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event_type state history for a deterministic user
    subset (% 499 == 7, ~80 events at sf0.01): rows where the state
    CHANGED, each with its validity interval and an is_current flag —
    the output shape a downstream dimension table loads directly."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") % 499 == 7)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("_prev", F.lag("event_type").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type")))
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return changes.withColumn("_to", F.lead("ts").over(wc)).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", fmt).alias("valid_from"),
        F.date_format("_to", fmt).alias("valid_to"),
        F.col("_to").isNull().alias("is_current"),
    )


_register(
    "events_scd2_state_history",
    _events_scd2_history,
    """
WITH ev AS (SELECT * FROM events WHERE user_id % 499 = 7),
changes AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM ev
  QUALIFY prev IS NULL OR prev != event_type
)
SELECT user_id, event_type AS state,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM changes
""",
)


# ==========================================================================
# SCD2 point-in-time join (round 12): the other half of the type-2
# dimension workflow — given the validity intervals the entry above
# builds, answer "what state was each user in WHEN they purchased".
# The warehouse-canonical PIT lookup (fact ts BETWEEN valid_from AND
# valid_to), which naively is a per-user interval join.
#
# The Spark derivation avoids the interval join entirely: state-change
# rows and purchase facts UNION into one per-user timeline, and two
# last(ignorenulls) carry windows (both reading the same deterministic
# (ts, event_id) order, so they pick the same carrying row — the
# last-touch precedent) attach the in-effect state and its valid_from
# to every purchase.  One shuffle, keyed by user; windows partitioned
# per user, never global.  The ORACLE is the naive interval join
# against the lead()-built intervals — derivation-independent, with
# the interval boundary spelled as the same lexicographic
# (ts, event_id) comparison the carry order implies.
# ==========================================================================


def _events_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ev = _events(spark, sf_dir).filter(F.col("user_id") % 499 == 7).select(
        "event_id", "user_id", "event_type", "ts"
    )
    st = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        st.withColumn("_prev", F.lag("event_type").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type")))
        .select(
            "user_id", "ts", "event_id",
            F.col("event_type").alias("_state"),
            F.date_format("ts", fmt).alias("_vf"),
            F.lit(0).alias("_kind"),
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("string").alias("_state"),
        F.lit(None).cast("string").alias("_vf"),
        F.lit(1).alias("_kind"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = changes.unionByName(purch).select(
        "*",
        F.last("_state", ignorenulls=True).over(wc).alias("_st_c"),
        F.last("_vf", ignorenulls=True).over(wc).alias("_vf_c"),
    )
    return (
        carried.filter(F.col("_kind") == 1)
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.coalesce("_st_c", F.lit("none")).alias("state"),
            F.col("_vf_c").alias("valid_from"),
        )
        .orderBy("p_id")
    )


_register(
    "events_scd2_pit_join",
    _events_scd2_pit,
    """
WITH ev AS (SELECT * FROM events WHERE user_id % 499 = 7),
st AS (SELECT user_id, event_type, ts, event_id FROM ev
       WHERE event_type != 'purchase'),
changes AS (
  SELECT user_id, event_type AS state, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM st
  QUALIFY prev IS NULL OR prev != event_type
),
iv AS (
  SELECT user_id, state, ts AS vf, event_id AS vf_id,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt,
         lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt_id
  FROM changes
),
p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM ev
      WHERE event_type = 'purchase')
SELECT p.p_id, p.user_id, coalesce(iv.state, 'none') AS state,
       strftime(iv.vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from
FROM p LEFT JOIN iv
  ON iv.user_id = p.user_id
 AND (iv.vf < p.p_ts OR (iv.vf = p.p_ts AND iv.vf_id < p.p_id))
 AND (iv.vt IS NULL OR iv.vt > p.p_ts OR (iv.vt = p.p_ts AND iv.vt_id > p.p_id))
ORDER BY p.p_id
""",
)
