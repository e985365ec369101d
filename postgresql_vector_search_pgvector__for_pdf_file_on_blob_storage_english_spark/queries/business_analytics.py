# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    _DD_NORMALIZE,
    _events,
    _register,
    _t,
    dd_sql,
)
from .dedup import (  # noqa: F401
    STOPWORDS_EN,
    _DD_NEARDUP_CORPUS,
    _neardup_corpus,
    exact_dedup,
    quality_score,
)
from .textstats import _dd_marker_hits  # noqa: F401
# Relational completeness (SURVEY.md §2.5's "absent" categories, provided
# anyway as engine substrate): set operations, semi/anti joins, rollup,
# running windows, exact percentiles, sessionization.
# ==========================================================================

def _setop_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).select("event_type").distinct()


_register(
    "setop_distinct_event_types",
    _setop_distinct,
    "SELECT DISTINCT event_type FROM events",
)


def _setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


_register(
    "setop_intersect_active_customers",
    _setop_intersect,
    """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""",
)


def _setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # restrict to high-value orders so the difference is non-empty
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.exceptAll(big.distinct())


_register(
    "setop_except_customers_no_big_orders",
    _setop_except,
    """
SELECT c_custkey FROM customer
EXCEPT ALL
SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000
""",
)


def _join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_register(
    "join_semi_big_spenders",
    _join_semi,
    """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)


def _join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_register(
    "join_anti_customers_no_big_orders",
    _join_anti,
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)


def _agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


_register(
    "agg_rollup_lineitem",
    _agg_rollup,
    """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)


def _window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_revenue"),
    )


_register(
    "window_running_revenue",
    _window_running,
    """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue
FROM orders WHERE o_custkey < 200
""",
)


def _percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


_register(
    "agg_exact_percentiles",
    _percentiles,
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderpriority
""",
)


def _monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series reporting shape: monthly revenue with month-over-month
    percent change (lag window over the MONTH-sized relation) — the
    first chart of any revenue dashboard."""
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("_m")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("_m")
    return (
        monthly.withColumn("_prev", F.lag("revenue").over(w))
        .select(
            F.date_format("_m", "yyyy-MM").alias("month"),
            "revenue",
            F.round((F.col("revenue") - F.col("_prev")) / F.col("_prev") * 100.0, 4).alias(
                "mom_pct"
            ),
        )
    )


_register(
    "orders_monthly_revenue_trend",
    _monthly_revenue_trend,
    """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mth, round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT strftime(mth, '%Y-%m') AS month, revenue,
       round((revenue - lag(revenue) OVER (ORDER BY mth))
             / lag(revenue) OVER (ORDER BY mth) * 100.0, 4) AS mom_pct
FROM m
""",
)


def _rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal cohort comparison: monetary-tier MIGRATION between the
    first and second halves of the order history (split at the fixed
    midpoint 1998-07-01) — how many customers moved up, held, or
    dropped a spend tier, the report behind churn and upsell programs.
    Tiers are deterministic ntile(3) cuts within each period; customers
    absent from a period appear as tier 0.  Scale shape (VERDICT r5 #1):
    the tier cut runs on the two-pass :func:`global_rank` — range
    repartition + partitioned window — never a single-partition sort;
    spend is quantized to integer cents before ranking so both engines
    rank identical bits (ADVICE r5)."""
    from ..operators.ranking import global_rank, ntile_from_rank

    orders = _t(spark, sf_dir, "orders")
    mid = F.lit("1998-07-01").cast("timestamp")

    def tiers(df, alias):
        per = df.groupBy("o_custkey").agg(
            F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("_cents")
        )
        ranked = global_rank(
            per, [F.col("_cents").desc(), F.col("o_custkey").asc()]
        )
        return ranked.select(
            "o_custkey",
            ntile_from_rank(F.col("_rank"), F.col("_n"), 3).cast("int").alias(alias),
        )

    early = tiers(orders.filter(F.col("o_orderdate") < mid), "tier_before")
    late = tiers(orders.filter(F.col("o_orderdate") >= mid), "tier_after")
    joined = early.join(late, "o_custkey", "full_outer").select(
        F.coalesce("tier_before", F.lit(0)).alias("tier_before"),
        F.coalesce("tier_after", F.lit(0)).alias("tier_after"),
    )
    return joined.groupBy("tier_before", "tier_after").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_register(
    "orders_rfm_tier_migration",
    _rfm_migration,
    """
WITH ep AS (
  SELECT o_custkey, CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-07-01' GROUP BY o_custkey
),
lp AS (
  SELECT o_custkey, CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-07-01' GROUP BY o_custkey
),
early AS (
  SELECT o_custkey, ntile(3) OVER (ORDER BY cents DESC, o_custkey ASC) AS tier_before
  FROM ep
),
late AS (
  SELECT o_custkey, ntile(3) OVER (ORDER BY cents DESC, o_custkey ASC) AS tier_after
  FROM lp
)
SELECT coalesce(e.tier_before, 0) AS tier_before,
       coalesce(l.tier_after, 0) AS tier_after,
       count(*) AS n_customers
FROM early e FULL OUTER JOIN late l ON e.o_custkey = l.o_custkey
GROUP BY 1, 2
""",
)


def _revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine forecasting, honestly scoped: OLS linear trend over the
    monthly revenue series (closed form from sufficient statistics, the
    ``stats_linreg`` machinery over month index) plus the next-month
    projection — the "are we growing and by how much" one-liner.  Month
    index = months since the first month, an exact integer both engines
    derive identically."""
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("_m")
    ).agg(F.sum("o_totalprice").alias("_rev"))
    first = monthly.agg(F.min("_m").alias("_m0"))
    idx = monthly.crossJoin(F.broadcast(first)).select(
        (F.months_between(F.col("_m"), F.col("_m0"))).cast("long").alias("x"),
        F.col("_rev").alias("y"),
    )
    s = idx.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("double")).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("double") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        F.col("n").cast("long").alias("n_months"),
        F.round(slope, 2).alias("monthly_slope"),
        F.round(intercept, 2).alias("intercept"),
        F.round(intercept + slope * F.col("n"), 2).alias("next_month_forecast"),
    )


_register(
    "orders_revenue_trend_forecast",
    _revenue_forecast,
    """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mth, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
),
f AS (SELECT min(mth) AS m0 FROM m),
idx AS (
  SELECT CAST(date_diff('month', f.m0, m.mth) AS BIGINT) AS x, m.rev AS y FROM m, f
),
s AS (
  SELECT count(*)::DOUBLE AS n, sum(x::DOUBLE) AS sx, sum(y) AS sy,
         sum(x::DOUBLE * y) AS sxy, sum(x::DOUBLE * x::DOUBLE) AS sxx
  FROM idx
)
SELECT n::BIGINT AS n_months,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 2) AS monthly_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 2) AS intercept,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             + ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * n, 2) AS next_month_forecast
FROM s
""",
)


def _dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-source attribution: which sources contribute the
    duplicate copies — per source, docs whose normalized text also
    appears under a LOWER doc_id anywhere in the corpus (the non-
    survivors of exact dedup), as count and rate.  The fixture weave
    plants cross-source copies, so rates are non-vacuous."""
    docs = _neardup_corpus(spark, sf_dir)
    from ..operators.dedup import exact_dedup

    surv_ids = exact_dedup(docs).select("doc_id")
    dup_flag = docs.join(
        surv_ids.withColumn("_keep", F.lit(1)), "doc_id", "left"
    ).withColumn("_is_dup", F.col("_keep").isNull().cast("double"))
    return dup_flag.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("_is_dup").cast("long")).alias("n_dup_copies"),
        F.round(F.avg("_is_dup"), 4).alias("dup_rate"),
    )


_register(
    "dedup_rate_by_lang",
    _dup_rate_by_source,
    dd_sql("""
WITH corpus AS ({corpus}),
surv AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (PARTITION BY md5({norm}) ORDER BY doc_id) AS rn
    FROM corpus
  ) WHERE rn = 1
)
SELECT c.lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN s.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_copies,
       round(avg(CASE WHEN s.doc_id IS NULL THEN 1.0 ELSE 0.0 END), 4) AS dup_rate
FROM corpus c LEFT JOIN surv s ON c.doc_id = s.doc_id
GROUP BY c.lang
""", corpus=_DD_NEARDUP_CORPUS, norm=dd_sql(_DD_NORMALIZE, col="text")),
)


def _interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifecycle timing: the distribution of days between a
    customer's consecutive orders — one lag window per customer, then
    exact percentiles over the gap relation.  The metric behind
    replenishment-cycle and churn-horizon decisions."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn("_prev", F.lag("o_orderdate").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(F.datediff("o_orderdate", "_prev").alias("gap_days"))
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_days"), 4).alias("avg_gap"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 4).alias("p50_gap"),
        F.round(F.expr("percentile(gap_days, 0.9)"), 4).alias("p90_gap"),
        F.max("gap_days").alias("max_gap"),
    )


_register(
    "orders_interpurchase_gaps",
    _interpurchase_gaps,
    """
WITH g AS (
  SELECT date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT count(*) AS n_gaps,
       round(avg(gap_days), 4) AS avg_gap,
       round(quantile_cont(gap_days, 0.5), 4) AS p50_gap,
       round(quantile_cont(gap_days, 0.9), 4) AS p90_gap,
       max(gap_days) AS max_gap
FROM g WHERE gap_days IS NOT NULL
""",
)


def _char_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram Shannon entropy per document — the
    compressibility signal some corpus filters use (gibberish and
    boilerplate sit at the entropy extremes).  Explode each text's
    bigrams via a sequence projection, count per (doc, bigram), entropy
    from the count distribution — two keyed aggregates, no UDF; emitted
    with a corpus summary ordering so the gate stays small (top-20
    lowest-entropy docs)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - 1),
                lambda i: t.substr(i, F.lit(2)),
            )
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("_c"))
    tot = Window.partitionBy("doc_id")
    probs = counts.withColumn("_p", F.col("_c") / F.sum("_c").over(tot))
    per_doc = probs.groupBy("doc_id").agg(
        F.sum("_c").alias("_n"),
        F.round(-F.sum(F.col("_p") * F.log2("_p")), 4).alias("entropy_bits"),
    )
    return (
        per_doc.orderBy(F.col("entropy_bits").asc(), "doc_id")
        .limit(20)
        .select("doc_id", F.col("_n").alias("n_bigrams"), "entropy_bits")
    )


_register(
    "text_char_bigram_entropy",
    _char_bigram_entropy,
    """
WITH bg AS (
  SELECT doc_id, substr(text, i, 2) AS bg
  FROM documents, unnest(range(1, length(text))) AS t(i)
),
counts AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
probs AS (
  SELECT doc_id, c, c::DOUBLE / sum(c) OVER (PARTITION BY doc_id) AS p FROM counts
),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, round(-sum(p * log2(p)), 4) AS entropy_bits
  FROM probs GROUP BY doc_id
)
SELECT doc_id, n AS n_bigrams, entropy_bits
FROM per ORDER BY entropy_bits, doc_id LIMIT 20
""",
)


def _pareto_abc_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC revenue-concentration analysis: customers ranked by
    spend, classified A/B/C at cumulative-share breakpoints (80% / 95%)
    computed with the two-pass exclusive prefix sum of
    :func:`global_rank` — range repartition + partitioned window, never
    a single-partition sort (VERDICT r5 #1); output is the class report
    (sizes, revenue share) that answers "how concentrated is revenue".
    Class assignment uses the EXCLUSIVE prefix (share before the
    customer), so the first customer crossing a breakpoint still
    belongs to the class it completes.  Revenue is quantized to integer
    cents so prefix sums are exact longs — identical in any summation
    order and in both oracle engines (ADVICE r5)."""
    from ..operators.ranking import global_rank

    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("_cents")
    )
    total = per.agg(F.sum("_cents").alias("_totc"))
    classed = (
        global_rank(
            per,
            [F.col("_cents").desc(), F.col("o_custkey").asc()],
            prefix_col="_cents",
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "abc",
            F.when(F.col("_before") / F.col("_totc") < 0.80, "A")
            .when(F.col("_before") / F.col("_totc") < 0.95, "B")
            .otherwise("C"),
        )
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("_cents") / F.max("_totc"), 4).alias("revenue_share"),
    )


_register(
    "pareto_abc_customers",
    _pareto_abc_customers,
    """
WITH per AS (
  SELECT o_custkey, CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS totc FROM per),
c AS (
  SELECT o_custkey, cents,
         CAST(coalesce(sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before
  FROM per
)
SELECT CASE WHEN CAST(before AS DOUBLE) / totc < 0.80 THEN 'A'
            WHEN CAST(before AS DOUBLE) / totc < 0.95 THEN 'B'
            ELSE 'C' END AS abc,
       count(*) AS n_customers,
       round(CAST(sum(cents) AS DOUBLE) / max(t.totc), 4) AS revenue_share
FROM c, t GROUP BY 1
""",
)


def _basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: brand co-occurrence within
    orders with support and lift — the top-10 brand pairs most
    over-represented in the same basket.  The pair join is keyed on
    l_orderkey (baskets are a handful of lines, so fan-out is bounded
    per order, never corpus-quadratic); brand totals broadcast back for
    the lift denominator."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    # lift denominator as an in-plan broadcast 1-row aggregate (VERDICT
    # r5 #5) — one job, not an eager count() plus a second distinct
    n_orders = ob.agg(
        F.count_distinct("l_orderkey").cast("double").alias("_n_orders")
    )
    brand_n = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("_nb"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.p_brand") < F.col("b.p_brand")))
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = brand_n.select(F.col("p_brand").alias("brand_a"), F.col("_nb").alias("_na"))
    nb = brand_n.select(F.col("p_brand").alias("brand_b"), F.col("_nb").alias("_nb2"))
    lift = (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .withColumn(
            "lift",
            (F.col("n_both") * F.col("_n_orders"))
            / (F.col("_na") * F.col("_nb2")),
        )
    )
    return (
        lift.orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(10)
        .select("brand_a", "brand_b", "n_both", F.round("lift", 4).alias("lift"))
    )


_register(
    "basket_brand_lift",
    _basket_brand_lift,
    """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT count(DISTINCT l_orderkey)::DOUBLE AS n_orders FROM ob),
bn AS (SELECT p_brand, count(*) AS nb FROM ob GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_both
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, n_both,
       round(n_both * n.n_orders / (na.nb * nb2.nb), 4) AS lift
FROM pairs, n
JOIN bn na ON na.p_brand = brand_a
JOIN bn nb2 ON nb2.p_brand = brand_b
ORDER BY n_both * n.n_orders / (na.nb * nb2.nb) DESC, brand_a, brand_b
LIMIT 10
""",
)


def _rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing cube: per
    customer recency (days since last order, against the corpus's max
    date), frequency (order count), monetary (total spend), each cut
    into ntile(3) scores with (metric, custkey) tiebreaks so the
    equal-frequency buckets are deterministic cross-engine; output is
    the segment cube with sizes and average spend.  Scale shape
    (VERDICT r5 #1): one per-customer aggregate, then three two-pass
    :func:`global_rank` cuts over the CUSTOMER relation — range
    repartition + partitioned window each, never a single-partition
    sort; spend is quantized to integer cents before ranking and
    averaging so both oracle engines see identical bits (ADVICE r5)."""
    from ..operators.ranking import global_rank, ntile_from_rank

    orders = _t(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("_maxd"))
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .withColumn("recency_days", F.datediff("_maxd", "_last"))
    )

    def score(df, sort_cols, alias):
        ranked = global_rank(df, sort_cols)
        return ranked.withColumn(
            alias, ntile_from_rank(F.col("_rank"), F.col("_n"), 3).cast("int")
        ).drop("_rank", "_n")

    scored = score(
        per, [F.col("recency_days").asc(), F.col("o_custkey").asc()], "r_score"
    )
    scored = score(
        scored, [F.col("frequency").desc(), F.col("o_custkey").asc()], "f_score"
    )
    scored = score(
        scored, [F.col("_cents").desc(), F.col("o_custkey").asc()], "m_score"
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("_cents") / (F.lit(100.0) * F.count(F.lit(1))), 2).alias(
            "avg_spend"
        ),
    )


_register(
    "orders_rfm_segmentation",
    _rfm_segmentation,
    """
WITH maxd AS (SELECT max(o_orderdate) AS md FROM orders),
per AS (
  SELECT o_custkey, date_diff('day', max(o_orderdate), (SELECT md FROM maxd)) AS recency_days,
         count(*) AS frequency,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey,
         ntile(3) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
         ntile(3) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
         ntile(3) OVER (ORDER BY cents DESC, o_custkey ASC) AS m_score,
         cents
  FROM per
)
SELECT r_score, f_score, m_score, count(*) AS n_customers,
       round(CAST(sum(cents) AS DOUBLE) / (100.0 * count(*)), 2) AS avg_spend
FROM scored GROUP BY 1, 2, 3
""",
)


def _events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scores over the hourly event rate: each
    hour's count z-scored against the previous 24 hours (exclusive).
    The global ordered window runs over the AGGREGATED hourly relation
    — cardinality = hours, not events — so the single-partition frame
    is bounded at any corpus scale; std=0 windows yield NULL z
    (nullif), not infinities."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.orderBy(F.col("h").cast("long"))
        .rangeBetween(-24 * 3600, -3600)
    )
    scored = hourly.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n_events",
        F.round(F.avg("n_events").over(w), 4).alias("trail_avg"),
        F.round(F.stddev("n_events").over(w), 4).alias("trail_std"),
    )
    return scored.withColumn(
        "z",
        F.round(
            (F.col("n_events") - F.col("trail_avg"))
            / F.nullif(F.col("trail_std"), F.lit(0.0)),
            4,
        ),
    )


_register(
    "events_hourly_anomaly",
    _events_hourly_anomaly,
    """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n_events FROM events GROUP BY 1
),
scored AS (
  SELECT h, n_events,
         round(avg(n_events) OVER w, 4) AS trail_avg,
         round(stddev(n_events) OVER w, 4) AS trail_std
  FROM hourly
  WINDOW w AS (ORDER BY h RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                                    AND INTERVAL 1 HOUR PRECEDING)
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, n_events, trail_avg, trail_std,
       round((n_events - trail_avg) / nullif(trail_std, 0.0), 4) AS z
FROM scored
""",
)


def _events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / stickiness — the engagement headline over the events
    table: distinct daily actives averaged per ISO week against that
    week's distinct actives; stickiness = avg(DAU)/WAU."""
    ev = _events(spark, sf_dir)
    days = ev.select(
        F.date_trunc("week", F.col("ts")).alias("_wk"),
        F.to_date("ts").alias("_day"),
        "user_id",
    )
    dau = days.groupBy("_wk", "_day").agg(
        F.count_distinct("user_id").alias("_dau")
    )
    wau = days.groupBy("_wk").agg(F.count_distinct("user_id").alias("wau"))
    avg_dau = dau.groupBy("_wk").agg(F.round(F.avg("_dau"), 4).alias("avg_dau"))
    return (
        avg_dau.join(wau, "_wk")
        .select(
            F.date_format("_wk", "yyyy-MM-dd").alias("week"),
            "avg_dau",
            "wau",
            F.round(F.col("avg_dau") / F.col("wau"), 4).alias("stickiness"),
        )
    )


_register(
    "events_dau_stickiness",
    _events_dau_stickiness,
    """
WITH d AS (
  SELECT date_trunc('week', ts) AS wk, CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (SELECT wk, day, count(DISTINCT user_id) AS dau FROM d GROUP BY wk, day),
wau AS (SELECT wk, count(DISTINCT user_id) AS wau FROM d GROUP BY wk),
a AS (SELECT wk, round(avg(dau), 4) AS avg_dau FROM dau GROUP BY wk)
SELECT strftime(a.wk, '%Y-%m-%d') AS week, a.avg_dau, w.wau,
       round(a.avg_dau / w.wau, 4) AS stickiness
FROM a JOIN wau w ON a.wk = w.wk
""",
)


def _map_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: ``from_json`` into ``map<string,int>``,
    ``explode`` of the map to key/value rows, per-key aggregates —
    the map-column path the relational substrate hadn't exercised
    (props is the events table's JSON payload)."""
    ev = _events(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,int>")
    ex = ev.select(F.explode(m).alias("k", "v"))
    return ex.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.round(F.avg("v"), 4).alias("avg_v"),
    )


_register(
    "map_function_breadth",
    _map_function_breadth,
    """
SELECT 'k' AS k, count(*) AS n,
       min(CAST(props::JSON ->> 'k' AS INT)) AS min_v,
       max(CAST(props::JSON ->> 'k' AS INT)) AS max_v,
       round(avg(CAST(props::JSON ->> 'k' AS INT)), 4) AS avg_v
FROM events
WHERE props::JSON ->> 'k' IS NOT NULL
""",
)


def _winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier capping to exact [p1, p99]) — the standard
    numeric-feature cleaning stage before training: one exact-percentile
    aggregate broadcast back as a 1-row join, then a pure codegen clip.
    Output is the before/after evidence a pipeline logs: clipped
    min/max/mean vs raw mean and how many rows the cap touched."""
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.expr("percentile(value, 0.01)").alias("_p1"),
        F.expr("percentile(value, 0.99)").alias("_p99"),
    )
    v = F.least(F.greatest(F.col("value"), F.col("_p1")), F.col("_p99"))
    return ev.crossJoin(F.broadcast(bounds)).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(v), 4).alias("clipped_min"),
        F.round(F.max(v), 4).alias("clipped_max"),
        F.round(F.avg(v), 4).alias("clipped_mean"),
        F.round(F.avg("value"), 4).alias("raw_mean"),
        F.sum(
            ((F.col("value") < F.col("_p1")) | (F.col("value") > F.col("_p99"))).cast("long")
        ).alias("n_clipped"),
    )


_register(
    "events_value_winsorized",
    _winsorize_values,
    """
WITH b AS (
  SELECT quantile_cont(value, 0.01) AS p1, quantile_cont(value, 0.99) AS p99 FROM events
)
SELECT count(*) AS n,
       round(min(least(greatest(value, p1), p99)), 4) AS clipped_min,
       round(max(least(greatest(value, p1), p99)), 4) AS clipped_max,
       round(avg(least(greatest(value, p1), p99)), 4) AS clipped_mean,
       round(avg(value), 4) AS raw_mean,
       CAST(sum(CASE WHEN value < p1 OR value > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM events, b
""",
)


def _sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (functions/text.py::
    sliding_chunks_col) — the modern RAG splitter next to the
    reference's punctuation-aware port: 400-char windows every 300
    chars, consecutive chunks sharing 100.  Emitted as per-chunk
    (index, length, md5) so the oracle compares content without
    shipping full text through the hash gate."""
    from ..functions.text import sliding_chunks_col

    docs = _t(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(sliding_chunks_col("text", size=400, overlap=100)).alias("c")
    )
    return ex.select(
        "doc_id",
        F.col("c.chunk_index").alias("chunk_index"),
        F.length("c.chunk").alias("chunk_len"),
        F.md5("c.chunk").alias("chunk_md5"),
    )


_register(
    "p3_sliding_window_chunks",
    _sliding_chunks,
    """
WITH w AS (
  SELECT doc_id, text,
         unnest(range(0, 1 + CAST(ceil(greatest(length(text) - 400, 0) / 300.0) AS INT))) AS i
  FROM documents
)
SELECT doc_id, i::INT AS chunk_index,
       length(substr(text, i * 300 + 1, 400)) AS chunk_len,
       md5(substr(text, i * 300 + 1, 400)) AS chunk_md5
FROM w
""",
)


def _skew_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: per-key concentration of orders on
    o_custkey — total keys, max key share, and the Herfindahl index
    (sum of squared key shares; 1/n_keys = uniform, 1.0 = one key) —
    the numbers that decide whether a join needs salting
    (operators/skew.py) before it hits a 1000-executor shuffle."""
    orders = _t(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("_n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_n").alias("n_rows"),
        F.max("_n").alias("max_key_rows"),
        F.round(F.max("_n") / F.sum("_n"), 6).alias("max_key_share"),
        F.round(
            F.sum(F.col("_n") * F.col("_n")) / (F.sum("_n") * F.sum("_n")), 6
        ).alias("herfindahl"),
    )


_register(
    "skew_report_orders",
    _skew_report_orders,
    """
WITH per_key AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows, max(n) AS max_key_rows,
       round(max(n) / sum(n)::DOUBLE, 6) AS max_key_share,
       round(sum(n * n) / (sum(n)::DOUBLE * sum(n)), 6) AS herfindahl
FROM per_key
""",
)


def _quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality dashboard: the aggregate view of the quality
    scorer a pipeline reads before setting mixture rates — doc counts,
    mean quality, mean stopword/symbol ratios, and the share of docs
    under a 0.5 quality floor, per source."""
    docs = _t(spark, sf_dir, "documents")
    q = quality_score(docs, keep_cols=("source",))
    return q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword_ratio"),
        F.round(F.avg("symbol_ratio"), 4).alias("avg_symbol_ratio"),
        F.round(F.avg((F.col("quality") < 0.5).cast("double")), 4).alias("frac_low_quality"),
    )


_register(
    "text_quality_by_source",
    _quality_by_source,
    f"""
WITH n AS (
  SELECT doc_id, source, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents
),
f AS (
  SELECT doc_id, source,
         length(norm) AS n_chars,
         len(string_split(trim(norm), ' ')) AS n_words,
         ({_dd_marker_hits("(' ' || norm || ' ')", STOPWORDS_EN)}) AS stop_hits,
         length(regexp_replace(norm, '[A-Za-z0-9 ]', '', 'g')) AS n_sym
  FROM n
),
r AS (
  SELECT doc_id, source,
         round(stop_hits::DOUBLE / n_words, 4) AS stopword_ratio,
         round(n_sym::DOUBLE / n_chars, 4) AS symbol_ratio,
         round(least(n_words / 100.0, 1.0) * 0.4
               + least(stop_hits::DOUBLE / n_words * 5.0, 1.0) * 0.3
               + (1.0 - least(n_sym::DOUBLE / n_chars * 10.0, 1.0)) * 0.3, 4) AS quality
  FROM f
)
SELECT source, count(*) AS n_docs,
       round(avg(quality), 4) AS avg_quality,
       round(avg(stopword_ratio), 4) AS avg_stopword_ratio,
       round(avg(symbol_ratio), 4) AS avg_symbol_ratio,
       round(avg(CASE WHEN quality < 0.5 THEN 1.0 ELSE 0.0 END), 4) AS frac_low_quality
FROM r GROUP BY source
""",
)


def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization — lag + cumulative sum of boundary
    flags, the standard shuffle-once pattern (one window partition per
    user; no per-event Python)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn("_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = flagged.withColumn("session_id", F.sum("_new").over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


_register(
    "sessionize_events_30m",
    _sessionize,
    """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sess GROUP BY user_id, session_id
""",
)


def _sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE session-window operator (``F.session_window`` — the
    same code path Structured Streaming uses for stateful session
    aggregation), as a second sessionization semantics next to the
    lag+cumsum entry.  Boundary note the oracle must replicate: Spark
    merges events whose 30-min windows OVERLAP, i.e. a new session
    starts at gap >= 30 min at FULL microsecond precision — whereas
    ``sessionize_events_30m`` flags at gap > 1800 over second-truncated
    epochs; the two disagree for true gaps in [1800 s, 1801 s)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


_register(
    "sessionize_native_gap",
    _sessionize_native,
    """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         sum(_new) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid
""",
)


# ==========================================================================


# --------------------------------------------------------------------------
# Item-item collaborative filtering (round 8, session 2): cosine
# similarity over order co-occurrence — the classic Amazon-style
# "customers who bought X also bought Y" recommender (Linden et al.
# 2003, public method), next to basket_brand_lift's category-level
# association.  cos(u,v) = c_uv / sqrt(c_u * c_v) on EXACT integer
# counts: sqrt and one division of identical integers are correctly-
# rounded IEEE ops, so the ranking is bit-deterministic cross-engine
# with no quantization tricks.  Scale shape: the co-count self-join is
# keyed on the order id (fan-out quadratic only in per-order item
# count), counts are map-side-partial groupBys, and the final rank is
# one window keyed on the item — never a global sort.
# --------------------------------------------------------------------------

_II_TOP = 3
_II_MIN_CO = 2
_II_ITEM_CAP = 200  # report slice: items with partkey < cap


def _item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # baskets feed the co-count self-join (twice) and the degree count;
    # checkpoint so the distinct runs once (the branch-copy lesson).
    baskets = li.distinct().localCheckpoint(eager=False)
    a = baskets.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("u"))
    b = baskets.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("v"))
    co = (
        a.join(b, "_o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c_uv"))
        .filter(F.col("c_uv") >= _II_MIN_CO)
    )
    sym = co.unionAll(
        co.select(F.col("v").alias("u"), F.col("u").alias("v"), "c_uv")
    )
    deg = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    du = deg.select(F.col("l_partkey").alias("u"), F.col("c").alias("c_u"))
    dv = deg.select(F.col("l_partkey").alias("v"), F.col("c").alias("c_v"))
    scored = (
        sym.join(du, "u")
        .join(dv, "v")
        .withColumn(
            "_cos",
            F.col("c_uv").cast("double")
            / F.sqrt((F.col("c_u") * F.col("c_v")).cast("double")),
        )
    )
    w = Window.partitionBy("u").orderBy(F.col("_cos").desc(), "v")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= _II_TOP) & (F.col("u") < _II_ITEM_CAP))
        .select(
            F.col("u").alias("item"),
            "rank",
            F.col("v").alias("neighbor"),
            "c_uv",
            "c_u",
            "c_v",
            F.round("_cos", 4).alias("cosine"),
        )
    )


_register(
    "recsys_item_item_cosine",
    _item_item_cosine,
    f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
co AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*)::BIGINT AS c_uv
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {_II_MIN_CO}
),
sym AS (SELECT u, v, c_uv FROM co UNION ALL SELECT v, u, c_uv FROM co),
deg AS (SELECT l_partkey, count(*)::BIGINT AS c FROM baskets GROUP BY 1),
scored AS (
  SELECT sym.u, sym.v, sym.c_uv, du.c AS c_u, dv.c AS c_v,
         sym.c_uv::DOUBLE / sqrt((du.c * dv.c)::DOUBLE) AS _cos
  FROM sym JOIN deg du ON du.l_partkey = sym.u JOIN deg dv ON dv.l_partkey = sym.v
)
SELECT u AS item,
       row_number() OVER (PARTITION BY u ORDER BY _cos DESC, v) AS rank,
       v AS neighbor, c_uv, c_u, c_v, round(_cos, 4) AS cosine
FROM scored
QUALIFY rank <= {_II_TOP} AND u < {_II_ITEM_CAP}
""",
)


# ==========================================================================
# Winsorized robust statistics (round 10) — operators/ranking.py::
# winsorize.  Clamp order prices to each priority class's exact
# [p5, p95] (rank-based percentile_disc cutoffs in integer ppm), then
# report the robust aggregate a metrics pipeline would trust.  The
# cumulative window runs over the (group, distinct cents) relation a
# partial-agg groupBy already reduced the fact table to — the
# monitoring-family boundedness argument, but group-partitioned.
# ==========================================================================


def _winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import winsorize

    orders = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    clamped = winsorize(
        orders, "o_totalprice", group_col="o_orderpriority",
        lo_ppm=50_000, hi_ppm=950_000, scale=100,
    )
    return (
        clamped.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice_wins").alias("sum_wins_cents"),
            F.min("o_totalprice_wins").alias("lo_cents"),
            F.max("o_totalprice_wins").alias("hi_cents"),
        )
        .orderBy("o_orderpriority")
    )


_DD_WINSOR = """
WITH s AS (
  SELECT o_orderpriority AS g,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders
),
vc AS (SELECT g, v, count(*) AS c FROM s GROUP BY 1, 2),
cum AS (
  SELECT g, v, c,
         sum(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
  FROM vc
),
tot AS (SELECT g, sum(c) AS n FROM vc GROUP BY 1),
cut AS (
  SELECT cum.g,
         min(CASE WHEN cm >= (n * 50000 + 999999) // 1000000 THEN v END) AS lo,
         min(CASE WHEN cm >= (n * 950000 + 999999) // 1000000 THEN v END) AS hi
  FROM cum JOIN tot ON cum.g = tot.g
  GROUP BY cum.g
),
clamped AS (
  SELECT s.g, greatest(least(s.v, cut.hi), cut.lo) AS w
  FROM s JOIN cut ON s.g = cut.g
)
SELECT g AS o_orderpriority, count(*)::BIGINT AS n,
       CAST(sum(w) AS BIGINT) AS sum_wins_cents,
       CAST(min(w) AS BIGINT) AS lo_cents, CAST(max(w) AS BIGINT) AS hi_cents
FROM clamped GROUP BY g ORDER BY g
"""

_register("orders_winsorized_price_stats", _winsorized_price_stats, _DD_WINSOR)


# ==========================================================================
# Daily activity streaks (round 10) — operators/nonparam.py::
# daily_streaks.  The gaps-and-islands primitive: per-user runs of
# consecutive active days (the "7-day streak" engagement metric), top
# 20 users by longest run.  Every window is partitioned by user_id;
# the per-user relation is distinct active DAYS, calendar-bounded.
# ==========================================================================


def _events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by longest consecutive-day activity streak, with
    total active days, number of islands, and the start (epoch day)
    of the earliest longest streak."""
    from ..operators.nonparam import daily_streaks

    runs = daily_streaks(_events(spark, sf_dir), "user_id", "ts")
    per_user = runs.groupBy("user_id").agg(
        F.sum("streak_len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_len").alias("longest_streak"),
    )
    start = (
        runs.join(
            F.broadcast(per_user.select("user_id", "longest_streak")), "user_id"
        )
        .filter(F.col("streak_len") == F.col("longest_streak"))
        .groupBy("user_id")
        .agg(F.min("start_epochday").alias("longest_start_epochday"))
    )
    return (
        per_user.join(start, "user_id")
        .orderBy(F.col("longest_streak").desc(), "user_id")
        .limit(20)
        .select(
            "user_id", "n_active_days", "n_streaks",
            "longest_streak", "longest_start_epochday",
        )
    )


_register(
    "events_activity_streaks",
    _events_streaks,
    """
WITH d AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT AS ed
  FROM events
),
islands AS (
  SELECT user_id, anchor, min(ed2) AS start_epochday, count(*)::BIGINT AS streak_len
  FROM (
    SELECT user_id, ed AS ed2,
           ed - row_number() OVER (PARTITION BY user_id ORDER BY ed) AS anchor
    FROM d
  ) GROUP BY user_id, anchor
),
per_user AS (
  SELECT user_id, sum(streak_len)::BIGINT AS n_active_days,
         count(*)::BIGINT AS n_streaks, max(streak_len)::BIGINT AS longest_streak
  FROM islands GROUP BY user_id
)
SELECT p.user_id, p.n_active_days, p.n_streaks, p.longest_streak,
       min(i.start_epochday)::BIGINT AS longest_start_epochday
FROM per_user p JOIN islands i
  ON p.user_id = i.user_id AND i.streak_len = p.longest_streak
GROUP BY p.user_id, p.n_active_days, p.n_streaks, p.longest_streak
ORDER BY p.longest_streak DESC, p.user_id
LIMIT 20
""",
)


# ==========================================================================
# A/B experiment analysis (round 10): deterministic hash assignment
# (salted md5 parity — the reproducible traffic split every experiment
# platform uses), per-user conversion, two-proportion z.  Rates and
# lift are exact ppm integers; the z statistic is the one rounded
# double (identical short IEEE expression both engines).  Scale shape:
# one per-user groupBy (map-side partial), then a 2-row arm aggregate.
# ==========================================================================


def _events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("purchases")
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("§", F.lit("ab"), F.col("user_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % 2
    )
    # conversion threshold near the per-user median so both arms split
    # informatively (purchases > 0 is degenerate on this fixture: every
    # user buys, pooled p = 1, zero variance)
    assigned = per_user.withColumn("arm", arm).withColumn(
        "conv", (F.col("purchases") >= 14).cast("long")
    )
    arms = assigned.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("conv_b"),
    )
    return arms.selectExpr(
        "n_a", "n_b", "conv_a", "conv_b",
        "CAST((conv_a * CAST(1000000 AS BIGINT)) div n_a AS BIGINT) AS rate_a_ppm",
        "CAST((conv_b * CAST(1000000 AS BIGINT)) div n_b AS BIGINT) AS rate_b_ppm",
        "CAST((conv_a * CAST(1000000 AS BIGINT)) div n_a - (conv_b * CAST(1000000 AS BIGINT)) div n_b AS BIGINT) AS lift_ppm",
        """CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
           THEN round(
             (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt(
                 (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b)
               ), 4) END AS z_r4""",
    )


_register(
    "events_ab_test_analysis",
    _events_ab_test,
    """
WITH per_user AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchases
  FROM events GROUP BY 1
),
assigned AS (
  SELECT ('0x' || substr(md5('ab' || '§' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
         (purchases >= 14)::BIGINT AS conv
  FROM per_user
),
arms AS (
  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)::BIGINT AS conv_a,
         sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)::BIGINT AS conv_b
  FROM assigned
)
SELECT n_a, n_b, conv_a, conv_b,
       CAST((conv_a * 1000000) // n_a AS BIGINT) AS rate_a_ppm,
       CAST((conv_b * 1000000) // n_b AS BIGINT) AS rate_b_ppm,
       CAST((conv_a * 1000000) // n_a - (conv_b * 1000000) // n_b AS BIGINT) AS lift_ppm,
       CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
       THEN round(
         (conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
         / sqrt(
             ((conv_a + conv_b)::DOUBLE / (n_a + n_b))
             * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
             * (1.0 / n_a + 1.0 / n_b)
           ), 4) END AS z_r4
FROM arms
""",
)


# ==========================================================================
# Price-volume-mix decomposition (round 10): WHY did revenue move
# between 1995 and 1996, per order priority — the volume effect
# ((n2 - n1) at period-1 average price) vs the price effect (n2 times
# the average-price change), the first decomposition any revenue
# review asks for.  Averages are exact micro-cents floor divisions;
# both effects are exact integer products of those (the flooring
# residual lands in the price effect by construction:
# vol + price == n2*avg2 - n1*avg1 exactly in micro units).
# ==========================================================================


def _orders_pvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    per = (
        orders.filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy("o_orderpriority", F.year("o_orderdate").alias("yr"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("rev"))
    )
    a = per.filter(F.col("yr") == 1995).select(
        "o_orderpriority", F.col("n").alias("n1"), F.col("rev").alias("rev1")
    )
    b = per.filter(F.col("yr") == 1996).select(
        "o_orderpriority", F.col("n").alias("n2"), F.col("rev").alias("rev2")
    )
    j = a.join(b, "o_orderpriority")
    return j.selectExpr(
        "o_orderpriority", "n1", "n2",
        "CAST((rev1 * CAST(1000000 AS BIGINT)) div n1 AS BIGINT) AS avg1_micro",
        "CAST((rev2 * CAST(1000000 AS BIGINT)) div n2 AS BIGINT) AS avg2_micro",
        "CAST((n2 - n1) * ((rev1 * CAST(1000000 AS BIGINT)) div n1) AS BIGINT) AS volume_effect_micro",
        "CAST(n2 * ((rev2 * CAST(1000000 AS BIGINT)) div n2 - (rev1 * CAST(1000000 AS BIGINT)) div n1) AS BIGINT) AS price_effect_micro",
    ).orderBy("o_orderpriority")


_register(
    "orders_pvm_decomposition",
    _orders_pvm,
    """
WITH per AS (
  SELECT o_orderpriority, year(o_orderdate) AS yr,
         count(*)::BIGINT AS n,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS rev
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2
),
a AS (SELECT o_orderpriority, n AS n1, rev AS rev1 FROM per WHERE yr = 1995),
b AS (SELECT o_orderpriority, n AS n2, rev AS rev2 FROM per WHERE yr = 1996)
SELECT o_orderpriority, n1, n2,
       CAST((rev1 * 1000000) // n1 AS BIGINT) AS avg1_micro,
       CAST((rev2 * 1000000) // n2 AS BIGINT) AS avg2_micro,
       CAST((n2 - n1) * ((rev1 * 1000000) // n1) AS BIGINT) AS volume_effect_micro,
       CAST(n2 * ((rev2 * 1000000) // n2 - (rev1 * 1000000) // n1) AS BIGINT) AS price_effect_micro
FROM a JOIN b USING (o_orderpriority)
ORDER BY o_orderpriority
""",
)


# ==========================================================================
# Cohort LTV curve (round 10): cumulative revenue per acquisition
# cohort by age-in-months — the lifetime-value chart behind every
# retention program.  One groupBy to (cohort, age) cells, a cumulative
# window PARTITIONED BY cohort (calendar-bounded per key), LTV per
# customer in exact micro-cents.
# ==========================================================================


def _orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    mx = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    base = orders.select("o_custkey", mx.alias("mx"), cents.alias("cents"))
    cohort = base.groupBy("o_custkey").agg(F.min("mx").alias("cohort"))
    sized = cohort.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    cells = (
        base.join(F.broadcast(cohort), "o_custkey")
        .groupBy("cohort", (F.col("mx") - F.col("cohort")).alias("age"))
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.withColumn("cum_cents", F.sum("rev_cents").over(w))
        .join(F.broadcast(sized), "cohort")
        .selectExpr(
            "cohort", "age", "cohort_customers", "rev_cents",
            "CAST(cum_cents AS BIGINT) AS cum_cents",
            "CAST((CAST(cum_cents AS DECIMAL(38,0)) * 1000000) div cohort_customers AS BIGINT) AS ltv_micro",
        )
        .orderBy("cohort", "age")
    )


_register(
    "orders_cohort_ltv",
    _orders_cohort_ltv,
    """
WITH base AS (
  SELECT o_custkey, (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS mx,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
cohort AS (SELECT o_custkey, min(mx) AS cohort FROM base GROUP BY 1),
sized AS (SELECT cohort, count(*)::BIGINT AS cohort_customers FROM cohort GROUP BY 1),
cells AS (
  SELECT c.cohort, b.mx - c.cohort AS age, sum(b.cents)::BIGINT AS rev_cents
  FROM base b JOIN cohort c USING (o_custkey)
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort, age, rev_cents,
         sum(rev_cents) OVER (PARTITION BY cohort ORDER BY age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
  FROM cells
)
SELECT cum.cohort, age, cohort_customers, rev_cents,
       CAST(cum_cents AS BIGINT) AS cum_cents,
       CAST((cum_cents::HUGEINT * 1000000) // cohort_customers AS BIGINT) AS ltv_micro
FROM cum JOIN sized USING (cohort)
ORDER BY cum.cohort, age
""",
)


# ==========================================================================
# 2D skyline / Pareto frontier (round 11): customers no other customer
# dominates on (total spend, recency) — the "best tradeoff" query the
# Pareto-ABC share report doesn't answer (Börzsönyi et al. 2001, the
# SKYLINE operator; public literature).  Dominance: q beats p when
# q.spend >= p.spend AND q.rec >= p.rec with at least one strict.
#
# Naive is the O(n^2) NOT EXISTS self-join — that stays as the ORACLE.
# The engine side is the sort-sweep identity, distributed: reduce to
# one row per distinct spend (max recency at that spend + the count
# needed nowhere), then one global_rank pass ordered spend DESC with
# prefix_op="max" gives every spend level the best recency among all
# STRICTLY higher spends; a customer is on the skyline iff that
# exclusive prefix-max is NULL or < its recency (no richer customer is
# also at-least-as-recent) AND it holds its own spend level's max
# recency (no equal-spend customer is strictly more recent).  Two
# partial-agg groupBys + one range exchange; no O(n^2) anywhere.
# ==========================================================================


def _customer_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank

    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("spend_cents"),
        F.datediff(F.max("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("last_epochday"),
    )
    per_spend = per.groupBy("spend_cents").agg(
        F.max("last_epochday").alias("_mrec")
    )
    swept = global_rank(
        per_spend,
        [F.col("spend_cents").desc()],
        prefix_col="_mrec",
        prefix_op="max",
    ).select("spend_cents", "_mrec", F.col("_before").alias("_best_above"))
    return (
        per.join(swept, "spend_cents")
        .filter(
            (F.col("_best_above").isNull() | (F.col("_best_above") < F.col("last_epochday")))
            & (F.col("last_epochday") == F.col("_mrec"))
        )
        .select("o_custkey", "spend_cents", "last_epochday")
        .orderBy(F.col("spend_cents").desc(), "o_custkey")
    )


_DD_SKYLINE = """
WITH per AS (
  SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS spend_cents,
         date_diff('day', DATE '1970-01-01', max(o_orderdate))::BIGINT AS last_epochday
  FROM orders GROUP BY 1
)
SELECT p.o_custkey, p.spend_cents, p.last_epochday
FROM per p
WHERE NOT EXISTS (
  SELECT 1 FROM per q
  WHERE q.spend_cents >= p.spend_cents AND q.last_epochday >= p.last_epochday
    AND (q.spend_cents > p.spend_cents OR q.last_epochday > p.last_epochday)
)
ORDER BY p.spend_cents DESC, p.o_custkey
"""

_register("customer_skyline_spend_recency", _customer_skyline, _DD_SKYLINE)


# ==========================================================================
# ABC-XYZ inventory classification (round 11): the standard two-axis
# part segmentation — ABC = cumulative revenue share (Pareto tiers at
# 80/95%), XYZ = demand variability (coefficient of variation of
# monthly quantities at 0.5 / 1.0).  Every boundary is an exact
# integer comparison: ABC tiers compare 100*exclusive_prefix against
# 80/95*total (the global_rank prefix sum — no single-partition
# window over the row-cardinality part relation), and the cv
# thresholds cross-multiply (4(nQ - S^2) < S^2 for cv < 0.5 with
# population variance (nQ - S^2)/n^2 and mean S/n), so no engine ever
# forms a float to decide a class.  Output: the 3x3 class grid with
# part counts and revenue share in ppm.
# ==========================================================================


def _abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("_cents"),
        F.col("l_quantity").cast("long").alias("_qty"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("_mx"),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("_cents").alias("rev")).localCheckpoint(
        eager=False
    )
    tot = per_part.agg(F.sum("rev").alias("_tot"))
    abc = (
        global_rank(
            per_part,
            [F.col("rev").desc(), F.col("l_partkey").asc()],
            prefix_col="rev",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "rev",
            # decimal(38,0) before the 100*/80*/95* products: with ANSI
            # off a BIGINT product wraps silently once class revenue
            # cents exceed ~9.2e16, and the oracle side is HUGEINT — the
            # XYZ branch below already follows this convention.
            F.col("_before").cast("decimal(38,0)").alias("_b38"),
            F.col("_tot").cast("decimal(38,0)").alias("_t38"),
        )
        .select(
            "l_partkey",
            "rev",
            F.when(100 * F.col("_b38") < 80 * F.col("_t38"), "A")
            .when(100 * F.col("_b38") < 95 * F.col("_t38"), "B")
            .otherwise("C")
            .alias("abc"),
        )
    )
    monthly = li.groupBy("l_partkey", "_mx").agg(F.sum("_qty").alias("q"))
    xyz = (
        monthly.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
            F.sum("q").cast("decimal(38,0)").alias("_s"),
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("_qq"),
        )
        .selectExpr(
            "l_partkey",
            # cv^2 = (n*qq - s^2)/s^2; X: cv<0.5, Y: cv<1.0, Z: else
            """CASE WHEN 4 * (_n * _qq - _s * _s) < _s * _s THEN 'X'
                    WHEN _n * _qq - _s * _s < _s * _s THEN 'Y'
                    ELSE 'Z' END AS xyz""",
        )
    )
    grid = (
        abc.join(xyz, "l_partkey")
        .crossJoin(F.broadcast(tot))
        .groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            # decimal(38,0) arithmetic mirrors the oracle's HUGEINT —
            # sum(rev)*1e6 in BIGINT wraps at ~9.2e12 class cents.
            F.expr(
                "CAST((sum(CAST(rev AS DECIMAL(38,0))) * 1000000)"
                " div max(CAST(_tot AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("rev_share_ppm"),
        )
    )
    return grid.selectExpr(
        "abc", "xyz", "CAST(n_parts AS BIGINT) AS n_parts", "rev_share_ppm"
    ).orderBy("abc", "xyz")


_DD_ABC_XYZ = """
WITH li AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         l_quantity::BIGINT AS qty,
         (year(l_shipdate) * 12 + month(l_shipdate))::BIGINT AS mx
  FROM lineitem
),
per_part AS (SELECT l_partkey, sum(cents)::BIGINT AS rev FROM li GROUP BY 1),
tot AS (SELECT sum(rev)::HUGEINT AS t FROM per_part),
abc AS (
  SELECT l_partkey, rev,
         CASE WHEN 100 * coalesce(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::HUGEINT
                   < 80 * (SELECT t FROM tot) THEN 'A'
              WHEN 100 * coalesce(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::HUGEINT
                   < 95 * (SELECT t FROM tot) THEN 'B'
              ELSE 'C' END AS abc
  FROM per_part
),
monthly AS (SELECT l_partkey, mx, sum(qty)::HUGEINT AS q FROM li GROUP BY 1, 2),
xyz AS (
  SELECT l_partkey,
         CASE WHEN 4 * (count(*)::HUGEINT * sum(q * q) - sum(q) * sum(q))
                   < sum(q) * sum(q) THEN 'X'
              WHEN count(*)::HUGEINT * sum(q * q) - sum(q) * sum(q)
                   < sum(q) * sum(q) THEN 'Y'
              ELSE 'Z' END AS xyz
  FROM monthly GROUP BY 1
)
SELECT abc.abc, xyz.xyz, count(*)::BIGINT AS n_parts,
       CAST((sum(abc.rev)::HUGEINT * 1000000) // (SELECT t FROM tot) AS BIGINT)
         AS rev_share_ppm
FROM abc JOIN xyz USING (l_partkey)
GROUP BY 1, 2 ORDER BY abc, xyz
"""

_register("parts_abc_xyz_classes", _abc_xyz, _DD_ABC_XYZ)


# ==========================================================================
# percent_rank / cume_dist reconstruction (round 11): the two
# SQL-standard relative-rank functions, rebuilt WITHOUT their global
# ordered window from global_rank primitives — and gated against
# DuckDB's NATIVE percent_rank()/cume_dist(), so the two-pass plan is
# proven to match the standard's tie semantics, not a paraphrase:
# percent_rank = (rank - 1)/(n - 1) with rank = the MINIMUM position
# of the tie group (reconstructed as exclusive running count of
# strictly-smaller values + 1), cume_dist = (rows <= mine)/n (the tie
# group's inclusive prefix).  Both reported as exact ppm floor-divs of
# integer counts — ties hit identical integers on both engines.
# Output: the top-20 spenders' relative ranks.
# ==========================================================================


def _window_relrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank

    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("spend")
    )
    per_v = per.groupBy("spend").agg(F.count(F.lit(1)).alias("_c"))
    pref = global_rank(per_v, [F.col("spend").asc()], prefix_col="_c").select(
        "spend",
        F.col("_before").alias("_below"),          # rows strictly below
        (F.col("_before") + F.col("_c")).alias("_le"),  # rows <= mine
        F.col("_n").alias("_nv"),
    )
    n_tot = per.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        per.join(pref, "spend")
        .crossJoin(F.broadcast(n_tot))
        .selectExpr(
            "o_custkey",
            "spend",
            # min-rank of the tie group = _below + 1
            "CAST(((_below) * 1000000) div (_n - 1) AS BIGINT) AS percent_rank_ppm",
            "CAST((_le * 1000000) div _n AS BIGINT) AS cume_dist_ppm",
        )
    )
    return scored.orderBy(F.col("spend").desc(), "o_custkey").limit(20)


_DD_RELRANK = """
WITH per AS (
  SELECT o_custkey,
         CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS spend
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey, spend,
         percent_rank() OVER (ORDER BY spend) AS pr,
         cume_dist() OVER (ORDER BY spend) AS cd,
         count(*) OVER () AS n
  FROM per
)
SELECT o_custkey, spend,
       -- pr = k/(n-1) exactly, so round() recovers the integer k that
       -- floor() loses to a one-ulp-low product
       CAST(CAST(round(pr * (n - 1)) AS BIGINT) * 1000000 // (n - 1) AS BIGINT) AS percent_rank_ppm,
       CAST(CAST(round(cd * n) AS BIGINT) * 1000000 // n AS BIGINT) AS cume_dist_ppm
FROM scored
ORDER BY spend DESC, o_custkey LIMIT 20
"""

_register("window_relative_ranks", _window_relrank, _DD_RELRANK)
