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
# Gopher-style quality rules + deterministic sampling / splits — the
# remaining curation primitives of a training-data pipeline.
# ==========================================================================

from ..operators.groupwise import hash_sample, train_test_split_hash  # noqa: E402
from ..operators.textstats import gopher_quality_flags  # noqa: E402


def _gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality_flags(_t(spark, sf_dir, "documents"))


_DD_GOPHER = f"""
WITH n AS (
  SELECT doc_id, text AS raw, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents
),
f AS (
  SELECT doc_id, raw, norm,
         string_split(trim(norm), ' ') AS words,
         string_split(raw, chr(10)) AS lines
  FROM n
),
m AS (
  SELECT doc_id,
         len(words) AS n_words,
         list_sum(list_transform(words, w -> length(w)))::DOUBLE / len(words) AS mean_wl,
         ((len(string_split(norm, '#')) - 1) + (len(string_split(norm, '...')) - 1))::DOUBLE
           / len(words) AS sym_ratio,
         len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))::DOUBLE
           / len(lines) AS bullet_ratio,
         len(list_filter(lines, l -> trim(l) LIKE '%...'))::DOUBLE / len(lines) AS ell_ratio,
         len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
           / len(words) AS alpha_ratio
  FROM f
)
SELECT doc_id,
       (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
       (mean_wl >= 3.0 AND mean_wl <= 10.0) AS mean_word_len_ok,
       (sym_ratio <= 0.1) AS symbol_ratio_ok,
       (bullet_ratio <= 0.9) AS bullet_ratio_ok,
       (ell_ratio <= 0.3) AS ellipsis_ratio_ok,
       (alpha_ratio >= 0.8) AS alpha_word_ratio_ok,
       ((n_words >= 50 AND n_words <= 100000) AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
        AND (sym_ratio <= 0.1) AND (bullet_ratio <= 0.9) AND (ell_ratio <= 0.3)
        AND (alpha_ratio >= 0.8)) AS keep
FROM m
"""

_register("text_gopher_quality_flags", _gopher_flags, _DD_GOPHER)


def _repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textstats import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


_DD_REPETITION = f"""
WITH lines AS (
  SELECT doc_id, trim(l) AS line
  FROM documents, unnest(string_split(text, chr(10))) AS t(l)
  WHERE trim(l) <> ''
),
lc AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2),
lstats AS (
  SELECT doc_id,
         sum(c) AS n_lines,
         count(*) AS n_distinct,
         sum(c * length(line)) AS total_chars,
         sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS dup_chars
  FROM lc GROUP BY 1
),
w AS (
  SELECT doc_id,
         string_split(trim({dd_sql(_DD_NORMALIZE, col="text")}), ' ') AS words
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(words) - 1),
                               i -> words[i] || ' ' || words[i + 1])) AS bigram
  FROM w WHERE len(words) >= 2
),
bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
btop AS (
  SELECT doc_id, bigram AS top_bigram, c AS top_c,
         sum(c) OVER (PARTITION BY doc_id) AS n_bigrams
  FROM bc
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram) = 1
)
SELECT d.doc_id,
       coalesce(s.n_lines, 0)::BIGINT AS n_lines,
       round(CASE WHEN coalesce(s.n_lines, 0) > 0
                  THEN (s.n_lines - s.n_distinct)::DOUBLE / s.n_lines
                  ELSE 0.0 END, 4) AS dup_line_frac,
       round(CASE WHEN coalesce(s.total_chars, 0) > 0
                  THEN s.dup_chars::DOUBLE / s.total_chars
                  ELSE 0.0 END, 4) AS dup_line_char_frac,
       coalesce(b.top_bigram, '') AS top_bigram,
       round(coalesce(b.top_c::DOUBLE / b.n_bigrams, 0.0), 4) AS top_bigram_frac
FROM documents d
LEFT JOIN lstats s USING (doc_id)
LEFT JOIN btop b USING (doc_id)
"""

_register("text_repetition_stats", _repetition, _DD_REPETITION)


def _hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", rate_pct=20).select("doc_id", "source")


_DD_BUCKET = (
    "(('0x' || substr(md5('{salt}' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT % 100)"
)

_register(
    "sample_deterministic_20pct",
    _hash_sample_docs,
    f"SELECT doc_id, source FROM documents WHERE {dd_sql(_DD_BUCKET, salt='sample')} < 20",
)


def _split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = train_test_split_hash(docs, "doc_id", test_pct=10)
    return out.groupBy("split").agg(F.count("*").alias("n"))


_register(
    "train_test_split_counts",
    _split_docs,
    f"""
SELECT CASE WHEN {dd_sql(_DD_BUCKET, salt='split')} < 10 THEN 'test' ELSE 'train' END AS split,
       count(*) AS n
FROM documents GROUP BY 1
""",
)


def _join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-nation customer counts vs supplier counts, full outer on nation
    cust = (
        _t(spark, sf_dir, "customer").groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        _t(spark, sf_dir, "supplier").groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


_register(
    "join_full_outer_nation_counts",
    _join_full_outer,
    """
WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
""",
)


def _pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .filter(F.col("user_id") < 50)
    )


_register(
    "pivot_event_type_counts",
    _pivot_events,
    """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events
WHERE user_id < 50
GROUP BY user_id
""",
)


def _agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


_register(
    "agg_cube_lineitem",
    _agg_cube,
    """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)


def _agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS revenue
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_register(
    "agg_grouping_sets_orders",
    _agg_grouping_sets,
    """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)


def _window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: for every order, revenue of the customer's orders in
    the trailing 90 days (value-based frame, not row-based)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-90, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_90d_revenue"),
        F.count("*").over(w).alias("trailing_90d_orders"),
    )


_register(
    "window_range_frame_trailing",
    _window_range_frame,
    """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER w, 2) AS trailing_90d_revenue,
       count(*) OVER w AS trailing_90d_orders
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate::DATE)
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
""",
)


def _array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth over per-order lineitem quantity vectors."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.struct("l_linenumber", "l_quantity"))).alias("_lines")
    )
    qtys = F.transform("_lines", lambda s: s["l_quantity"])
    return per_order.select(
        "l_orderkey",
        F.size(qtys).alias("n_lines"),
        F.round(F.aggregate(qtys, F.lit(0.0), lambda a, x: a + x), 2).alias("total_qty"),
        F.array_max(qtys).alias("max_qty"),
        F.array_min(qtys).alias("min_qty"),
        F.element_at(qtys, 1).alias("first_qty"),
        F.element_at(F.reverse(qtys), 1).alias("last_qty"),
        F.round(F.aggregate(F.slice(qtys, 1, 2), F.lit(0.0), lambda a, x: a + x), 2).alias("first2_qty"),
        F.array_contains(qtys, F.lit(1.0)).alias("has_qty_one"),
        F.size(F.array_distinct(qtys)).alias("n_distinct_qty"),
    )


_register(
    "array_function_breadth",
    _array_functions,
    """
WITH per_order AS (
  SELECT l_orderkey,
         list_transform(list_sort(list(ROW(l_linenumber, l_quantity))), s -> s[2]) AS qtys
  FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(qtys) AS n_lines,
       round(list_sum(qtys), 2) AS total_qty,
       list_max(qtys) AS max_qty,
       list_min(qtys) AS min_qty,
       qtys[1] AS first_qty,
       list_reverse(qtys)[1] AS last_qty,
       round(list_sum(qtys[1:2]), 2) AS first2_qty,
       list_contains(qtys, 1.0) AS has_qty_one,
       len(list_distinct(qtys)) AS n_distinct_qty
FROM per_order
""",
)


def _date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mo"),
        F.dayofweek(d).alias("dow"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("eom"),
        F.date_format(F.trunc(d.cast("date"), "quarter"), "yyyy-MM-dd").alias("qtr_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("days_to_2002"),
        F.round(F.months_between(F.lit("2002-01-01").cast("timestamp"), d), 4).alias("months_to_2002"),
    )


_register(
    "date_function_breadth",
    _date_functions,
    """
SELECT o_orderkey,
       year(o_orderdate)::INT AS yr,
       quarter(o_orderdate)::INT AS qtr,
       month(o_orderdate)::INT AS mo,
       (dayofweek(o_orderdate) + 1)::INT AS dow,
       strftime(o_orderdate::DATE + 30, '%Y-%m-%d') AS plus30,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS eom,
       strftime(date_trunc('quarter', o_orderdate)::DATE, '%Y-%m-%d') AS qtr_start,
       date_diff('day', o_orderdate::DATE, DATE '2002-01-01') AS days_to_2002,
       round(
         (year(DATE '2002-01-01') - year(o_orderdate)) * 12
         + (month(DATE '2002-01-01') - month(o_orderdate))
         + (1 - day(o_orderdate)) / 31.0, 4) AS months_to_2002
FROM orders WHERE o_orderkey < 3000
""",
)


def _null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared null placement in sorts (engines default differently:
    Spark nulls-first ASC, DuckDB nulls-last — so the query pins it)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    pri = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return (
        orders.select("o_orderkey", pri.alias("pri"))
        .orderBy(F.col("pri").asc_nulls_last(), F.col("o_orderkey"))
        .limit(50)
    )


_register(
    "sort_nulls_last",
    _null_ordering,
    """
SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS pri
FROM orders WHERE o_orderkey < 500
ORDER BY pri ASC NULLS LAST, o_orderkey
LIMIT 50
""",
)


# ==========================================================================


# --------------------------------------------------------------------------
# Deterministic weighted sampling (round 6) — operators/groupwise.py::
# weighted_sample_topn.  Efraimidis-Spirakis A-ES keys over the stable
# md5 uniform: inclusion probability proportional to o_totalprice, yet
# the selected set replays bit-identically across engines/partitionings
# (unlike df.sample).  Plan: per-row codegen key + TakeOrderedAndProject
# — no full sort, no shuffle beyond partial winners.
# --------------------------------------------------------------------------

_WS_N = 20


def _sample_weighted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.groupwise import weighted_sample_topn

    orders = _t(spark, sf_dir, "orders")
    sel = weighted_sample_topn(
        orders, "o_totalprice", _WS_N, id_col="o_orderkey", salt="wsample"
    )
    # es_key is already the quantized key rescaled (operator contract):
    # selection and output compare identical bits on both engines.
    return sel.select("o_orderkey", "o_totalprice", "es_key")


_DD_WSAMPLE = f"""
WITH u AS (
  SELECT o_orderkey, o_totalprice,
         ((('0x' || substr(md5('wsample' || '§' || o_orderkey::VARCHAR), 1, 8))::BIGINT + 1)
           / 4294967296.0) AS u
  FROM orders
  WHERE o_totalprice > 0
),
keyed AS (
  SELECT o_orderkey, o_totalprice,
         CAST(floor((-ln(u) / o_totalprice) * 1e8 + 0.5) AS BIGINT) AS kq
  FROM u
)
SELECT o_orderkey, o_totalprice, kq / 100000000.0 AS es_key
FROM keyed
ORDER BY kq, o_orderkey
LIMIT {_WS_N}
"""

_register("sample_weighted_orders", _sample_weighted_orders, _DD_WSAMPLE)
