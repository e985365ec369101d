# ==========================================================================
# Sketch summaries (round 6) — count-min over the document token stream
# (operators/sketch.py).  Fixed d x w integer state for an unbounded
# term domain; estimates never underestimate.  Everything is stable-md5
# hashing + long counts, so the DuckDB oracle replays the sketch AND
# the estimates bit-exactly alongside the exact counts.
# ==========================================================================
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    _drain,
    _events,
    F,
    SparkSession,
    _register,
    _t,
)
from .retrieval import _DD_TOKENS

_CM_DEPTH, _CM_WIDTH = 4, 256
_CM_PROBES = ["spark", "vector", "join", "data", "query", "table", "stream", "batch"]


def _sketch_countmin_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the sketch over every corpus token, then point-estimate 8
    probe terms next to their exact counts — the (est >= exact) gap IS
    the report.  Shuffle: d*w cells for the build (never the distinct
    term domain), broadcast cells for the probe."""
    from ..operators.retrieval import tokenize
    from ..operators.sketch import countmin_build, countmin_estimate

    docs = _t(spark, sf_dir, "documents")
    tokens = tokenize(docs)
    sk = countmin_build(tokens, "term", depth=_CM_DEPTH, width=_CM_WIDTH)
    probes = spark.createDataFrame([(t,) for t in _CM_PROBES], "key string")
    est = countmin_estimate(sk, probes, depth=_CM_DEPTH, width=_CM_WIDTH)
    exact = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        est.join(exact, est.key == exact.term, "left")
        .select(
            F.col("key").alias("term"),
            "est",
            F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
        )
    )


_DD_CM_HASH = "(('0x' || substr(md5('cm' || i.i || '§' || {key}), 1, 8))::BIGINT % {w})"

_DD_COUNTMIN = f"""
WITH {_DD_TOKENS},
dims AS (SELECT unnest(range(0, {_CM_DEPTH})) AS i),
cells AS MATERIALIZED (
  SELECT i.i AS row, {_DD_CM_HASH.format(key="term", w=_CM_WIDTH)} AS col, count(*) AS cnt
  FROM tokens, dims i
  GROUP BY 1, 2
),
probes(key) AS (VALUES {", ".join(f"('{t}')" for t in _CM_PROBES)}),
pcell AS (
  SELECT key, i.i AS row, {_DD_CM_HASH.format(key="key", w=_CM_WIDTH)} AS col
  FROM probes, dims i
),
est AS (
  SELECT key, min(coalesce(cnt, 0)) AS est
  FROM pcell LEFT JOIN cells USING (row, col)
  GROUP BY key
),
exact AS (SELECT term, count(*) AS n FROM tokens GROUP BY term)
SELECT key AS term, est, coalesce(n, 0) AS exact_count
FROM est LEFT JOIN exact ON term = key
"""

_register("sketch_countmin_terms", _sketch_countmin_terms, _DD_COUNTMIN)


def _stream_countmin_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sketch maintenance through the driver gate: the token
    stream arrives as 2 micro-batched files, each batch's d x w cell
    matrix appended to the sketch log (streaming/sketch_stream.py),
    the drained log folded cell-wise and probed.  Cell-wise addition is
    the sketch's exact merge law, so the oracle is the SAME batch SQL
    as sketch_countmin_terms — streaming == one-shot, bit-for-bit."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..operators.retrieval import tokenize
    from ..operators.sketch import countmin_estimate
    from ..streaming.sketch_stream import countmin_read, stream_into_countmin

    docs = _t(spark, sf_dir, "documents")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_stream_cm_{tag}_{os.getpid()}")
    src, log, ckpt = (os.path.join(base, d) for d in ("src", "log", "ckpt"))
    shutil.rmtree(base, ignore_errors=True)

    toks = tokenize(docs)
    toks.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/f0")
    toks.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/f1")
    stream = (
        spark.readStream.schema(toks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = stream_into_countmin(
        stream, log, ckpt, "term", depth=_CM_DEPTH, width=_CM_WIDTH
    )
    _drain(q, 120)

    sk = countmin_read(spark, log)
    probes = spark.createDataFrame([(t,) for t in _CM_PROBES], "key string")
    est = countmin_estimate(sk, probes, depth=_CM_DEPTH, width=_CM_WIDTH)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        est.join(exact, est.key == exact.term, "left")
        .select(
            F.col("key").alias("term"),
            "est",
            F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
        )
    )


_register("stream_countmin_replay", _stream_countmin_replay, _DD_COUNTMIN)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch over the corpus term domain:
# register table + estimate next to the exact distinct count.  The
# register max-aggregate is order-free and the harmonic sum is an exact
# long, so the DuckDB oracle replays the sketch register-for-register.
# ---------------------------------------------------------------------------


def _sketch_hll_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import tokenize
    from ..operators.sketch import hll_estimate, hll_registers

    docs = _t(spark, sf_dir, "documents")
    tokens = tokenize(docs)
    regs = hll_registers(tokens, "term")
    est = hll_estimate(regs)
    exact = tokens.select("term").distinct().agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "exact_distinct",
        F.round("hll_estimate", 2).alias("hll_estimate"),
        F.round(
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_error"),
    )


_DD_HLL = f"""
WITH {_DD_TOKENS},
h AS (
  SELECT (('0x' || substr(md5('hll' || '§' || term), 1, 8))::BIGINT) AS hv
  FROM tokens
),
ranked AS (
  SELECT hv % 64 AS reg,
         CASE WHEN CAST(floor(hv / 64) AS BIGINT) = 0 THEN 27
              ELSE 27 - length(bin(CAST(floor(hv / 64) AS BIGINT))) END AS r
  FROM h
),
spine AS (SELECT unnest(range(0, 64)) AS reg),
regs AS (
  SELECT spine.reg, coalesce(mx.m_rank, 0) AS m_rank
  FROM spine LEFT JOIN (SELECT reg, max(r) AS m_rank FROM ranked GROUP BY reg) mx
  USING (reg)
),
agg AS (
  SELECT CAST(sum(CAST(power(2, 27 - m_rank) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CASE WHEN m_rank = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM regs
),
est AS (
  SELECT CASE WHEN (0.709 * 64 * 64) * power(2, 27) / s <= 2.5 * 64 AND v > 0
              THEN 64.0 * ln(64.0 / v)
              ELSE (0.709 * 64 * 64) * power(2, 27) / s END AS e
  FROM agg
),
exact AS (SELECT count(DISTINCT term) AS exact_distinct FROM tokens)
SELECT exact_distinct,
       round(e, 2) AS hll_estimate,
       round(abs(e - exact_distinct) / exact_distinct, 4) AS rel_error
FROM est, exact
"""

_register("sketch_hll_distinct_terms", _sketch_hll_terms, _DD_HLL)


def _stream_hll_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HLL maintenance through the driver gate: the token
    stream arrives as 2 micro-batched files, each batch's m-row
    register table appended to the HLL log
    (streaming/sketch_stream.py), the drained log folded by
    element-wise max and estimated.  Register max is the sketch's
    exact merge law, so the oracle is the SAME batch SQL as
    sketch_hll_distinct_terms — streaming == one-shot, bit-for-bit."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..operators.retrieval import tokenize
    from ..operators.sketch import hll_estimate
    from ..streaming.sketch_stream import hll_read, stream_into_hll

    docs = _t(spark, sf_dir, "documents")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_stream_hll_{tag}_{os.getpid()}")
    src, log, ckpt = (os.path.join(base, d) for d in ("src", "log", "ckpt"))
    shutil.rmtree(base, ignore_errors=True)

    toks = tokenize(docs)
    toks.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/f0")
    toks.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/f1")
    stream = (
        spark.readStream.schema(toks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = stream_into_hll(stream, log, ckpt, "term")
    _drain(q, 120)

    est = hll_estimate(hll_read(spark, log))
    exact = toks.select("term").distinct().agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "exact_distinct",
        F.round("hll_estimate", 2).alias("hll_estimate"),
        F.round(
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_error"),
    )


_register("stream_hll_replay", _stream_hll_replay, _DD_HLL)


# ---------------------------------------------------------------------------
# Base-2 quantile sketch (round 7, operators/sketch.py::qsketch_*):
# DDSketch-class mergeable rank summaries with POWER-OF-TWO buckets
# subdivided by 4 mantissa bits — the bucket index is pure integer bit
# arithmetic (length(bin(x)), shifts), no log()/libm anywhere, so the
# whole sketch AND the extracted quantiles replay bit-identically in
# SQL.  Reported quantiles are bucket LOWER bounds: deterministic
# underestimates within 2^-4 relative error (bound gated in
# tests/test_sketch.py).  Merge law = bucket addition (the count-min
# law), so the streaming replay entry reuses the same log + per-batch
# dedup machinery.
# ---------------------------------------------------------------------------

_QS_BITS = 4
_QS_QUANTILES = [2500, 5000, 7500, 9000, 9900, 10000]


def _sketch_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import qsketch_build, qsketch_quantiles

    orders = _t(spark, sf_dir, "orders")
    cents = orders.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    sk = qsketch_build(cents, "cents", sub_bits=_QS_BITS)
    return qsketch_quantiles(sk, _QS_QUANTILES, sub_bits=_QS_BITS).orderBy("q_bp")


_DD_QSKETCH = f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x FROM orders
),
b AS (
  SELECT CASE
    WHEN x <= 0 THEN -1
    WHEN x < {1 << _QS_BITS} THEN x
    ELSE ((length(bin(x)) - 1)::BIGINT << {_QS_BITS})
         + ((x >> (length(bin(x)) - 1 - {_QS_BITS})) - {1 << _QS_BITS})
  END AS bucket
  FROM cents
),
s AS (SELECT bucket, count(*)::BIGINT AS cnt FROM b WHERE bucket >= 0 GROUP BY 1),
n AS (SELECT sum(cnt)::BIGINT AS n FROM s),
cum AS (
  SELECT a.bucket AS bkt, sum(c.cnt)::BIGINT AS cum
  FROM s a JOIN s c ON c.bucket <= a.bucket GROUP BY 1
),
qs AS (SELECT unnest({_QS_QUANTILES}) AS q_bp),
r AS (SELECT q_bp, n.n, (q_bp * n.n + 9999) // 10000 AS rank FROM qs, n),
sel AS (
  SELECT r.q_bp, r.n, min(cum.bkt) AS bucket
  FROM r JOIN cum ON cum.cum >= r.rank
  GROUP BY 1, 2
)
SELECT CAST(q_bp AS BIGINT) AS q_bp, n AS n_values,
       CAST(CASE WHEN bucket < {1 << _QS_BITS} THEN bucket
            ELSE ((bucket & {(1 << _QS_BITS) - 1}) + {1 << _QS_BITS})
                 << ((bucket >> {_QS_BITS}) - {_QS_BITS})
       END AS BIGINT) AS quantile_lower
FROM sel
ORDER BY q_bp
"""

_register("sketch_quantiles_prices", _sketch_quantiles_prices, _DD_QSKETCH)


def _stream_qsketch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantile-sketch maintenance through the driver gate:
    order totals arrive as 2 micro-batched files, each batch's bucket
    counts appended to the log (batch_id-stamped), the drained log
    folded with per-batch dedup and the SAME quantiles extracted —
    bucket addition is the exact merge law, so the oracle is identical
    to the one-shot batch entry."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..operators.sketch import qsketch_quantiles
    from ..streaming.sketch_stream import qsketch_read, stream_into_qsketch

    orders = _t(spark, sf_dir, "orders")
    cents = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_qs_{tag}_{os.getpid()}"
    )
    src, log, ckpt = (os.path.join(base, d) for d in ("src", "log", "ckpt"))
    shutil.rmtree(base, ignore_errors=True)

    cents.filter(F.col("o_orderkey") % 2 == 0).coalesce(1).write.parquet(f"{src}/f0")
    cents.filter(F.col("o_orderkey") % 2 == 1).coalesce(1).write.parquet(f"{src}/f1")
    stream = (
        spark.readStream.schema(cents.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    _drain(stream_into_qsketch(stream, log, ckpt, "cents", sub_bits=_QS_BITS), 120)

    sk = qsketch_read(spark, log)
    return qsketch_quantiles(sk, _QS_QUANTILES, sub_bits=_QS_BITS).orderBy("q_bp")


_register("stream_qsketch_replay", _stream_qsketch_replay, _DD_QSKETCH)


# ---------------------------------------------------------------------------
# HLL set algebra (round 7): union by element-wise register max (the
# sketch's exact merge law) and intersection by inclusion-exclusion —
# the cross-corpus overlap question ("how many terms do the English and
# Chinese slices share?") answered from two mergeable 64-row summaries
# instead of a distinct-set join, next to the exact answer for honesty.
# ---------------------------------------------------------------------------


def _sketch_hll_lang_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import tokenize
    from ..operators.sketch import hll_registers, hll_set_estimates

    docs = _t(spark, sf_dir, "documents")
    toks = tokenize(docs).join(docs.select("doc_id", "lang"), "doc_id")
    a = hll_registers(toks.filter(F.col("lang") == "en"), "term")
    b = hll_registers(toks.filter(F.col("lang") == "zh"), "term")
    est = hll_set_estimates(a, b)

    en_terms = toks.filter(F.col("lang") == "en").select("term").distinct()
    zh_terms = toks.filter(F.col("lang") == "zh").select("term").distinct()
    exact = (
        en_terms.intersect(zh_terms)
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
        .crossJoin(F.broadcast(en_terms.agg(F.count(F.lit(1)).alias("exact_a"))))
        .crossJoin(F.broadcast(zh_terms.agg(F.count(F.lit(1)).alias("exact_b"))))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.round("est_a", 2).alias("est_a"),
        F.round("est_b", 2).alias("est_b"),
        F.round("est_union", 2).alias("est_union"),
        F.round("est_intersect", 2).alias("est_intersect"),
        "exact_a",
        "exact_b",
        "exact_intersect",
    )


def _dd_hll_regs(tag: str, lang: str) -> str:
    """Register + estimate CTEs for one language slice — mirrors the
    Spark expression order of hll_registers/hll_estimate exactly."""
    return f"""
h_{tag} AS (
  SELECT (('0x' || substr(md5('hll' || '§' || term), 1, 8))::BIGINT) AS hv
  FROM ltok WHERE lang = '{lang}'
),
regs_{tag} AS (
  SELECT spine.reg, coalesce(mx.m_rank, 0) AS m_rank
  FROM spine LEFT JOIN (
    SELECT hv % 64 AS reg,
           max(CASE WHEN CAST(floor(hv / 64) AS BIGINT) = 0 THEN 27
                    ELSE 27 - length(bin(CAST(floor(hv / 64) AS BIGINT))) END) AS m_rank
    FROM h_{tag} GROUP BY 1) mx
  USING (reg)
)"""


def _dd_hll_est(tag: str) -> str:
    return f"""
agg_{tag} AS (
  SELECT CAST(sum(CAST(power(2, 27 - m_rank) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CASE WHEN m_rank = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM regs_{tag}
),
est_{tag} AS (
  SELECT CASE WHEN (0.709 * 64 * 64) * power(2, 27) / s <= 2.5 * 64 AND v > 0
              THEN 64.0 * ln(64.0 / v)
              ELSE (0.709 * 64 * 64) * power(2, 27) / s END AS e
  FROM agg_{tag}
)"""


_DD_HLL_OVERLAP = f"""
WITH {_DD_TOKENS},
ltok AS (SELECT t.term, d.lang FROM tokens t JOIN documents d USING (doc_id)),
spine AS (SELECT unnest(range(0, 64)) AS reg),
{_dd_hll_regs("a", "en").lstrip()},
{_dd_hll_regs("b", "zh").lstrip()},
regs_u AS (
  SELECT a.reg, CASE WHEN a.m_rank > b.m_rank THEN a.m_rank ELSE b.m_rank END AS m_rank
  FROM regs_a a JOIN regs_b b USING (reg)
),
{_dd_hll_est("a").lstrip()},
{_dd_hll_est("b").lstrip()},
{_dd_hll_est("u").lstrip()},
exact AS (
  SELECT
    (SELECT count(DISTINCT term) FROM ltok WHERE lang = 'en')::BIGINT AS exact_a,
    (SELECT count(DISTINCT term) FROM ltok WHERE lang = 'zh')::BIGINT AS exact_b,
    (SELECT count(*) FROM (
       SELECT DISTINCT term FROM ltok WHERE lang = 'en'
       INTERSECT
       SELECT DISTINCT term FROM ltok WHERE lang = 'zh'))::BIGINT AS exact_intersect
)
SELECT round(est_a.e, 2) AS est_a,
       round(est_b.e, 2) AS est_b,
       round(est_u.e, 2) AS est_union,
       round(est_a.e + est_b.e - est_u.e, 2) AS est_intersect,
       exact_a, exact_b, exact_intersect
FROM est_a, est_b, est_u, exact
"""

_register("sketch_hll_lang_overlap", _sketch_hll_lang_overlap, _DD_HLL_OVERLAP)


# ---------------------------------------------------------------------------
# Grouped quantile sketch (round 7): p50/p90/p99 order value per
# customer market segment from ONE pass of (group, bucket) summaries —
# the grouped profiling staple, all stages keyed by group so no global
# sort exists at any group count.  Same integer bucket arithmetic and
# rank rule as sketch_quantiles_prices.
# ---------------------------------------------------------------------------

_QSG_QUANTILES = [5000, 9000, 9900]


def _sketch_quantiles_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import qsketch_build_grouped, qsketch_quantiles_grouped

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    keyed = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_nationkey").alias("nationkey"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    sk = qsketch_build_grouped(keyed, "nationkey", "cents", sub_bits=_QS_BITS)
    return (
        qsketch_quantiles_grouped(sk, _QSG_QUANTILES, sub_bits=_QS_BITS)
        .select(
            F.col("grp").alias("nationkey"), "q_bp", "n_values", "quantile_lower"
        )
        .orderBy("nationkey", "q_bp")
    )


_DD_QSKETCH_GROUPED = f"""
WITH keyed AS (
  SELECT c_nationkey AS grp,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
),
b AS (
  SELECT grp, CASE
    WHEN x <= 0 THEN -1
    WHEN x < {1 << _QS_BITS} THEN x
    ELSE ((length(bin(x)) - 1)::BIGINT << {_QS_BITS})
         + ((x >> (length(bin(x)) - 1 - {_QS_BITS})) - {1 << _QS_BITS})
  END AS bucket
  FROM keyed
),
s AS (SELECT grp, bucket, count(*)::BIGINT AS cnt FROM b WHERE bucket >= 0 GROUP BY 1, 2),
n AS (SELECT grp, sum(cnt)::BIGINT AS n FROM s GROUP BY 1),
cum AS (
  SELECT a.grp, a.bucket AS bkt, sum(c.cnt)::BIGINT AS cum
  FROM s a JOIN s c ON c.grp = a.grp AND c.bucket <= a.bucket
  GROUP BY 1, 2
),
qs AS (SELECT unnest({_QSG_QUANTILES}) AS q_bp),
r AS (SELECT n.grp, q_bp, n.n, (q_bp * n.n + 9999) // 10000 AS rank FROM n, qs),
sel AS (
  SELECT r.grp, r.q_bp, r.n, min(cum.bkt) AS bucket
  FROM r JOIN cum ON cum.grp = r.grp AND cum.cum >= r.rank
  GROUP BY 1, 2, 3
)
SELECT grp AS nationkey, CAST(q_bp AS BIGINT) AS q_bp, n AS n_values,
       CAST(CASE WHEN bucket < {1 << _QS_BITS} THEN bucket
            ELSE ((bucket & {(1 << _QS_BITS) - 1}) + {1 << _QS_BITS})
                 << ((bucket >> {_QS_BITS}) - {_QS_BITS})
       END AS BIGINT) AS quantile_lower
FROM sel
ORDER BY nationkey, q_bp
"""

_register(
    "sketch_quantiles_by_nation",
    _sketch_quantiles_by_nation,
    _DD_QSKETCH_GROUPED,
)


# ---------------------------------------------------------------------------
# Sliding-window HLL rollup (round 8): the production calendar pattern —
# per-day user sketches merged by register max into a trailing-7-day
# distinct estimate, next to the exact answers for honesty.  The raw
# data is read ONCE (one groups x m bounded aggregate); every window is
# a fold of the bounded sparse register relation, and the dense
# harmonic sum is reconstructed arithmetically (zero registers
# contribute exactly 2^27 each), so no per-group spine join exists to
# funnel through.  At 100 TB the exact twins are the expensive columns;
# the sketch columns cost one bounded shuffle regardless of window
# count.
# ---------------------------------------------------------------------------

_HLL_WIN_DAYS = 7


def _sketch_hll_sliding_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate_grouped, hll_registers_grouped

    ev = _events(spark, sf_dir).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    sparse = hll_registers_grouped(ev, "user_id", "day")
    days = sparse.select("day").distinct()
    offs = days.select(
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(_HLL_WIN_DAYS - 1))).alias("_k"),
    ).select("day", F.date_sub(F.col("day"), F.col("_k")).alias("src_day"))
    win = (
        offs.join(
            sparse.select(
                F.col("day").alias("src_day"), "reg", "m_rank"
            ),
            "src_day",
        )
        .groupBy("day", "reg")
        .agg(F.max("m_rank").alias("m_rank"))
    )
    est1 = hll_estimate_grouped(sparse, "day").select(
        "day", F.round("hll_estimate", 2).alias("users_1d_est")
    )
    est7 = hll_estimate_grouped(win, "day").select(
        "day", F.round("hll_estimate", 2).alias("users_7d_est")
    )
    nd = (
        offs.join(days.select(F.col("day").alias("src_day")), "src_day")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_days"))
    )
    ex1 = ev.groupBy("day").agg(
        F.countDistinct("user_id").alias("users_1d_exact")
    )
    ex7 = (
        offs.join(ev.select(F.col("day").alias("src_day"), "user_id"), "src_day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d_exact"))
    )
    return (
        est1.join(est7, "day")
        .join(nd, "day")
        .join(ex1, "day")
        .join(ex7, "day")
        .select(
            "day", "n_days",
            "users_1d_exact", "users_1d_est",
            "users_7d_exact", "users_7d_est",
        )
        .orderBy("day")
    )


_DD_HLL_SLIDING = f"""
WITH ev AS MATERIALIZED (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
h AS (
  SELECT day, (('0x' || substr(md5('hll' || '§' || user_id), 1, 8))::BIGINT) AS hv
  FROM ev
),
ranked AS (
  SELECT day, hv % 64 AS reg,
         CASE WHEN CAST(floor(hv / 64) AS BIGINT) = 0 THEN 27
              ELSE 27 - length(bin(CAST(floor(hv / 64) AS BIGINT))) END AS r
  FROM h
),
sparse AS MATERIALIZED (
  SELECT day, reg, max(r) AS m_rank FROM ranked GROUP BY 1, 2
),
days AS MATERIALIZED (SELECT DISTINCT day FROM sparse),
offs AS MATERIALIZED (
  SELECT d.day, d.day - CAST(k.k AS INTEGER) AS src_day
  FROM days d, unnest(range(0, {_HLL_WIN_DAYS})) AS k(k)
),
win AS (
  SELECT o.day, s.reg, max(s.m_rank) AS m_rank
  FROM offs o JOIN sparse s ON s.day = o.src_day
  GROUP BY 1, 2
),
agg1 AS (
  SELECT day,
         CAST(sum(CAST(power(2, 27 - m_rank) AS BIGINT)) AS BIGINT)
           + (64 - count(*)) * 134217728 AS s,
         (64 - count(*))::BIGINT AS v
  FROM sparse GROUP BY day
),
agg7 AS (
  SELECT day,
         CAST(sum(CAST(power(2, 27 - m_rank) AS BIGINT)) AS BIGINT)
           + (64 - count(*)) * 134217728 AS s,
         (64 - count(*))::BIGINT AS v
  FROM win GROUP BY day
),
est1 AS (
  SELECT day,
         round(CASE WHEN (0.709 * 64 * 64) * power(2, 27) / s <= 2.5 * 64 AND v > 0
                    THEN 64.0 * ln(64.0 / v)
                    ELSE (0.709 * 64 * 64) * power(2, 27) / s END, 2) AS users_1d_est
  FROM agg1
),
est7 AS (
  SELECT day,
         round(CASE WHEN (0.709 * 64 * 64) * power(2, 27) / s <= 2.5 * 64 AND v > 0
                    THEN 64.0 * ln(64.0 / v)
                    ELSE (0.709 * 64 * 64) * power(2, 27) / s END, 2) AS users_7d_est
  FROM agg7
),
nd AS (
  SELECT o.day, count(*)::BIGINT AS n_days
  FROM offs o JOIN days d2 ON d2.day = o.src_day
  GROUP BY 1
),
ex1 AS (
  SELECT day, count(DISTINCT user_id)::BIGINT AS users_1d_exact FROM ev GROUP BY 1
),
ex7 AS (
  SELECT o.day, count(DISTINCT e.user_id)::BIGINT AS users_7d_exact
  FROM offs o JOIN ev e ON e.day = o.src_day
  GROUP BY 1
)
SELECT day, n_days, users_1d_exact, users_1d_est, users_7d_exact, users_7d_est
FROM est1 JOIN est7 USING (day) JOIN nd USING (day)
     JOIN ex1 USING (day) JOIN ex7 USING (day)
ORDER BY day
"""

_register("sketch_hll_sliding_users", _sketch_hll_sliding_users, _DD_HLL_SLIDING)


# ---------------------------------------------------------------------------
# KMV / theta sketch set algebra (round 8, session 2 — operators/
# sketch.py::kmv_minset/kmv_set_estimates): "how many customers place
# both URGENT and LOW orders?" answered from two 64-row k-minsets —
# HLL's inclusion-exclusion twin, but with the theta-sketch UNBIASED
# intersection (merged-sketch Jaccard), which HLL cannot provide.
# Exact twins alongside for honesty, like sketch_hll_lang_overlap.
# The sketches are TakeOrderedAndProject top-ks (no global window, no
# single-partition exchange); every post-sketch relation is <= k rows.
# ---------------------------------------------------------------------------

_KMV_K = 64


def _sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import kmv_minset, kmv_set_estimates

    orders = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    a_rows = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b_rows = orders.filter(F.col("o_orderpriority") == "5-LOW")
    # ONE orders pass per side (r13 opt): the sketch and the exact
    # counts both consume the pinned distinct-key relation — hashing
    # distinct keys yields the identical distinct-hv minset the raw
    # rows did (kmv_minset drops NULLs and re-distincts), and unpinned
    # the sketch + intersect + two counts re-scanned orders 6x.
    ca = a_rows.select("o_custkey").distinct().localCheckpoint(eager=False)
    cb = b_rows.select("o_custkey").distinct().localCheckpoint(eager=False)
    est = kmv_set_estimates(
        kmv_minset(ca, "o_custkey", k=_KMV_K),
        kmv_minset(cb, "o_custkey", k=_KMV_K),
        k=_KMV_K,
    )
    exact = (
        ca.intersect(cb)
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
        .crossJoin(F.broadcast(ca.agg(F.count(F.lit(1)).alias("exact_a"))))
        .crossJoin(F.broadcast(cb.agg(F.count(F.lit(1)).alias("exact_b"))))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.round("est_a", 2).alias("est_a"),
        F.round("est_b", 2).alias("est_b"),
        F.round("est_union", 2).alias("est_union"),
        F.round("jaccard", 4).alias("jaccard"),
        F.round("est_intersect", 2).alias("est_intersect"),
        "exact_a",
        "exact_b",
        "exact_intersect",
    )


def _dd_kmv_set(tag: str, prio: str) -> str:
    return f"""
s_{tag} AS (
  SELECT hv FROM (
    SELECT DISTINCT ('0x' || substr(md5('kmv' || '§' || o_custkey::VARCHAR), 1, 15))::BIGINT AS hv
    FROM orders WHERE o_orderpriority = '{prio}'
  ) ORDER BY hv LIMIT {_KMV_K}
),
pt_{tag} AS (SELECT count(*)::BIGINT AS cnt_{tag}, max(hv) AS mk_{tag} FROM s_{tag})"""


def _dd_kmv_est(tag: str) -> str:
    k = _KMV_K
    space = float(1 << 60)
    return (
        f"CASE WHEN cnt_{tag} < {k} THEN cnt_{tag}::DOUBLE "
        f"ELSE {float(k - 1)} * {space} / mk_{tag}::DOUBLE END"
    )


_DD_KMV_OVERLAP = f"""
WITH {_dd_kmv_set("a", "1-URGENT").lstrip()},
{_dd_kmv_set("b", "5-LOW").lstrip()},
m AS (
  SELECT hv FROM (SELECT hv FROM s_a UNION SELECT hv FROM s_b)
  ORDER BY hv LIMIT {_KMV_K}
),
pt_u AS (SELECT count(*)::BIGINT AS cnt_u, max(hv) AS mk_u FROM m),
shared AS (
  SELECT count(*)::BIGINT AS cnt_shared FROM m
  WHERE hv IN (SELECT hv FROM s_a) AND hv IN (SELECT hv FROM s_b)
),
exact AS (
  SELECT
    (SELECT count(DISTINCT o_custkey) FROM orders WHERE o_orderpriority = '1-URGENT')::BIGINT AS exact_a,
    (SELECT count(DISTINCT o_custkey) FROM orders WHERE o_orderpriority = '5-LOW')::BIGINT AS exact_b,
    (SELECT count(*) FROM (
       SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
       INTERSECT
       SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'))::BIGINT AS exact_intersect
)
SELECT round({_dd_kmv_est("a")}, 2) AS est_a,
       round({_dd_kmv_est("b")}, 2) AS est_b,
       round({_dd_kmv_est("u")}, 2) AS est_union,
       round(CASE WHEN cnt_u > 0 THEN cnt_shared::DOUBLE / cnt_u::DOUBLE ELSE 0.0 END, 4) AS jaccard,
       round((CASE WHEN cnt_u > 0 THEN cnt_shared::DOUBLE / cnt_u::DOUBLE ELSE 0.0 END)
             * ({_dd_kmv_est("u")}), 2) AS est_intersect,
       exact_a, exact_b, exact_intersect
FROM pt_a, pt_b, pt_u, shared, exact
"""

_register("sketch_kmv_priority_overlap", _sketch_kmv_overlap, _DD_KMV_OVERLAP)


# ---------------------------------------------------------------------------
# Streaming KMV maintenance (round 8, session 2): the customer-id
# k-minset kept live over a micro-batched order stream.  Union-then-
# truncate is the sketch's exact merge law AND is idempotent (no batch
# stamping needed, unlike the additive count-min/qsketch logs); the
# entry re-appends batch 0's minset deliberately to exercise replay
# absorption inside the gated result.  Oracle: the one-shot batch SQL —
# streaming == batch, bit-for-bit.
# ---------------------------------------------------------------------------


def _stream_kmv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ..operators.sketch import kmv_minset
    from ..streaming.sketch_stream import kmv_read, stream_into_kmv

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_stream_kmv_{tag}_{os.getpid()}")
    src, log, ckpt = (os.path.join(base, d) for d in ("src", "log", "ckpt"))
    shutil.rmtree(base, ignore_errors=True)

    orders.filter(F.col("o_orderkey") % 2 == 0).coalesce(1).write.parquet(f"{src}/f0")
    orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(1).write.parquet(f"{src}/f1")
    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    _drain(stream_into_kmv(stream, log, ckpt, "o_custkey", k=_KMV_K), 120)
    # deliberate replay: batch 0's minset appended a second time — the
    # distinct fold must absorb it (idempotent merge law)
    kmv_minset(
        orders.filter(F.col("o_orderkey") % 2 == 0), "o_custkey", k=_KMV_K
    ).write.mode("append").parquet(log)

    sk = kmv_read(spark, log, k=_KMV_K)
    pt = sk.agg(F.count(F.lit(1)).alias("cnt_s"), F.max("hv").alias("mk_s"))
    est = F.when(F.col("cnt_s") < _KMV_K, F.col("cnt_s").cast("double")).otherwise(
        F.lit(float(_KMV_K - 1)) * F.lit(float(1 << 60)) / F.col("mk_s").cast("double")
    )
    exact = orders.select("o_custkey").distinct().agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    return pt.crossJoin(F.broadcast(exact)).select(
        "exact_distinct", F.round(est, 2).alias("kmv_estimate")
    )


_DD_KMV_REPLAY = f"""
WITH s AS (
  SELECT hv FROM (
    SELECT DISTINCT ('0x' || substr(md5('kmv' || '§' || o_custkey::VARCHAR), 1, 15))::BIGINT AS hv
    FROM orders
  ) ORDER BY hv LIMIT {_KMV_K}
),
pt AS (SELECT count(*)::BIGINT AS cnt_s, max(hv) AS mk_s FROM s),
exact AS (SELECT count(DISTINCT o_custkey)::BIGINT AS exact_distinct FROM orders)
SELECT exact_distinct,
       round(CASE WHEN cnt_s < {_KMV_K} THEN cnt_s::DOUBLE
                  ELSE {float(_KMV_K - 1)} * {float(1 << 60)} / mk_s::DOUBLE END, 2) AS kmv_estimate
FROM pt, exact
"""

_register("stream_kmv_replay", _stream_kmv_replay, _DD_KMV_REPLAY)


# ---------------------------------------------------------------------------
# Grouped KMV sketches (round 8, session 2): distinct customers per
# nation from one pass of per-group k-minsets — the grouped twin of
# sketch_kmv_priority_overlap, mirroring sketch_quantiles_by_nation's
# shape: the window is PARTITIONED by the group key (never a global
# sort), the summary is groups x k rows, and exact twins ride along.
# ---------------------------------------------------------------------------

_KMVG_K = 32


def _sketch_kmv_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    from ..operators.sketch import kmv_hash

    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    keyed = orders.join(F.broadcast(cust), "o_custkey").select(
        "c_nationkey", kmv_hash(F.col("o_custkey")).alias("hv")
    ).distinct()
    w = _W.partitionBy("c_nationkey").orderBy("hv")
    sk = keyed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= _KMVG_K
    )
    pt = sk.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("hv").alias("mk")
    )
    est = F.when(F.col("cnt") < _KMVG_K, F.col("cnt").cast("double")).otherwise(
        F.lit(float(_KMVG_K - 1)) * F.lit(float(1 << 60)) / F.col("mk").cast("double")
    )
    exact = (
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy("c_nationkey")
        .agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    )
    return (
        pt.join(exact, "c_nationkey")
        .select(
            "c_nationkey",
            F.round(est, 2).alias("kmv_estimate"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
        )
    )


_DD_KMV_NATION = f"""
WITH keyed AS (
  SELECT DISTINCT c.c_nationkey,
         ('0x' || substr(md5('kmv' || '§' || o.o_custkey::VARCHAR), 1, 15))::BIGINT AS hv
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
sk AS (
  SELECT c_nationkey, hv,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY hv) AS rn
  FROM keyed
),
pt AS (
  SELECT c_nationkey, count(*)::BIGINT AS cnt, max(hv) AS mk
  FROM sk WHERE rn <= {_KMVG_K} GROUP BY 1
),
exact AS (
  SELECT c.c_nationkey, count(DISTINCT o.o_custkey)::BIGINT AS exact_distinct
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1
)
SELECT pt.c_nationkey,
       round(CASE WHEN cnt < {_KMVG_K} THEN cnt::DOUBLE
                  ELSE {float(_KMVG_K - 1)} * {float(1 << 60)} / mk::DOUBLE END, 2) AS kmv_estimate,
       exact_distinct
FROM pt JOIN exact ON exact.c_nationkey = pt.c_nationkey
"""

_register("sketch_kmv_by_nation", _sketch_kmv_by_nation, _DD_KMV_NATION)


# ---------------------------------------------------------------------------
# Count-min join-size estimation (round 8, session 2): the sketch
# inner product (Alon-Matias-Szegedy / Cormode-Muthukrishnan) — the
# query-planning question "how big is lineitem self-joined on
# l_partkey?" answered from one d x w summary: est = min over rows of
# sum_col cnt^2, a provable OVERestimate of sum_key f^2.  Everything
# is integer (hash counts, squares, mins), so both the sketch and the
# estimate replay bit-exactly; the exact join size rides along and the
# gated overestimate factor documents the sketch's honesty.
# ---------------------------------------------------------------------------


def _sketch_cm_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import countmin_build

    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    sk = countmin_build(li, "l_partkey", depth=_CM_DEPTH, width=_CM_WIDTH)
    est = (
        sk.groupBy("row")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("_ip"))
        .agg(F.min("_ip").cast("long").alias("est_join_size"))
    )
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("exact_join_size"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_join_size",
        "exact_join_size",
        F.round(
            F.col("est_join_size").cast("double") / F.col("exact_join_size").cast("double"),
            4,
        ).alias("overestimate_factor"),
    )


_DD_CM_JOIN_SIZE = f"""
WITH dims AS (SELECT unnest(range(0, {_CM_DEPTH})) AS i),
cells AS (
  SELECT i.i AS row, {_DD_CM_HASH.format(key="l_partkey::VARCHAR", w=_CM_WIDTH)} AS col,
         count(*)::BIGINT AS cnt
  FROM lineitem, dims i
  GROUP BY 1, 2
),
est AS (
  SELECT min(ip)::BIGINT AS est_join_size
  FROM (SELECT row, sum(cnt * cnt) AS ip FROM cells GROUP BY row)
),
exact AS (
  SELECT sum(f * f)::BIGINT AS exact_join_size
  FROM (SELECT l_partkey, count(*)::BIGINT AS f FROM lineitem GROUP BY 1)
)
SELECT est_join_size, exact_join_size,
       round(est_join_size::DOUBLE / exact_join_size::DOUBLE, 4) AS overestimate_factor
FROM est, exact
"""

_register("sketch_countmin_join_size", _sketch_cm_join_size, _DD_CM_JOIN_SIZE)


# ---------------------------------------------------------------------------
# Streaming uniform reservoir (round 10): a fixed-size uniform ROW
# sample of the event stream kept live as a mergeable bottom-k-by-
# hash-priority summary (operators/sketch.py::reservoir_sample).
# Union-then-truncate is idempotent like KMV's, and the entry
# re-appends batch 0's sample deliberately to exercise replay
# absorption.  Oracle: the one-shot batch SQL — the drained stream's
# sample equals the global bottom-k bit-for-bit, which is exactly the
# "distributed reservoir == sequential reservoir" guarantee.
# ---------------------------------------------------------------------------

_RSV_K = 40


def _stream_reservoir_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ..operators.sketch import reservoir_sample
    from ..streaming.sketch_stream import reservoir_read, stream_into_reservoir

    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_rsv_{tag}_{os.getpid()}"
    )
    src, log, ckpt = (os.path.join(base, d) for d in ("src", "log", "ckpt"))
    shutil.rmtree(base, ignore_errors=True)

    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    _drain(
        stream_into_reservoir(
            stream, log, ckpt, "event_id", ["event_id", "user_id", "event_type"],
            k=_RSV_K,
        ),
        120,
    )
    # deliberate replay: batch 0's sample appended a second time — the
    # distinct fold must absorb it (idempotent merge law)
    reservoir_sample(
        ev.filter(F.col("event_id") % 3 == 0), "event_id",
        ["event_id", "user_id", "event_type"], _RSV_K,
    ).write.mode("append").parquet(log)

    return reservoir_read(spark, log, k=_RSV_K).orderBy("hv")


_DD_RSV_REPLAY = f"""
SELECT ('0x' || substr(md5('rsv' || '§' || event_id::VARCHAR), 1, 15))::BIGINT AS hv,
       event_id, user_id, event_type
FROM events
ORDER BY hv
LIMIT {_RSV_K}
"""

_register("stream_reservoir_replay", _stream_reservoir_replay, _DD_RSV_REPLAY)
