# Round-6 scale operators: bloom runtime-filtered semi-join
# (operators/bloomjoin.py) and LLM sequence packing (operators/packing.py).
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    _drain,
    F,
    SparkSession,
    _DD_NORMALIZE,
    _register,
    _t,
    dd_sql,
)

# --------------------------------------------------------------------------
# Bloom-filter runtime semi-join: lineitems of urgent high-value orders.
# The bloom stage is a pure superset pre-filter (broadcast bucket probes,
# zero fact-side exchange); the closing exact LeftSemi makes the result
# bit-identical to the plain IN-subquery the oracle runs — correctness
# can never depend on hash choice, only the shuffle volume does.
# --------------------------------------------------------------------------

_BLOOM_PRIO = "1-URGENT"
_BLOOM_MIN_TOTAL = 150000.0  # ~12-14% of orders at every fixture scale


def _bloom_semi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloomjoin import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == _BLOOM_PRIO)
        & (F.col("o_totalprice") > _BLOOM_MIN_TOTAL)
    )
    hits = bloom_semi_join(li, orders, "l_orderkey", "o_orderkey")
    return (
        hits.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("l_returnflag")
    )


_DD_BLOOM_SEMI = f"""
SELECT l_returnflag,
       count(*)::BIGINT AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_orderkey IN (
    SELECT o_orderkey FROM orders
    WHERE o_orderpriority = '{_BLOOM_PRIO}' AND o_totalprice > {_BLOOM_MIN_TOTAL}
)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

_register("bloom_semi_join_revenue", _bloom_semi_join_revenue, _DD_BLOOM_SEMI)


def _stream_bloom_semi_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming bloom-filter maintenance through the driver gate: the
    build-side keys arrive as 2 micro-batched files, each batch's
    (seed, bucket) rows appended to the bloom log, the drained log
    folded by set union (the filter's exact merge law) and probed
    against the fact table, then closed with the exact semi-join.  The
    final result is provably identical to the one-shot batch join —
    same oracle as bloom_semi_join_revenue — so a streamed filter that
    dropped a true key (the one failure a bloom must never have) fails
    CORRECTNESS instead of hiding."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..operators.bloomjoin import bloom_prefilter_with
    from ..streaming.sketch_stream import bloom_read, stream_into_bloom

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == _BLOOM_PRIO)
        & (F.col("o_totalprice") > _BLOOM_MIN_TOTAL)
    )
    keys = orders.select("o_orderkey")

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_stream_bloom_{tag}_{os.getpid()}")
    src, log, ckpt = (os.path.join(base, d) for d in ("src", "log", "ckpt"))
    shutil.rmtree(base, ignore_errors=True)

    keys.filter(F.col("o_orderkey") % 2 == 0).coalesce(1).write.parquet(f"{src}/f0")
    keys.filter(F.col("o_orderkey") % 2 == 1).coalesce(1).write.parquet(f"{src}/f1")
    stream = (
        spark.readStream.schema(keys.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = stream_into_bloom(stream, log, ckpt, "o_orderkey")
    _drain(q, 120)

    pre = bloom_prefilter_with(li, bloom_read(spark, log), "l_orderkey")
    hits = pre.join(
        keys.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi"
    )
    return (
        hits.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("l_returnflag")
    )


_register("stream_bloom_semi_replay", _stream_bloom_semi_replay, _DD_BLOOM_SEMI)


# --------------------------------------------------------------------------
# LLM sequence packing (concat-and-chunk): which context window each
# document starts in when the whitespace-tokenized corpus is concatenated
# in doc_id order and split into fixed 2048-token windows.  The global
# prefix sum runs on the two-pass global_rank — no unpartitioned window.
# Oracle: DuckDB's single-node running-sum window (legitimate there).
# --------------------------------------------------------------------------

_PACK_BUDGET = 2048


def _pack_concat_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_concat_layout
    from ..operators.textstats import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs).select("doc_id", "ws_tokens")
    layout = pack_concat_layout(toks, budget=_PACK_BUDGET)
    return (
        layout.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs_start"),
            F.sum("ws_tokens").alias("tokens_started"),
            F.sum((F.col("windows_spanned") > 1).cast("long")).alias("n_straddlers"),
        )
        .orderBy("window_id")
    )


_DD_PACK = dd_sql(
    """
WITH n AS (SELECT doc_id, {norm} AS norm FROM documents),
t AS (SELECT doc_id, len(string_split(trim(norm), ' '))::BIGINT AS ws_tokens FROM n),
p AS (
  SELECT doc_id, ws_tokens,
         COALESCE(sum(ws_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS off
  FROM t WHERE ws_tokens > 0
)
SELECT (off // {budget})::BIGINT AS window_id,
       count(*)::BIGINT AS n_docs_start,
       sum(ws_tokens)::BIGINT AS tokens_started,
       sum(CASE WHEN ((off + ws_tokens - 1) // {budget}) > (off // {budget})
                THEN 1 ELSE 0 END)::BIGINT AS n_straddlers
FROM p
GROUP BY 1
ORDER BY window_id
""",
    norm=dd_sql(_DD_NORMALIZE, col="text"),
    budget=_PACK_BUDGET,
)

_register("pack_concat_windows", _pack_concat_windows, _DD_PACK)
