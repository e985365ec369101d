# Round-6 scale operators: bloom runtime-filtered semi-join
# (operators/bloomjoin.py) and LLM sequence packing (operators/packing.py).
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
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
