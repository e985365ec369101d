# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    _DD_NORMALIZE,
    _register,
    _t,
    dd_sql,
    normalize_whitespace_col,
)
# Training export (round 5) — deterministic global shuffle into shard
# files and token-budget selection (operators/export.py).
# ==========================================================================

from ..operators.export import (  # noqa: E402
    shard_assign,
    shard_export_write,
    token_budget_select,
)

_N_SHARDS = 8
_DD_SHARD_HASH = "('0x' || substr(md5('shard' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT"

_DD_SHARD_STATS = f"""
WITH a AS (SELECT doc_id, {_DD_SHARD_HASH} AS h FROM documents)
SELECT (h % {_N_SHARDS})::INT AS shard, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids, min(h) AS min_key, max(h) AS max_key
FROM a GROUP BY 1
"""


def _shard_stats(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("sum_ids"),
            F.min("sort_key").alias("min_key"),
            F.max("sort_key").alias("max_key"),
        )
        .orderBy("shard")
    )


def _train_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard assignment alone (zero-shuffle projection): membership and
    intra-shard key ranges are pure functions of the stable hash."""
    docs = _t(spark, sf_dir, "documents")
    return _shard_stats(shard_assign(docs, n_shards=_N_SHARDS))


_register("train_shard_stats", _train_shard_stats, _DD_SHARD_STATS)


def _train_shard_export_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full writer path: shuffle-on-shard + partition-local sort +
    hive-partitioned write, then read the artifact back — same stats as
    the in-memory assignment, proving the export round-trips."""
    import hashlib
    import os
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_shards_{tag}")
    shard_export_write(docs, path, n_shards=_N_SHARDS)
    back = spark.read.parquet(path).withColumn("shard", F.col("shard").cast("int"))
    return _shard_stats(back)


_register("train_shard_export_read", _train_shard_export_read, _DD_SHARD_STATS)


_TOKEN_BUDGET = 12_000


def _train_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a 12k-token budget in stable-hash order — ~43% of the
    ~28k-token corpus at sf0.001/sf0.01 and ~4% at sf0.1, so the cut is
    partial (non-vacuous) at every fixture scale."""
    docs = _t(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        F.size(F.split(F.trim(normalize_whitespace_col("text")), " ")).alias(
            "n_tokens"
        ),
    )
    out = token_budget_select(with_tokens, budget=_TOKEN_BUDGET)
    return out.select("doc_id", "n_tokens")


_register(
    "train_token_budget_select",
    _train_token_budget,
    dd_sql(
        f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(trim({{norm}}), ' ')) AS n_tokens,
         ('0x' || substr(md5('budget' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM documents
)
SELECT doc_id, n_tokens FROM (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS before
  FROM t
) WHERE before < {_TOKEN_BUDGET}
""",
        norm=dd_sql(_DD_NORMALIZE, col="text"),
    ),
)


# ==========================================================================


# ---- rendezvous (HRW) sharding + elastic-resize churn (round 8) -----------
# operators/export.py::hrw_shard_assign / hrw_resize_churn.  Modulo
# sharding moves ~(1 - 1/n) of all rows on any resize; HRW moves only
# the rows whose argmax lands in the added shards — expected
# 1 - n_before/n_after for a nested grow.  The entry gates BOTH
# counters on the same relation so the contrast is in the record.

_HRW_BEFORE, _HRW_AFTER = 8, 10


def _train_shard_hrw_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.export import hrw_resize_churn

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return hrw_resize_churn(docs, _HRW_BEFORE, _HRW_AFTER, id_col="doc_id")


def _dd_hrw(n: int, alias: str) -> str:
    return f"""{alias} AS (
  SELECT doc_id, s AS {alias}_s
  FROM (
    SELECT d.doc_id, s.s,
           ('0x' || substr(md5('hrw' || '§' || s.s::VARCHAR || '§' || d.doc_id::VARCHAR), 1, 8))::BIGINT AS w
    FROM documents d, (SELECT unnest(range(0, {n})) AS s) s
  )
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) = 1
)"""


_DD_HRW_CHURN = f"""
WITH {_dd_hrw(_HRW_BEFORE, "hb")},
{_dd_hrw(_HRW_AFTER, "ha").lstrip()},
modh AS (
  SELECT doc_id, {_DD_SHARD_HASH} AS h FROM documents
)
SELECT hb.hb_s AS shard_before,
       ha.ha_s AS shard_after,
       count(*)::BIGINT AS n_rows,
       sum(CASE WHEN hb.hb_s != ha.ha_s THEN 1 ELSE 0 END)::BIGINT AS n_moved_hrw,
       sum(CASE WHEN (m.h % {_HRW_BEFORE}) != (m.h % {_HRW_AFTER}) THEN 1 ELSE 0 END)::BIGINT AS n_moved_mod
FROM hb JOIN ha USING (doc_id) JOIN modh m USING (doc_id)
GROUP BY 1, 2
"""

_register("train_shard_hrw_churn", _train_shard_hrw_churn, _DD_HRW_CHURN)


# --------------------------------------------------------------------------
# Hash-ranked negative sampling (round 8, session 2): per user, the N
# catalog items they did NOT buy, drawn by deterministic hash rank —
# the implicit-feedback recommender-training staple (BPR/ALS negative
# draws), in the engine-wide salted-md5 discipline so resamples are
# reproducible and the oracle replays exactly.  Scale shape: the item
# CATALOG is the broadcast side (catalogs are bounded; corpora are
# not), candidate generation is users x catalog with the positive set
# removed by a keyed anti join, and the per-user top-N is a window over
# the user key.  The entry caps the report slice to custkey < 20;
# the negative pool per user is the full catalog.
# --------------------------------------------------------------------------

_NEG_PER_USER = 5
_NEG_USER_CAP = 20


def _train_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import stable_hash60

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    users = orders.filter(F.col("o_custkey") < _NEG_USER_CAP).select(
        F.col("o_custkey").alias("user_id")
    ).distinct()
    items = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("item_id"))
    positives = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .distinct()
    )
    cand = users.join(F.broadcast(items), how="cross").join(
        positives, ["user_id", "item_id"], "left_anti"
    )
    hv = stable_hash60(
        F.concat_ws("§", F.lit("negsample"), F.col("user_id"), F.col("item_id"))
    )
    w = Window.partitionBy("user_id").orderBy(hv, "item_id")
    return (
        cand.withColumn("draw", F.row_number().over(w))
        .filter(F.col("draw") <= _NEG_PER_USER)
        .select("user_id", "draw", "item_id")
    )


_register(
    "train_negative_samples",
    _train_negative_samples,
    f"""
WITH users AS (
  SELECT DISTINCT o_custkey AS user_id FROM orders WHERE o_custkey < {_NEG_USER_CAP}
),
positives AS (
  SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
cand AS (
  SELECT u.user_id, p.p_partkey AS item_id
  FROM users u CROSS JOIN part p
  WHERE NOT EXISTS (
    SELECT 1 FROM positives x
    WHERE x.user_id = u.user_id AND x.item_id = p.p_partkey)
),
ranked AS (
  SELECT user_id, item_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY ('0x' || substr(md5('negsample' || '§' || user_id::VARCHAR
                       || '§' || item_id::VARCHAR), 1, 15))::BIGINT,
                    item_id) AS draw
  FROM cand
)
SELECT user_id, draw, item_id FROM ranked WHERE draw <= {_NEG_PER_USER}
""",
)


# --------------------------------------------------------------------------
# Feature hashing (round 8, session 2): the hashing trick (Weinberger
# et al. 2009) — each document's tokens fold into a fixed-width count
# vector by hash bucket, no vocabulary table, no fit step: the
# representation a streaming classifier uses when the vocab is unbounded.
# Pure relational: explode -> bucket = hash % width -> count groupBy ->
# dense reassembly via an ordered collect over the BOUNDED width.  The
# gated output keeps the sparse (doc, bucket, cnt) form plus the doc's
# l2 norm over exact integer counts.
# --------------------------------------------------------------------------

_FH_WIDTH = 32
_FH_DOC_CAP = 40


def _feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import stable_hash60
    from ..operators.retrieval import tokenize

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < _FH_DOC_CAP)
    toks = tokenize(docs)
    bucketed = toks.select(
        "doc_id",
        (stable_hash60(F.concat_ws("§", F.lit("feathash"), F.col("term"))) % _FH_WIDTH)
        .cast("int")
        .alias("bucket"),
    )
    counts = bucketed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_norm = Window.partitionBy("doc_id")
    return counts.select(
        "doc_id",
        "bucket",
        "cnt",
        F.round(F.sqrt(F.sum(F.col("cnt") * F.col("cnt")).over(w_norm).cast("double")), 4).alias("l2_norm"),
    )


_register(
    "ml_feature_hashing",
    _feature_hashing,
    dd_sql(
        f"""
WITH toks AS (
  SELECT doc_id, u.term
  FROM (SELECT doc_id, {{norm}} AS norm FROM documents WHERE doc_id < {_FH_DOC_CAP}),
       unnest(string_split(trim(norm), ' ')) AS u(term)
  WHERE u.term != ''
),
counts AS (
  SELECT doc_id,
         (('0x' || substr(md5('feathash' || '§' || term), 1, 15))::BIGINT % {_FH_WIDTH})::INT AS bucket,
         count(*)::BIGINT AS cnt
  FROM toks GROUP BY 1, 2
)
SELECT doc_id, bucket, cnt,
       round(sqrt(sum(cnt * cnt) OVER (PARTITION BY doc_id)::DOUBLE), 4) AS l2_norm
FROM counts
""",
        norm=dd_sql(_DD_NORMALIZE, col="text"),
    ),
)
