# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _DD_NORMALIZE, _register, dd_sql  # noqa: F401
from .ingest_pipeline import (  # noqa: F401
    _DD_PAGES,
    _E2E_QUERY_TEXT,
    _EMBED_DIM,
    _synth_pages,
    pages_to_chunks,
)
# P7 — token-usage accounting (Function.java:194-196: per-call token
# logging becomes a per-file metrics relation) and Q1 — query-text
# embedding (SSEOpenAIController.java:302-308: the same embedder applied
# to a 1-row relation, the real query path).
# ==========================================================================

def _p7_token_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = pages_to_chunks(_synth_pages(spark, sf_dir))
    tokens = F.size(F.split(F.trim(F.col("origntext")), " "))
    return (
        chunks.withColumn("_toks", tokens)
        .groupBy("fileName")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("_toks").cast("long").alias("total_tokens"),
            F.sum(F.length("origntext")).cast("long").alias("total_chars"),
        )
    )


_DD_P7 = f"""
WITH pages AS ({_DD_PAGES}),
chunks AS (
  SELECT fileName, {dd_sql(_DD_NORMALIZE, col="text")} AS origntext FROM pages
)
SELECT fileName, count(*) AS n_chunks,
       sum(len(string_split(trim(origntext), ' ')))::BIGINT AS total_tokens,
       sum(length(origntext))::BIGINT AS total_chars
FROM chunks GROUP BY fileName
"""

_register("p7_token_usage", _p7_token_usage, _DD_P7)


def _q1_query_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embed one query text through the actual UDF path (1-row relation,
    like the reference's findMostSimilarString prologue)."""
    from ..operators.ingest import embed_chunks

    one = spark.createDataFrame([(_E2E_QUERY_TEXT,)], "query_text string")
    embedded = embed_chunks(one, dim=_EMBED_DIM, text_col="query_text")
    e = F.col("embedding")
    return embedded.select(
        F.lit(_E2E_QUERY_TEXT).alias("query_text"),
        F.size(e).alias("dim"),
        F.size(F.filter(e, lambda x: x != 0)).cast("long").alias("n_nonzero"),
        (F.round(F.aggregate(e, F.lit(0.0), lambda a, x: a + x.cast("double")), 4) + F.lit(0.0)).alias("comp_sum"),
        F.round(
            F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))), 4
        ).alias("l2_norm"),
    )


_DD_Q1 = f"""
WITH toks AS (
  SELECT tok FROM unnest(string_split(trim('{_E2E_QUERY_TEXT}'), ' ')) AS t(tok) WHERE tok != ''
),
slot_sums AS (
  SELECT (('0x' || substr(md5(tok), 1, 16))::UBIGINT % {_EMBED_DIM})::INT AS slot,
         sum(CASE WHEN (('0x' || substr(md5(tok), 1, 16))::UBIGINT >> 63) = 1
                  THEN 1.0 ELSE -1.0 END) AS v
  FROM toks GROUP BY 1
),
comp AS (
  SELECT i.i::INT AS i, coalesce(s.v, 0.0) AS v
  FROM (SELECT unnest(range(0, {_EMBED_DIM})) AS i) i LEFT JOIN slot_sums s ON i.i = s.slot
),
nrm AS (SELECT sqrt(sum(v * v)) AS nrm FROM comp),
emb AS (
  SELECT c.i, (CASE WHEN n.nrm > 0 THEN (c.v / n.nrm)::FLOAT ELSE 0.0::FLOAT END)::DOUBLE AS e
  FROM comp c, nrm n
)
SELECT '{_E2E_QUERY_TEXT}' AS query_text, {_EMBED_DIM} AS dim,
       sum(CASE WHEN e != 0 THEN 1 ELSE 0 END)::BIGINT AS n_nonzero,
       round(sum(e), 4) + 0.0 AS comp_sum,
       round(sqrt(sum(e * e)), 4) AS l2_norm
FROM emb
"""

_register("q1_query_embedding", _q1_query_embedding, _DD_Q1)


# ==========================================================================
