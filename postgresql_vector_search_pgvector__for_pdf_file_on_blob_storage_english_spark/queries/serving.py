# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, Window, _register, _t, knn  # noqa: F401
from .flagship_knn import _DD_STATUS, _derived_status  # noqa: F401
from .ingest_pipeline import (  # noqa: F401
    _DD_QVEC_LIT,
    _E2E_QVEC,
    _EMBED_DIM,
    _dd_embed_cte,
    _synth_pages,
    ingest_pages,
)
# Serving veneer (operators/serving.py): Q6 mock-LLM extract, Q8/S8 SSE
# event stream; plus the remaining status-store surface (S5 upsert, L3).
# ==========================================================================

from ..operators.serving import llm_extract, sse_events  # noqa: E402
from ..operators.status import status_upsert  # noqa: E402


def _search_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical query-path result: ingest docs, embed, top-5 for the
    fixed probe text — id/origntext/fileName/pageNumber like the
    reference's DocumentSummarizer rows."""
    corpus, _ = ingest_pages(_synth_pages(spark, sf_dir), dim=_EMBED_DIM)
    return knn(
        corpus, _E2E_QVEC, k=5, metric="l2", id_col="id",
        payload_cols=["id", "origntext", "fileName", "pageNumber"],
    )


_DD_SEARCH_HITS = f"""
WITH {_dd_embed_cte(_EMBED_DIM)},
dists AS (
  SELECT fileName, pageNumber,
         sqrt(sum((e - ({_DD_QVEC_LIT})[i + 1]) * (e - ({_DD_QVEC_LIT})[i + 1]))) AS dist
  FROM emb GROUP BY fileName, pageNumber
),
hits AS (
  SELECT sha256(d.fileName || '§' || d.pageNumber || '§' || 0) AS id,
         n.norm_text AS origntext, d.fileName, d.pageNumber, d.dist
  FROM dists d JOIN norm_pages n USING (fileName, pageNumber)
  ORDER BY d.dist, id LIMIT 5
)
"""


def _serve_llm(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = _search_hits(spark, sf_dir)
    return llm_extract(hits).select("id", "fileName", "pageNumber", "summary")


_DD_SERVE_LLM = f"""
{_DD_SEARCH_HITS}
SELECT id, fileName, pageNumber,
       CASE WHEN length(origntext) > 80
            THEN substr(origntext, 1, 80) || '...'
            ELSE origntext END AS summary
FROM hits
"""

_register("serve_llm_extract_top5", _serve_llm, _DD_SERVE_LLM)


_SSE_ACCOUNT = "https://account.blob.core.windows.net/pdfs/"


def _serve_sse(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = llm_extract(_search_hits(spark, sf_dir))
    return sse_events(hits, _SSE_ACCOUNT)


_DD_SERVE_SSE = f"""
{_DD_SEARCH_HITS},
summarized AS (
  SELECT *, CASE WHEN length(origntext) > 80
                 THEN substr(origntext, 1, 80) || '...'
                 ELSE origntext END AS summary
  FROM hits
),
esc AS (
  SELECT *,
         replace(replace(fileName, '\\', '\\\\'), '"', '\\"') AS esc_file,
         replace(replace(summary,  '\\', '\\\\'), '"', '\\"') AS esc_summary
  FROM summarized
),
ev AS (
  SELECT id, 1 AS seq,
         '{{"type":"create","id":"' || id || '"}}' AS event_json FROM esc
  UNION ALL
  SELECT id, 2,
         '{{"type":"createLink","id":"' || id || '","link":"{_SSE_ACCOUNT}' || esc_file
         || '#page=' || pageNumber || '","pageNumber":' || pageNumber
         || ',"fileName":"' || esc_file || '"}}' FROM esc
  UNION ALL
  SELECT id, 3,
         '{{"type":"addMessage","id":"' || id || '","content":"'
         || replace(esc_summary, ' ', '<SPECIAL_WHITE_SPACE>') || '"}}' FROM esc
)
SELECT * FROM ev
"""

_register("serve_sse_events", _serve_sse, _DD_SERVE_SSE)


# ---- S5: status upsert (last-write-wins over an event log) ----------------
# Event log derived from documents: every doc gets the 4 happy-path
# transitions at increasing timestamps; every 10th doc gets a late
# FAILED_DB_INSERTION *instead of* COMPLETED — the upsert must resolve
# exactly one terminal row per id.

def _status_event_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        F.sha2(F.col("doc_id").cast("string"), 256).alias("id"),
        F.col("source").alias("fileName"),
        ((F.col("doc_id") % 40) + 1).cast("int").alias("pageNumber"),
        F.col("doc_id"),
    )
    stages = ["PAGE_SEPARATE_FINISHED", "FINISH_OAI_INVOCATION", "FINISH_DB_INSERTION"]
    events = base.select(
        "id", "fileName", "pageNumber", "doc_id",
        F.posexplode(F.array(*[F.lit(s) for s in stages])).alias("step", "status"),
    )
    terminal = base.select(
        "id", "fileName", "pageNumber", "doc_id",
        F.lit(3).alias("step"),
        F.when(F.col("doc_id") % 10 == 0, F.lit("FAILED_DB_INSERTION"))
        .otherwise(F.lit("COMPLETED")).alias("status"),
    )
    all_events = events.unionByName(terminal)
    return all_events.select(
        "id", "fileName", "status", "pageNumber",
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") * 10 + F.col("step")).alias("updated_at"),
    )


def _s5_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    resolved = status_upsert(_status_event_log(spark, sf_dir))
    return resolved.select(
        "id", "fileName", "status", "pageNumber",
        F.date_format("updated_at", "yyyy-MM-dd HH:mm:ss").alias("updated_at"),
    )


_DD_S5 = """
WITH base AS (
  SELECT sha256(doc_id::VARCHAR) AS id, source AS fileName,
         ((doc_id % 40) + 1)::INT AS pageNumber, doc_id
  FROM documents
),
log AS (
  SELECT id, fileName, s.status, pageNumber, doc_id, s.step FROM base,
  (VALUES ('PAGE_SEPARATE_FINISHED', 0), ('FINISH_OAI_INVOCATION', 1),
          ('FINISH_DB_INSERTION', 2)) s(status, step)
  UNION ALL
  SELECT id, fileName,
         CASE WHEN doc_id % 10 = 0 THEN 'FAILED_DB_INSERTION' ELSE 'COMPLETED' END,
         pageNumber, doc_id, 3
  FROM base
)
SELECT id, fileName, status, pageNumber,
       strftime(to_timestamp(1700000000 + doc_id * 10 + step), '%Y-%m-%d %H:%M:%S') AS updated_at
FROM log
QUALIFY row_number() OVER (PARTITION BY id ORDER BY step DESC) = 1
"""

_register("s5_status_upsert", _s5_upsert, _DD_S5)


def _status_progress_by_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-file ingestion dashboard the reference's status listings
    imply but never aggregate (PDF-Summarizer CosmosDBUtil.java:43-68
    lists raw rows): resolved chunk counts per fileName by terminal
    status, plus completion fraction — one upsert resolution + one
    aggregate."""
    resolved = status_upsert(_status_event_log(spark, sf_dir))
    return resolved.groupBy("fileName").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("status") == "COMPLETED").cast("long")).alias("n_completed"),
        F.sum((F.col("status") == "FAILED_DB_INSERTION").cast("long")).alias("n_failed"),
        F.round(
            F.avg((F.col("status") == "COMPLETED").cast("double")), 4
        ).alias("frac_completed"),
    )


_register(
    "status_progress_by_file",
    _status_progress_by_file,
    """
WITH base AS (
  SELECT sha256(doc_id::VARCHAR) AS id, source AS fileName, doc_id FROM documents
),
term AS (
  SELECT id, fileName,
         CASE WHEN doc_id % 10 = 0 THEN 'FAILED_DB_INSERTION' ELSE 'COMPLETED' END AS status
  FROM base
)
SELECT fileName, count(*) AS n_chunks,
       CAST(sum(CASE WHEN status = 'COMPLETED' THEN 1 ELSE 0 END) AS BIGINT) AS n_completed,
       CAST(sum(CASE WHEN status = 'FAILED_DB_INSERTION' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
       round(avg(CASE WHEN status = 'COMPLETED' THEN 1.0 ELSE 0.0 END), 4) AS frac_completed
FROM term GROUP BY fileName
""",
)


def _status_transition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process mining over the reference's status state machine
    (models/CosmosDBDocumentStatus.java:5-10): (from -> to) transition
    counts from the event log via a lag window per chunk — the view
    that catches a pipeline wedged mid-state (e.g. chunks stuck after
    FINISH_OAI_INVOCATION).  One keyed window; '<start>' marks each
    chunk's first event."""
    log = _status_event_log(spark, sf_dir)
    w = Window.partitionBy("id").orderBy("updated_at")
    return (
        log.withColumn(
            "from_status", F.coalesce(F.lag("status").over(w), F.lit("<start>"))
        )
        .groupBy("from_status", F.col("status").alias("to_status"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_register(
    "status_transition_stats",
    _status_transition_stats,
    """
WITH base AS (
  SELECT sha256(doc_id::VARCHAR) AS id, doc_id FROM documents
),
log AS (
  SELECT id, s.status, doc_id, s.step FROM base,
  (VALUES ('PAGE_SEPARATE_FINISHED', 0), ('FINISH_OAI_INVOCATION', 1),
          ('FINISH_DB_INSERTION', 2)) s(status, step)
  UNION ALL
  SELECT id,
         CASE WHEN doc_id % 10 = 0 THEN 'FAILED_DB_INSERTION' ELSE 'COMPLETED' END,
         doc_id, 3
  FROM base
),
seq AS (
  SELECT id, status,
         coalesce(lag(status) OVER (PARTITION BY id ORDER BY step), '<start>') AS from_status
  FROM log
)
SELECT from_status, status AS to_status, count(*) AS n
FROM seq GROUP BY 1, 2
""",
)


def _l3_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _derived_status(spark, sf_dir)


_register("l3_status_dump", _l3_dump, _DD_STATUS)


# ==========================================================================
