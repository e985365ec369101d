# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _DD_NORMALIZE,
    _register,
    _t,
    dd_sql,
    knn,
)
# Ingestion pipeline slices (sources/pdf.py + operators/ingest.py), each
# oracle-checked.  The "files" are synthesized deterministically from
# `documents` on both sides: one file per `source`, pages = that source's
# docs in doc_id order, joined with \f (the binary test page format) —
# so the real binary->pages->chunks->embed plumbing runs under the gate.
# ==========================================================================

from ..functions.embed import hash_embed_text  # noqa: E402
from ..operators.ingest import ingest_pages, pages_to_chunks  # noqa: E402
from ..sources.pdf import PAGE_SEP, extract_pages  # noqa: E402

_EMBED_DIM = 64


def _synth_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fileName, content binary) — one 'pdf' per documents.source."""
    docs = _t(spark, sf_dir, "documents")
    files = docs.groupBy("source").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "text"))).alias("_ps")
    )
    payload = F.array_join(F.transform("_ps", lambda s: s["text"]), PAGE_SEP)
    return files.select(
        F.col("source").alias("fileName"), F.encode(payload, "UTF-8").alias("content")
    )


def _synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the real extraction UDTF over the synthesized binaries."""
    paged = extract_pages(_synth_binary_files(spark, sf_dir))
    return paged.select(
        "fileName", F.posexplode_outer("pages").alias("_pos", "page")
    ).select(
        "fileName",
        F.col("page.pageNumber").alias("pageNumber"),
        F.col("page.text").alias("text"),
    )


_DD_PAGES = """
SELECT source AS fileName,
       (row_number() OVER (PARTITION BY source ORDER BY doc_id))::INT AS pageNumber,
       text
FROM documents
"""


def _pipeline_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _synth_pages(spark, sf_dir)


_register("pipeline_pages_from_binary", _pipeline_pages, _DD_PAGES)


def _synth_real_pdf_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fileName, content binary) — one REAL ``%PDF`` file per
    ``documents.source``, built with the deterministic writer
    (:func:`..sources.pdfcodec.make_pdf`); pages = that source's docs in
    doc_id order.  Unlike :func:`_synth_binary_files` (the ``\\f`` page
    format), decoding these exercises the full PDF codec: xref loading,
    FlateDecode, page-tree walk, and the text-operator interpreter."""
    from ..sources.pdfcodec import make_pdf  # noqa: PLC0415

    docs = _t(spark, sf_dir, "documents")
    files = docs.groupBy("source").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "text"))).alias("_ps")
    )
    _mk_pdf = F.pandas_udf(
        lambda pages: pages.map(lambda ps: make_pdf(list(ps))), "binary"
    )

    return files.select(
        F.col("source").alias("fileName"),
        _mk_pdf(F.transform("_ps", lambda s: s["text"])).alias("content"),
    )


def _pipeline_pages_real_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``%PDF`` branch of P1 under the oracle gate (VERDICT r2 item 1):
    encode documents into real PDFs, decode through ``extract_pages`` —
    whose ``%PDF`` magic dispatch runs ``pdfcodec.extract_text_pdf``
    (Function.java:92-134's front door) — and hash-match the per-page text
    against the same documents-derived SQL as the ``\\f`` twin."""
    paged = extract_pages(_synth_real_pdf_files(spark, sf_dir))
    return paged.select(
        "fileName", F.posexplode_outer("pages").alias("_pos", "page")
    ).select(
        "fileName",
        F.col("page.pageNumber").alias("pageNumber"),
        F.col("page.text").alias("text"),
    )


_register("pipeline_pages_from_real_pdf", _pipeline_pages_real_pdf, _DD_PAGES)


def _pipeline_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pages_to_chunks(_synth_pages(spark, sf_dir))


# Fixture pages are < 7500 chars -> exactly one chunk per page, text =
# normalized page text, id = sha256(fileName § pageNumber § 0).
_DD_PIPELINE_CHUNKS = f"""
WITH pages AS ({_DD_PAGES})
SELECT sha256(fileName || '§' || pageNumber || '§' || 0) AS id,
       {dd_sql(_DD_NORMALIZE, col="text")} AS origntext,
       fileName, pageNumber, 0 AS chunk_index
FROM pages
"""

_register("pipeline_chunks", _pipeline_chunks, _DD_PIPELINE_CHUNKS)


# ---- full SQL replay of the deterministic hash-embedder -------------------
# hash_embed_text (functions/embed.py): token -> md5 first 8 bytes as
# uint64 -> slot = h % dim, sign = bit63 ? +1 : -1; accumulate; L2
# normalize; cast float32.  All steps are integer-or-IEEE-exact, so
# DuckDB replays them bit-for-bit.

def _dd_embed_cte(dim: int) -> str:
    return f"""
pages AS ({_DD_PAGES}),
norm_pages AS (
  SELECT fileName, pageNumber, {dd_sql(_DD_NORMALIZE, col="text")} AS norm_text FROM pages
),
toks AS (
  SELECT fileName, pageNumber, tok
  FROM norm_pages, unnest(string_split(trim(norm_text), ' ')) AS t(tok)
  WHERE tok != ''
),
slots AS (
  SELECT fileName, pageNumber,
         (('0x' || substr(md5(tok), 1, 16))::UBIGINT % {dim})::INT AS slot,
         (CASE WHEN (('0x' || substr(md5(tok), 1, 16))::UBIGINT >> 63) = 1
               THEN 1.0 ELSE -1.0 END) AS sign
  FROM toks
),
slot_sums AS (
  SELECT fileName, pageNumber, slot, sum(sign) AS v
  FROM slots GROUP BY 1, 2, 3
),
grid AS (
  SELECT p.fileName, p.pageNumber, i.i::INT AS i
  FROM norm_pages p CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) i
),
comp AS (
  SELECT g.fileName, g.pageNumber, g.i, coalesce(s.v, 0.0) AS v
  FROM grid g LEFT JOIN slot_sums s
    ON g.fileName = s.fileName AND g.pageNumber = s.pageNumber AND g.i = s.slot
),
norms AS (
  SELECT fileName, pageNumber, sqrt(sum(v * v)) AS nrm FROM comp GROUP BY 1, 2
),
emb AS (
  SELECT c.fileName, c.pageNumber, c.i,
         (CASE WHEN n.nrm > 0 THEN (c.v / n.nrm)::FLOAT ELSE 0.0::FLOAT END)::DOUBLE AS e
  FROM comp c JOIN norms n USING (fileName, pageNumber)
)
"""


def _pipeline_embed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, _status = ingest_pages(_synth_pages(spark, sf_dir), dim=_EMBED_DIM)
    e = F.col("embedding")
    comp_sum = F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    l2 = F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return corpus.select(
        "fileName",
        "pageNumber",
        F.size(e).alias("dim"),
        F.size(F.filter(e, lambda x: x != 0)).cast("long").alias("n_nonzero"),
        # + 0.0 canonicalizes IEEE negative zero (engines disagree on
        # whether round() preserves it, and the driver hashes the text form)
        (F.round(comp_sum, 4) + F.lit(0.0)).alias("comp_sum"),
        F.round(l2, 4).alias("l2_norm"),
    )


_DD_EMBED_STATS = f"""
WITH {_dd_embed_cte(_EMBED_DIM)}
SELECT fileName, pageNumber, {_EMBED_DIM} AS dim,
       sum(CASE WHEN e != 0 THEN 1 ELSE 0 END)::BIGINT AS n_nonzero,
       round(sum(e), 4) + 0.0 AS comp_sum,
       round(sqrt(sum(e * e)), 4) AS l2_norm
FROM emb
GROUP BY fileName, pageNumber
"""

_register("pipeline_embed_stats", _pipeline_embed_stats, _DD_EMBED_STATS)


# ---- end-to-end: ingest -> embed -> flagship KNN, fully oracle-checked ----

_E2E_QUERY_TEXT = "synthetic vector search query"
_E2E_QVEC = hash_embed_text(_E2E_QUERY_TEXT, _EMBED_DIM)


def _pipeline_e2e_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, _status = ingest_pages(_synth_pages(spark, sf_dir), dim=_EMBED_DIM)
    out = knn(
        corpus, _E2E_QVEC, k=5, metric="l2", id_col="id",
        payload_cols=["id", "fileName", "pageNumber"],
    )
    return out.select("id", "fileName", "pageNumber", F.round("distance", 4).alias("distance"))


_DD_QVEC_LIT = "[" + ", ".join(repr(float(x)) for x in _E2E_QVEC) + "]"

_DD_E2E_KNN = f"""
WITH {_dd_embed_cte(_EMBED_DIM)},
dists AS (
  SELECT fileName, pageNumber,
         sqrt(sum((e - ({_DD_QVEC_LIT})[i + 1]) * (e - ({_DD_QVEC_LIT})[i + 1]))) AS dist
  FROM emb
  GROUP BY fileName, pageNumber
)
SELECT sha256(fileName || '§' || pageNumber || '§' || 0) AS id,
       fileName, pageNumber, round(dist, 4) AS distance
FROM dists
ORDER BY dist, id
LIMIT 5
"""

_register("pipeline_e2e_ingest_knn", _pipeline_e2e_knn, _DD_E2E_KNN)


# ==========================================================================


# ---- small-to-big retrieval: context expansion around each hit -------------
# The reference prompts the LLM with the single matched chunk's text
# (SSEOpenAIController.java:151-155).  The standard RAG refinement keeps
# the SMALL retrieval unit but serves the hit stitched with its physical
# neighbors; operators/serving.py::expand_context is the set-oriented
# form (broadcast wanted-page join -> grouped ordered stitch).

def _serve_context_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.serving import expand_context

    corpus, _status = ingest_pages(_synth_pages(spark, sf_dir), dim=_EMBED_DIM)
    # corpus feeds the KNN hit subtree AND the expansion's neighbor
    # scan; as a plain branch each side re-ran the whole Python ingest
    # chain (chunk UDTF + Arrow embed) — pin it so the JVM<->Python
    # boundary is paid once (r13 opt, guide §4).
    corpus = corpus.localCheckpoint(eager=False)
    hits = knn(
        corpus, _E2E_QVEC, k=5, metric="l2", id_col="id",
        payload_cols=["id", "fileName", "pageNumber"],
    ).select("fileName", "pageNumber", F.round("distance", 4).alias("distance"))
    return expand_context(hits, corpus, window=1)


_DD_CONTEXT_EXPANSION = f"""
WITH {_dd_embed_cte(_EMBED_DIM)},
dists AS (
  SELECT fileName, pageNumber,
         sqrt(sum((e - ({_DD_QVEC_LIT})[i + 1]) * (e - ({_DD_QVEC_LIT})[i + 1]))) AS dist
  FROM emb
  GROUP BY fileName, pageNumber
),
hits AS (
  SELECT fileName, pageNumber, round(dist, 4) AS distance
  FROM dists
  ORDER BY dist, sha256(fileName || '§' || pageNumber || '§' || 0)
  LIMIT 5
),
parts AS (
  SELECT h.fileName, h.pageNumber, h.distance,
         p.pageNumber AS cp, p.norm_text AS ct
  FROM hits h
  JOIN norm_pages p
    ON p.fileName = h.fileName
   AND p.pageNumber BETWEEN h.pageNumber - 1 AND h.pageNumber + 1
)
SELECT fileName, pageNumber, distance,
       count(*)::INT AS n_parts,
       string_agg(ct, chr(10) || chr(10) ORDER BY cp) AS context
FROM parts
GROUP BY fileName, pageNumber, distance
"""

_register("serve_context_expansion", _serve_context_expansion, _DD_CONTEXT_EXPANSION)
