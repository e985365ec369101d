# ==========================================================================
# Round 9 — data-selection, privacy, retrieval and dedup breadth:
#
#   * train_dsir_select            — DSIR importance resampling (hashed
#                                    n-gram features, integer micro-nat
#                                    log ratios, deterministic top-k).
#   * retrieval_phrase_match       — exact phrase search over positional
#                                    postings (per-word pushed filters,
#                                    (doc, anchor)-keyed joins).
#   * dedup_incremental_new_batch  — new-batch admission dedup against an
#                                    existing corpus (the daily-drop
#                                    primitive; hashes only cross the
#                                    exchange).
#   * dedup_ngram_containment_pairs — asymmetric doc-inside-doc detection
#                                    (Broder containment vs resemblance).
#   * privacy_k_anonymity_audit    — QI group-size audit per k.
#   * privacy_l_diversity_audit    — sensitive-value diversity per l.
#
# Scale notes: DSIR's two passes exchange (bucket) partials and
# (doc, bucket) counts — never text; phrase match's join inputs are
# single-term postings; the incremental dedup semi-join ships 16-byte
# hashes; the privacy audits aggregate the GROUP relation, bounded by
# distinct QI combinations.
# ==========================================================================
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
from .dedup import _DD_NEARDUP_CORPUS, _dd_shingles, _neardup_corpus

# --------------------------------------------------------------------------
# 1. DSIR importance resampling (operators/dsir.py)
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_K = 20


def _dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the 20 documents whose hashed-unigram importance ratio
    toward the English-language target domain is highest — the DSIR
    selection a mixture builder feeds to training."""
    from ..operators.dsir import dsir_select

    docs = _t(spark, sf_dir, "documents")
    return dsir_select(
        docs, F.col("lang") == "en", k=_DSIR_K, n_buckets=_DSIR_BUCKETS
    )


_DD_DSIR = f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS tgt, lower(w) AS term
  FROM (SELECT doc_id, lang, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents),
       unnest(string_split(trim(norm), ' ')) AS t(w)
  WHERE w != ''
),
bucketed AS (
  SELECT doc_id, tgt,
         (('0x' || substr(md5(term), 1, 8))::BIGINT) % {_DSIR_BUCKETS} AS bucket
  FROM toks
),
counts AS (
  SELECT bucket,
         sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS t_cnt,
         count(*) AS r_cnt
  FROM bucketed GROUP BY 1
),
tot AS (SELECT sum(t_cnt) AS t_tot, sum(r_cnt) AS r_tot FROM counts),
wts AS (
  SELECT bucket,
         CAST(floor((ln((t_cnt + 1)::DOUBLE / (t_tot + {_DSIR_BUCKETS})::DOUBLE)
                   - ln((r_cnt + 1)::DOUBLE / (r_tot + {_DSIR_BUCKETS})::DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS weight_micro
  FROM counts, tot
),
per_doc AS (SELECT doc_id, bucket, count(*) AS cnt FROM bucketed GROUP BY 1, 2),
scores AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(sum(cnt * weight_micro) AS BIGINT) AS score_micro
  FROM per_doc JOIN wts USING (bucket)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens, score_micro FROM scores
ORDER BY score_micro DESC, doc_id
LIMIT {_DSIR_K}
"""

_register("train_dsir_select", _dsir_select, _DD_DSIR)

_DSIR_BUDGET = 5_000  # tokens


def _dsir_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection composed with the token-budget cut: walk
    documents in importance order (score desc, id) and keep each doc
    whose inclusion STARTS below the budget — 'cut the best N tokens
    for the target domain', the step after scoring in a DSIR pipeline.
    The prefix sum is the two-pass global_rank (range repartition +
    partitioned running sum), never a single-partition window."""
    from ..operators.dsir import dsir_bucket_weights, dsir_scores
    from ..operators.ranking import global_rank

    docs = _t(spark, sf_dir, "documents")
    weights = dsir_bucket_weights(
        docs, F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
    )
    scores = dsir_scores(docs, weights, n_buckets=_DSIR_BUCKETS)
    ranked = global_rank(
        scores,
        [F.col("score_micro").desc(), F.col("doc_id").asc()],
        prefix_col="n_tokens",
    )
    return ranked.filter(F.col("_before") < _DSIR_BUDGET).select(
        "doc_id", "n_tokens", "score_micro"
    )


_DD_DSIR_BUDGET = _DD_DSIR[: _DD_DSIR.rindex("SELECT doc_id, n_tokens")] + f"""
SELECT doc_id, n_tokens, score_micro FROM (
  SELECT *,
         coalesce(sum(n_tokens) OVER (
           ORDER BY score_micro DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _before
  FROM scores
)
WHERE _before < {_DSIR_BUDGET}
"""

_register("train_dsir_token_budget", _dsir_token_budget, _DD_DSIR_BUDGET)


# --------------------------------------------------------------------------
# 2. Phrase search over positional postings (operators/retrieval.py)
# --------------------------------------------------------------------------

_PHRASE = ["hash", "value"]


def _phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top documents by exact occurrences of the consecutive phrase
    "hash value" — positional-postings intersection, ranked
    (n_matches desc, doc_id), top 20."""
    from ..operators.retrieval import phrase_match

    docs = _t(spark, sf_dir, "documents")
    out = phrase_match(docs, _PHRASE)
    return out.orderBy(F.col("n_matches").desc(), "doc_id").limit(20)


# The oracle counts occurrences by the doubled-space trick: doubling
# every separator gives each adjacent-token boundary its own pair of
# spaces, so non-overlapping replace() counts every occurrence (a
# 2-word phrase of DISTINCT words cannot overlap itself).
_DD_PHRASE = f"""
WITH padded AS (
  SELECT doc_id,
         ' ' || replace(lower(trim({dd_sql(_DD_NORMALIZE, col="text")})), ' ', '  ') || ' ' AS p
  FROM documents
),
counted AS (
  SELECT doc_id,
         CAST((length(p) - length(replace(p, ' {_PHRASE[0]}  {_PHRASE[1]} ', '')))
              / length(' {_PHRASE[0]}  {_PHRASE[1]} ') AS BIGINT) AS n_matches
  FROM padded
)
SELECT doc_id, n_matches FROM counted
WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id
LIMIT 20
"""

_register("retrieval_phrase_match", _phrase_match, _DD_PHRASE)


# --------------------------------------------------------------------------
# 3. Incremental new-batch dedup (operators/dedup.py)
# --------------------------------------------------------------------------


def _incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admit today's drop: docs with doc_id % 4 == 0 arrive as the new
    batch against the rest of the corpus; every batch row classified
    dup_of_base / dup_in_batch / new.  The fixture's planted exact
    duplicates make all three classes non-empty."""
    from ..operators.dedup import incremental_exact_dedup

    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    return incremental_exact_dedup(base, batch).select("doc_id", "status")


_DD_INCR_DEDUP = f"""
WITH fp AS (
  SELECT doc_id, md5({dd_sql(_DD_NORMALIZE, col="text")}) AS f FROM documents
),
base AS (SELECT DISTINCT f FROM fp WHERE doc_id % 4 != 0),
batch AS (SELECT doc_id, f FROM fp WHERE doc_id % 4 = 0)
SELECT b.doc_id,
       CASE WHEN base.f IS NOT NULL THEN 'dup_of_base'
            WHEN row_number() OVER (PARTITION BY b.f ORDER BY b.doc_id) > 1
              THEN 'dup_in_batch'
            ELSE 'new' END AS status
FROM batch b LEFT JOIN base ON b.f = base.f
"""

_register("dedup_incremental_new_batch", _incremental_dedup, _DD_INCR_DEDUP)


# --------------------------------------------------------------------------
# 4. n-gram containment (operators/dedup.py)
# --------------------------------------------------------------------------


def _containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-inside-doc pairs over the near-dup corpus (each perturbed
    copy CONTAINS its original verbatim, so containment is 1.0 where
    Jaccard is already diluted by the appended tail), lang-blocked."""
    from ..operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _neardup_corpus(spark, sf_dir), block_col="lang", shingle_n=3, threshold=0.8
    )


_DD_CONTAINMENT = f"""
WITH corpus AS ({_DD_NEARDUP_CORPUS}),
w AS (
  SELECT doc_id, lang, trim({dd_sql(_DD_NORMALIZE, col="text")}) AS norm_text,
         string_split(trim({dd_sql(_DD_NORMALIZE, col="text")}), ' ') AS words
  FROM corpus
),
sets AS (
  SELECT doc_id, lang, {_dd_shingles("norm_text", words="words")} AS shingles
  FROM w
)
SELECT id_contained, id_container, containment FROM (
  SELECT CASE WHEN len(l.shingles) <= len(r.shingles) THEN l.doc_id ELSE r.doc_id END AS id_contained,
         CASE WHEN len(l.shingles) <= len(r.shingles) THEN r.doc_id ELSE l.doc_id END AS id_container,
         round(len(list_intersect(l.shingles, r.shingles))::DOUBLE /
               least(len(l.shingles), len(r.shingles))::DOUBLE, 4) AS containment
  FROM sets l JOIN sets r ON l.lang = r.lang AND l.doc_id < r.doc_id
)
WHERE containment >= 0.8
"""

_register("dedup_ngram_containment_pairs", _containment_pairs, _DD_CONTAINMENT)


# --------------------------------------------------------------------------
# 5. Privacy audits (operators/privacy.py)
# --------------------------------------------------------------------------

_KS = (2, 5, 10, 25)


def _k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity of the customer table under the quasi-identifier
    (nation, market segment) — the release audit a training-data export
    carrying user attributes runs first."""
    from ..operators.privacy import k_anonymity_audit

    cust = _t(spark, sf_dir, "customer")
    return k_anonymity_audit(cust, ["c_nationkey", "c_mktsegment"], ks=_KS)


_DD_K_ANON = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS sz
  FROM customer GROUP BY 1, 2
),
per_k AS (
  SELECT sz, k FROM groups, unnest([{", ".join(str(k) for k in _KS)}]) AS t(k)
)
SELECT k,
       count(*) AS n_groups,
       CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
       CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       min(sz) AS min_group_size
FROM per_k GROUP BY k ORDER BY k
"""

_register("privacy_k_anonymity_audit", _k_anonymity, _DD_K_ANON)

_LS = (2, 3, 5)


def _l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity of the market segment (sensitive) within
    each nation (QI): k-anonymity's companion — a large group whose
    rows all share one sensitive value still leaks it."""
    from ..operators.privacy import l_diversity_audit

    cust = _t(spark, sf_dir, "customer")
    return l_diversity_audit(cust, ["c_nationkey"], "c_mktsegment", ls=_LS)


_DD_L_DIV = f"""
WITH groups AS (
  SELECT c_nationkey, count(*) AS sz, count(DISTINCT c_mktsegment) AS ndist
  FROM customer GROUP BY 1
),
per_l AS (
  SELECT sz, ndist, l FROM groups, unnest([{", ".join(str(v) for v in _LS)}]) AS t(l)
)
SELECT l,
       count(*) AS n_groups,
       CAST(sum(CASE WHEN ndist < l THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
       CAST(sum(CASE WHEN ndist < l THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       min(ndist) AS min_distinct
FROM per_l GROUP BY l ORDER BY l
"""

_register("privacy_l_diversity_audit", _l_diversity, _DD_L_DIV)


# --------------------------------------------------------------------------
# 6. URL canonicalization dedup (operators/urls.py)
# --------------------------------------------------------------------------


def _url_canonical_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup: every page arrives as TWO crawls — a clean
    spelling and a messy one (uppercase host, default port, tracking
    params, unsorted query, trailing slash, fragment, rotated by
    doc_id % 3) — and canonicalization must collapse each pair."""
    from ..operators.urls import url_canonical_dupes

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    page = F.col("doc_id").cast("string")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    clean = F.concat(
        F.lit("https://"), host, F.lit("/page/"), page, F.lit("?a=1&b=2")
    )
    messy = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://"), F.upper(host), F.lit("/page/"), page,
                     F.lit("/?b=2&a=1&utm_source=x")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("https://"), host, F.lit(":443/page/"), page,
                     F.lit("?b=2&a=1")),
        )
        .otherwise(
            F.concat(F.lit("https://"), host, F.lit("/page/"), page,
                     F.lit("?utm_campaign=z&a=1&b=2#frag")),
        )
    )
    crawls = docs.withColumn("url", clean).unionAll(
        docs.withColumn("url", messy)
    )
    return url_canonical_dupes(crawls)


_DD_URL_CANON = """
WITH pages AS (SELECT doc_id, source || '.example.com' AS host FROM documents),
u AS (
  SELECT doc_id,
         'https://' || host || '/page/' || doc_id::VARCHAR || '?a=1&b=2' AS url
  FROM pages
  UNION ALL
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN 'https://' || upper(host) || '/page/' || doc_id::VARCHAR
                       || '/?b=2&a=1&utm_source=x'
           WHEN 1 THEN 'https://' || host || ':443/page/' || doc_id::VARCHAR
                       || '?b=2&a=1'
           ELSE 'https://' || host || '/page/' || doc_id::VARCHAR
                       || '?utm_campaign=z&a=1&b=2#frag'
         END AS url
  FROM pages
),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)) AS host,
         regexp_replace(regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1),
                        '/$', '') AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM u
),
canon AS (
  SELECT doc_id, url,
         CASE WHEN host = '' THEN '' ELSE
           scheme || '://' ||
           CASE WHEN scheme = 'http' THEN regexp_replace(host, ':80$', '')
                WHEN scheme = 'https' THEN regexp_replace(host, ':443$', '')
                ELSE host END
           || path ||
           CASE WHEN sq = '' THEN '' ELSE '?' || sq END
         END AS canon_url
  FROM (
    SELECT *, array_to_string(list_sort(list_filter(string_split(query, '&'),
              p -> p != '' AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)='))),
              '&') AS sq
    FROM parts
  )
)
SELECT canon_url,
       count(*) AS n_rows,
       count(DISTINCT url) AS n_variants,
       min(doc_id) AS first_id
FROM canon
WHERE canon_url != ''
GROUP BY canon_url
HAVING count(DISTINCT url) > 1
"""

_register("url_canonical_dupes", _url_canonical_dupes, _DD_URL_CANON)


# --------------------------------------------------------------------------
# 7. Unicode NFC normalization (functions/unicode.py)
# --------------------------------------------------------------------------


def _nfc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC impact report over a corpus with woven DECOMPOSED spellings:
    docs with doc_id % 5 == 0 carry every 'e' as 'e' + combining acute
    (U+0301) — the NFD form NFC composes back to 'é'.  Per-lang counts
    of rows changed and total code-point delta; the fixture's ASCII
    rows must report untouched (n_changed contribution 0)."""
    from ..functions.unicode import nfc_stats

    docs = _t(spark, sf_dir, "documents")
    decorated = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.regexp_replace(F.col("text"), "e", "é"),
        ).otherwise(F.col("text")),
    )
    return nfc_stats(decorated, group_col="lang")


_DD_NFC = """
WITH decorated AS (
  SELECT lang,
         CASE WHEN doc_id % 5 = 0
              THEN regexp_replace(text, 'e', 'e' || chr(769), 'g')
              ELSE text END AS text
  FROM documents
)
SELECT lang,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN nfc_normalize(text) != text THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(sum(length(text) - length(nfc_normalize(text))) AS BIGINT) AS len_delta
FROM decorated GROUP BY lang
"""

_register("text_unicode_nfc_stats", _nfc_stats, _DD_NFC)


# --------------------------------------------------------------------------
# 8. Fellegi-Sunter probabilistic record linkage (operators/linkage.py)
# --------------------------------------------------------------------------

_FS_OFFSET = 10_000_000


def _fs_frames(spark: SparkSession, sf_dir: str):
    """Deterministic linkage fixture: the customer table as the clean
    file, plus a 'dirty' re-registration of every customer — name
    truncated for id % 3 == 0, segment lost for id % 5 == 0, account
    balance drifted one bucket for id % 7 == 0; nation never corrupted
    (it is the block key).  Truth = (id, id + offset)."""
    cust = _t(spark, sf_dir, "customer")
    cents = F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
    base = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div 100000").alias(
            "bucket"
        ),
    )
    k = F.col("id")
    dirty = base.select(
        (k + F.lit(_FS_OFFSET)).alias("id"),
        F.when(k % 3 == 0, F.expr("substring(name, 1, length(name) - 1)"))
        .otherwise(F.col("name"))
        .alias("name"),
        F.col("nation"),
        F.when(k % 5 == 0, F.lit("UNKNOWN")).otherwise(F.col("segment")).alias(
            "segment"
        ),
        F.when(k % 7 == 0, F.col("bucket") + 1).otherwise(F.col("bucket")).alias(
            "bucket"
        ),
    )
    truth = base.select(
        F.col("id").alias("clean_id"), (k + F.lit(_FS_OFFSET)).alias("dirty_id")
    )
    return base, dirty, truth


def _fs_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter linkage confusion matrix: supervised m from the
    woven truth, frequency-identity u from the clean side, nation-
    blocked candidates scored by integer micro-nat log-likelihood
    ratios, decision = score > 0.  Output one row per (is_true,
    decision) cell with pair counts and score extrema — the honest
    exhibit: three weak fields DO produce off-diagonal cells."""
    from ..operators.linkage import fs_score_pairs, fs_weights

    clean, dirty, truth = _fs_frames(spark, sf_dir)
    fields = ["name", "segment", "bucket"]
    w = fs_weights(clean, dirty, truth, fields)
    scored = fs_score_pairs(clean, dirty, w, fields, block_col="nation")
    return (
        scored.select(
            (F.col("dirty_id") - F.col("clean_id") == _FS_OFFSET).alias("is_true"),
            (F.col("score_micro") > 0).alias("decision"),
            "score_micro",
        )
        .groupBy("is_true", "decision")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("score_micro").alias("min_score_micro"),
            F.max("score_micro").alias("max_score_micro"),
        )
        .orderBy("is_true", "decision")
    )


_DD_FS = f"""
WITH base AS (
  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation,
         c_mktsegment AS segment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS bucket
  FROM customer
),
dirty AS (
  SELECT id + {_FS_OFFSET} AS id,
         CASE WHEN id % 3 = 0 THEN substring(name, 1, length(name) - 1)
              ELSE name END AS name,
         nation,
         CASE WHEN id % 5 = 0 THEN 'UNKNOWN' ELSE segment END AS segment,
         CASE WHEN id % 7 = 0 THEN bucket + 1 ELSE bucket END AS bucket
  FROM base
),
n_tot AS (SELECT count(*) AS n FROM base),
m AS (
  SELECT count(*) AS m_den,
         sum(CASE WHEN b.name = d.name THEN 1 ELSE 0 END) AS m_name,
         sum(CASE WHEN b.segment = d.segment THEN 1 ELSE 0 END) AS m_segment,
         sum(CASE WHEN b.bucket = d.bucket THEN 1 ELSE 0 END) AS m_bucket
  FROM base b JOIN dirty d ON d.id = b.id + {_FS_OFFSET}
),
u AS (
  SELECT
    (SELECT sum(c * c) FROM (SELECT count(*) AS c FROM base GROUP BY name)) AS u_name,
    (SELECT sum(c * c) FROM (SELECT count(*) AS c FROM base GROUP BY segment)) AS u_segment,
    (SELECT sum(c * c) FROM (SELECT count(*) AS c FROM base GROUP BY bucket)) AS u_bucket
),
w AS (
  SELECT
    CAST(floor((ln(m_name::DOUBLE / m_den::DOUBLE) - ln(u_name::DOUBLE / (n * n)::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS wa_name,
    CAST(floor((ln((m_den - m_name)::DOUBLE / m_den::DOUBLE) - ln((n * n - u_name)::DOUBLE / (n * n)::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS wd_name,
    CAST(floor((ln(m_segment::DOUBLE / m_den::DOUBLE) - ln(u_segment::DOUBLE / (n * n)::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS wa_segment,
    CAST(floor((ln((m_den - m_segment)::DOUBLE / m_den::DOUBLE) - ln((n * n - u_segment)::DOUBLE / (n * n)::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS wd_segment,
    CAST(floor((ln(m_bucket::DOUBLE / m_den::DOUBLE) - ln(u_bucket::DOUBLE / (n * n)::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS wa_bucket,
    CAST(floor((ln((m_den - m_bucket)::DOUBLE / m_den::DOUBLE) - ln((n * n - u_bucket)::DOUBLE / (n * n)::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS wd_bucket
  FROM m, u, n_tot
),
scored AS (
  SELECT b.id AS clean_id, d.id AS dirty_id,
         (CASE WHEN b.name = d.name THEN w.wa_name ELSE w.wd_name END
          + CASE WHEN b.segment = d.segment THEN w.wa_segment ELSE w.wd_segment END
          + CASE WHEN b.bucket = d.bucket THEN w.wa_bucket ELSE w.wd_bucket END)
           AS score_micro
  FROM base b JOIN dirty d ON b.nation = d.nation, w
)
SELECT (dirty_id - clean_id = {_FS_OFFSET}) AS is_true,
       (score_micro > 0) AS decision,
       count(*) AS n_pairs,
       min(score_micro) AS min_score_micro,
       max(score_micro) AS max_score_micro
FROM scored
GROUP BY 1, 2
ORDER BY 1, 2
"""

_register("linkage_fs_confusion", _fs_confusion, _DD_FS)


# --------------------------------------------------------------------------
# 9. Streaming corpus admission (streaming/incremental_dedup_stream.py)
# --------------------------------------------------------------------------


def _stream_incremental_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-dedup admission loop executed through Structured
    Streaming: the base corpus's fingerprints seed a PERSISTED state
    table, the new-doc drop streams in 4 micro-batches
    (maxFilesPerTrigger=1), each batch is classified against the
    current state and its admitted fingerprints appended — so later
    batches see earlier admissions as corpus.

    The gated output is per-fingerprint and BATCH-ORDER-INDEPENDENT
    (micro-batch composition is Spark's choice): across all batches a
    fingerprint already in the base must be admitted 0 times, an unseen
    fingerprint EXACTLY once, everything else rejected.  A broken state
    loop (admissions not visible to later batches) double-admits and
    fails the hash."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..functions.text import normalize_whitespace_col
    from ..streaming.incremental_dedup_stream import (
        seed_state,
        stream_admit_documents,
    )
    from ._base import _drain

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_incr_{tag}_{os.getpid()}"
    )
    src, sink = os.path.join(root, "src"), os.path.join(root, "sink")
    state, ckpt = os.path.join(root, "state"), os.path.join(root, "ckpt")
    shutil.rmtree(root, ignore_errors=True)

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    seed_state(base, state)
    batch.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_admit_documents(stream, state, sink, ckpt)
    _drain(q, 300)

    base_fps = base.select(
        F.md5(normalize_whitespace_col("text")).alias("fingerprint")
    ).distinct().withColumn("_in_base", F.lit(True))
    return (
        spark.read.parquet(sink)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("status") == "new").cast("long")).alias("n_new"),
            F.sum((F.col("status") != "new").cast("long")).alias("n_rejected"),
        )
        .join(base_fps, "fingerprint", "left")
        .select(
            "fingerprint",
            "n_docs",
            "n_new",
            "n_rejected",
            F.coalesce(F.col("_in_base"), F.lit(False)).alias("in_base"),
        )
    )


_DD_STREAM_INCR = dd_sql(
    """
WITH fp AS (SELECT doc_id, md5({norm}) AS f FROM documents),
base AS (SELECT DISTINCT f FROM fp WHERE doc_id % 4 != 0),
batch AS (SELECT doc_id, f FROM fp WHERE doc_id % 4 = 0)
SELECT b.f AS fingerprint,
       count(*) AS n_docs,
       CAST(CASE WHEN base.f IS NOT NULL THEN 0 ELSE 1 END AS BIGINT) AS n_new,
       CAST(count(*) - CASE WHEN base.f IS NOT NULL THEN 0 ELSE 1 END AS BIGINT)
         AS n_rejected,
       (base.f IS NOT NULL) AS in_base
FROM batch b LEFT JOIN base ON b.f = base.f
GROUP BY b.f, base.f
""",
    norm=dd_sql(_DD_NORMALIZE, col="text"),
)

_register(
    "stream_incremental_dedup_replay",
    _stream_incremental_dedup_replay,
    _DD_STREAM_INCR,
)


# --------------------------------------------------------------------------
# 10. LSH candidates -> exact verification (operators/dedup.py::
#     verify_candidate_pairs) — the linear-at-scale near-dup pipeline
# --------------------------------------------------------------------------


def _lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The candidates -> verify split end to end: MinHash-LSH banding
    produces the collision-bounded candidate relation, then exact
    Jaccard verification runs as two id-keyed joins over ONLY those
    pairs — never a blocked cross join.  Same threshold as the blocked
    `dedup_ngram_jaccard_pairs`, so the two entries bracket the same
    semantics from the quadratic and the linear side."""
    from ..operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        verify_candidate_pairs,
    )
    from .dedup import _LSH_BANDS

    corpus = _neardup_corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_perm=16, shingle_n=3, seed=42)
    cands = lsh_candidate_pairs(sigs, bands=_LSH_BANDS)
    return verify_candidate_pairs(
        cands, corpus, shingle_n=3, metric="jaccard", threshold=0.5
    )


def _dd_lsh_verified() -> str:
    from .dedup import (
        _DD_HASH32,
        _LSH_BANDS,
        _MINHASH_PERMS,
        _ROWS_PER_BAND,
    )
    from ..operators.dedup import LSH_P

    return f"""
WITH corpus AS ({_DD_NEARDUP_CORPUS}),
w AS (
  SELECT doc_id, trim({dd_sql(_DD_NORMALIZE, col="text")}) AS norm_text,
         string_split(trim({dd_sql(_DD_NORMALIZE, col="text")}), ' ') AS words
  FROM corpus
),
sets AS (
  SELECT doc_id, {_dd_shingles("norm_text", words="words")} AS shingles
  FROM w
),
bases AS (
  SELECT doc_id, list_transform(shingles, s -> {dd_sql(_DD_HASH32, s="s")}) AS base_hashes
  FROM sets
),
sigs AS (
  SELECT doc_id,
         list_transform(range(1, 17), j ->
           list_min(list_transform(base_hashes,
             h -> ([{", ".join(str(a) for a, _ in _MINHASH_PERMS)}][j]::BIGINT * h
                   + [{", ".join(str(b) for _, b in _MINHASH_PERMS)}][j]) % {LSH_P}))) AS sig
  FROM bases
),
banded AS (
  SELECT doc_id, b AS band_id,
         md5(array_to_string(sig[b*{_ROWS_PER_BAND}+1 : b*{_ROWS_PER_BAND}+{_ROWS_PER_BAND}], ',')) AS band_hash
  FROM sigs CROSS JOIN unnest([{", ".join(str(b) for b in range(_LSH_BANDS))}]) AS t(b)
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band_id = r.band_id AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, jaccard FROM (
  SELECT c.id_a, c.id_b,
         round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
               len(list_distinct(list_concat(sa.shingles, sb.shingles)))::DOUBLE, 4)
           AS jaccard
  FROM cand c JOIN sets sa ON sa.doc_id = c.id_a JOIN sets sb ON sb.doc_id = c.id_b
)
WHERE jaccard >= 0.5
"""


_register("dedup_lsh_verified_pairs", _lsh_verified_pairs, _dd_lsh_verified())


# --------------------------------------------------------------------------
# 11. Misra-Gries heavy hitters (operators/heavyhitters.py)
# --------------------------------------------------------------------------


def _heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified frequent keys over a woven skewed stream (two hot keys
    at ~1/6 of the rows each, every other key a singleton — the head
    a Zipfian event log has and the TPC-H-ish fixtures lack): MG
    candidate summaries per partition, key-summed, exactly re-counted,
    filtered to true frequency > N/(k+1).  The MG guarantee makes the
    report complete whatever the partitioning."""
    from ..operators.heavyhitters import heavy_hitters

    ev = _t(spark, sf_dir, "events").select("event_id")
    keyed = ev.select(
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit("hot-"), (F.col("event_id") % 2).cast("string")),
        )
        .otherwise(F.concat(F.lit("cold-"), F.col("event_id").cast("string")))
        .alias("k")
    )
    return heavy_hitters(keyed, "k", k=8).orderBy("k")


_DD_HEAVY = """
WITH keyed AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN 'hot-' || (event_id % 2)::VARCHAR
              ELSE 'cold-' || event_id::VARCHAR END AS k
  FROM events
),
tot AS (SELECT count(*) AS n FROM keyed)
SELECT k, count(*) AS n_true
FROM keyed, tot
GROUP BY k, tot.n
HAVING count(*) * 9 > tot.n
ORDER BY k
"""

_register("agg_heavy_hitters_events", _heavy_hitters_events, _DD_HEAVY)


# --------------------------------------------------------------------------
# 12. Streaming heavy hitters (streaming/heavyhitters_stream.py)
# --------------------------------------------------------------------------


def _stream_heavy_hitters_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MG summary maintained as a log-structured stream: the woven
    skewed key stream arrives in 4 micro-batches, each appending its
    bounded summary; batch 0's summary is then deliberately re-appended
    (a replay) and must be absorbed by the stamp dedup.  The gated
    output is the verified report — identical to the batch
    `agg_heavy_hitters_events` oracle, proving the streamed state loses
    no true heavy hitter."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..streaming.heavyhitters_stream import (
        stream_into_mg,
        verified_heavy_hitters_from_log,
    )
    from ._base import _drain

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_mg_{tag}_{os.getpid()}"
    )
    src, log = os.path.join(root, "src"), os.path.join(root, "log")
    ckpt = os.path.join(root, "ckpt")
    shutil.rmtree(root, ignore_errors=True)

    ev = _t(spark, sf_dir, "events").select("event_id")
    keyed = ev.select(
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit("hot-"), (F.col("event_id") % 2).cast("string")),
        )
        .otherwise(F.concat(F.lit("cold-"), F.col("event_id").cast("string")))
        .alias("k")
    )
    keyed.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_into_mg(stream, log, ckpt, "k", k=8)
    _drain(q, 300)

    # deliberate replay: re-append batch 0's summary rows verbatim
    first = spark.read.parquet(log).filter(F.col("batch_id") == 0)
    first.write.mode("append").parquet(log)

    return verified_heavy_hitters_from_log(
        spark, log, keyed, "k", k=8
    ).orderBy("k")


_register("stream_heavy_hitters_replay", _stream_heavy_hitters_replay, _DD_HEAVY)


# --------------------------------------------------------------------------
# 13. Recursive CTE (Spark 4 WITH RECURSIVE) — SQL-surface parity
# --------------------------------------------------------------------------

_RCTE_SQL = """
WITH RECURSIVE reach(node, depth) AS (
  SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
  UNION ALL
  SELECT c.c_custkey, r.depth + 1
  FROM customer c JOIN reach r
    ON CAST(c.c_custkey / 2 AS BIGINT) = r.node
  WHERE c.c_custkey > 1 AND c.c_custkey < 64
)
SELECT node, CAST(min(depth) AS BIGINT) AS depth
FROM reach GROUP BY node ORDER BY node
"""


def _recursive_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's WITH RECURSIVE, exercised end to end: BFS depths over
    an implicit binary tree on customer keys (parent = floor(k / 2)),
    identical SQL text on both engines.  The iterative operators
    (graph.bfs_levels etc.) remain the 100 TB path — per-level joins
    with checkpointed frontiers — but the declarative form is part of
    the SQL surface a reference user expects, and this pins Spark's
    recursion semantics (UNION ALL accumulation, join-per-step) against
    the oracle's."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_RCTE_SQL)


_DD_RCTE = _RCTE_SQL.replace("CAST(c.c_custkey / 2 AS BIGINT)", "(c.c_custkey // 2)")

_register("sql_recursive_bfs_depth", _recursive_bfs, _DD_RCTE)


# --------------------------------------------------------------------------
# 14. Quality-survivorship dedup clusters (operators/cluster.py)
# --------------------------------------------------------------------------


def _cluster_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters with the QUALITY survivorship rule: keep the
    LONGEST member per cluster (ties by min id) instead of the min id.
    On the near-dup corpus the perturbed copy is strictly longer than
    its original, so every dup cluster's survivor is the non-min-id
    member — the policy difference this entry pins."""
    from ..operators.cluster import cluster_survivors
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures
    from .dedup import _LSH_BANDS

    corpus = _neardup_corpus(spark, sf_dir).withColumn("score", F.length("text"))
    sigs = minhash_signatures(corpus, num_perm=16, shingle_n=3, seed=42)
    pairs = lsh_candidate_pairs(sigs, bands=_LSH_BANDS)
    return cluster_survivors(corpus, pairs, "score")


def _dd_cluster_best_quality() -> str:
    from .dedup import _DD_MINHASH_LSH

    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({_DD_MINHASH_LSH}),
sym AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
),
minreach AS (SELECT src AS id, min(dst) AS mr FROM reach GROUP BY src),
corpus AS ({_DD_NEARDUP_CORPUS}),
labeled AS (
  SELECT c.doc_id AS id,
         least(c.doc_id, coalesce(m.mr, c.doc_id)) AS cluster_id,
         CAST(length(c.text) AS BIGINT) AS score
  FROM corpus c LEFT JOIN minreach m ON c.doc_id = m.id
)
SELECT id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       score,
       row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, id) = 1
         AS is_survivor
FROM labeled
"""


_register(
    "dedup_cluster_best_quality", _cluster_best_quality, _dd_cluster_best_quality()
)


# --------------------------------------------------------------------------
# 15. Curriculum interleave (training-order construction)
# --------------------------------------------------------------------------


def _curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order construction: rank documents WITHIN
    each source by quality (length proxy here; any score plugs in),
    then emit the global order as a strict round-robin across sources
    at equal rank — every epoch slice sees every source, best examples
    first, with no RNG to replay.  The global position comes from the
    two-pass global_rank (range repartition + partitioned running
    count), never a single-partition window."""
    from ..operators.ranking import global_rank
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = docs.withColumn("rank_in_source", F.row_number().over(w).cast("long"))
    ordered = global_rank(
        ranked,
        [F.col("rank_in_source").asc(), F.col("source").asc(), F.col("doc_id").asc()],
    )
    return ordered.select(
        F.col("_rank").alias("position"), "doc_id", "source", "rank_in_source"
    )


_DD_CURRICULUM = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS r
  FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY r, source, doc_id) AS BIGINT) AS position,
       doc_id, source, CAST(r AS BIGINT) AS rank_in_source
FROM ranked
"""

_register("train_curriculum_interleave", _curriculum_interleave, _DD_CURRICULUM)


# --------------------------------------------------------------------------
# 16. Persisted phrase index probe (operators/retrieval.py)
# --------------------------------------------------------------------------


def _phrase_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVING-path form of `retrieval_phrase_match`: positional
    postings persisted once (term-bucket partitioned, the BM25 index
    layout), phrase served through driver-side bucket pruning + pushed
    term filters.  Same oracle as the tokenize-on-the-fly entry by
    construction."""
    import hashlib
    import os
    import tempfile

    from ..operators.retrieval import phrase_index_search, postings_index_write

    docs = _t(spark, sf_dir, "documents")
    params = "buckets32_v1"
    tag = hashlib.md5(f"{sf_dir}|{params}".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_phrase_probe_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        postings_index_write(docs, path, n_buckets=32)
    out = phrase_index_search(spark, path, _PHRASE, n_buckets=32)
    return out.orderBy(F.col("n_matches").desc(), "doc_id").limit(20)


_register("retrieval_phrase_probe", _phrase_probe, _DD_PHRASE)


# --------------------------------------------------------------------------
# 17. PSI drift (operators/profile.py::psi_drift)
# --------------------------------------------------------------------------


def _psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Population Stability Index between the even- and
    odd-id halves of the event log (same generator, so PSI lands in the
    'stable' band — the number a deployment gate thresholds)."""
    from ..operators.profile import psi_drift

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    base = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    return psi_drift(base, cur, "value", group_col="event_type").orderBy(
        "event_type"
    )


_DD_PSI = """
WITH base AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE event_id % 2 = 0
),
cur AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE event_id % 2 = 1
),
bbounds AS (SELECT event_type, min(v) AS blo, max(v) AS bhi FROM base GROUP BY 1),
cbounds AS (SELECT event_type, min(v) AS clo, max(v) AS chi FROM cur GROUP BY 1),
bounds AS (
  SELECT coalesce(b.event_type, c.event_type) AS event_type,
         coalesce(blo, clo) AS lo, coalesce(bhi, chi) AS hi
  FROM bbounds b FULL OUTER JOIN cbounds c ON b.event_type = c.event_type
),
bb AS (
  SELECT b.event_type,
         CAST(((greatest(least(b.v, bd.hi), bd.lo) - bd.lo) * 10)
              // (bd.hi - bd.lo + 1) AS INT) AS bkt
  FROM base b JOIN bounds bd USING (event_type)
),
cc AS (
  SELECT c.event_type,
         CAST(((greatest(least(c.v, bd.hi), bd.lo) - bd.lo) * 10)
              // (bd.hi - bd.lo + 1) AS INT) AS bkt
  FROM cur c JOIN bounds bd USING (event_type)
),
pb AS (SELECT event_type, bkt, count(*) AS n FROM bb GROUP BY 1, 2),
pc AS (SELECT event_type, bkt, count(*) AS n FROM cc GROUP BY 1, 2),
spine AS (
  SELECT event_type, CAST(t.b AS INT) AS bkt
  FROM bounds, unnest(range(0, 10)) AS t(b)
),
counts AS (
  SELECT s.event_type, s.bkt,
         coalesce(pb.n, 0) AS cb_, coalesce(pc.n, 0) AS cc_
  FROM spine s
  LEFT JOIN pb ON pb.event_type = s.event_type AND pb.bkt = s.bkt
  LEFT JOIN pc ON pc.event_type = s.event_type AND pc.bkt = s.bkt
),
tot AS (
  SELECT event_type, sum(cb_) AS nb, sum(cc_) AS nc FROM counts GROUP BY 1
),
terms AS (
  SELECT c.event_type, t.nb, t.nc,
         CAST(floor(((cb_ + 1)::DOUBLE / (nb + 10)::DOUBLE
                     - (cc_ + 1)::DOUBLE / (nc + 10)::DOUBLE)
                    * ln(((cb_ + 1)::DOUBLE / (nb + 10)::DOUBLE)
                         / ((cc_ + 1)::DOUBLE / (nc + 10)::DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM counts c JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(sum(term) AS BIGINT) AS psi_micro,
       CAST(max(nb) AS BIGINT) AS n_base,
       CAST(max(nc) AS BIGINT) AS n_current
FROM terms GROUP BY event_type ORDER BY event_type
"""

_register("profile_psi_value_drift", _psi_value_drift, _DD_PSI)


# --------------------------------------------------------------------------
# 18. Leakage-safe train/test split (round 10 — operators/cluster.py::
# leakage_safe_split).  The row-hash split (train_test_split_hash) can
# put a test document's near-copy in train, inflating eval numbers;
# the leakage-safe form splits by near-dup CLUSTER so twins always
# land on the same side.  The oracle reproduces the whole table:
# MinHash-LSH pairs -> recursive-CTE connected components -> the same
# md5 bucket of the cluster id.
# --------------------------------------------------------------------------


def _split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cluster import leakage_safe_split
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures
    from .dedup import _LSH_BANDS

    corpus = _neardup_corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_perm=16, shingle_n=3, seed=42)
    pairs = lsh_candidate_pairs(sigs, bands=_LSH_BANDS)
    return leakage_safe_split(corpus, pairs, test_pct=10).orderBy("id")


def _dd_split_leakage_safe() -> str:
    from .dedup import _DD_MINHASH_LSH

    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({_DD_MINHASH_LSH}),
sym AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
),
minreach AS (SELECT src AS id, min(dst) AS mr FROM reach GROUP BY src),
corpus AS ({_DD_NEARDUP_CORPUS}),
labeled AS (
  SELECT c.doc_id AS id,
         least(c.doc_id, coalesce(m.mr, c.doc_id)) AS cluster_id
  FROM corpus c LEFT JOIN minreach m ON c.doc_id = m.id
)
SELECT id, cluster_id,
       CASE WHEN (('0x' || substr(md5('split' || '§' || cluster_id::VARCHAR),
                   1, 8))::BIGINT % 100) < 10
            THEN 'test' ELSE 'train' END AS split
FROM labeled ORDER BY id
"""


_register(
    "train_split_leakage_safe", _split_leakage_safe, _dd_split_leakage_safe()
)


# --------------------------------------------------------------------------
# 19. Streaming AUC (round 10 — streaming/evalmetrics_stream.py).
# Scorer health monitoring without retaining scored rows: each
# micro-batch appends its bounded per-score count table; AUC folds the
# log.  Same oracle as a one-shot AUC over every streamed row, proving
# the histogram log loses nothing; a deliberate batch-0 replay must be
# absorbed by the stamp dedup.
# --------------------------------------------------------------------------


def _stream_auc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.evalmetrics_stream import (
        auc_from_log,
        stream_into_score_counts,
    )
    from ._base import _drain
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_auc_{tag}_{os.getpid()}"
    )
    src, log = os.path.join(root, "src"), os.path.join(root, "log")
    ckpt = os.path.join(root, "ckpt")
    shutil.rmtree(root, ignore_errors=True)

    scored = _t(spark, sf_dir, "events").select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").alias("label"),
    )
    scored.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("score double, label boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_into_score_counts(stream, log, ckpt, "score", "label", scale=100)
    _drain(q, 300)

    # deliberate replay: re-append batch 0's count rows verbatim
    first = spark.read.parquet(log).filter(F.col("batch_id") == 0)
    first.write.mode("append").parquet(log)

    return auc_from_log(spark, log)


_DD_STREAM_AUC = """
WITH s AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS sc,
         (event_type = 'purchase') AS y
  FROM events
),
per AS (
  SELECT sc,
         sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
         sum(CASE WHEN y THEN 0 ELSE 1 END) AS neg
  FROM s GROUP BY 1
),
cum AS (
  SELECT pos, neg,
         coalesce(sum(neg) OVER (ORDER BY sc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS negb
  FROM per
),
agg AS (
  SELECT sum(pos) AS n_pos, sum(neg) AS n_neg,
         sum(2 * pos * negb + pos * neg) AS u2
  FROM cum
)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(CASE WHEN n_pos > 0 AND n_neg > 0
                 THEN (u2 * 1000000) // (2 * n_pos * n_neg) END AS BIGINT)
         AS auc_micro
FROM agg
"""

_register("stream_auc_replay", _stream_auc_replay, _DD_STREAM_AUC)


def _stream_calibration_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reliability table folded from the streamed score-count log
    (one log serves both scorer-health metrics — this entry gates the
    calibration read of the same histogram `stream_auc_replay` gates
    the AUC read of).  Same replay harness: 4 micro-batches, batch-0
    counts re-appended and absorbed by the stamp dedup."""
    from ..streaming.evalmetrics_stream import (
        calibration_from_log,
        stream_into_score_counts,
    )
    from ._base import _drain
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_cal_{tag}_{os.getpid()}"
    )
    src, log = os.path.join(root, "src"), os.path.join(root, "log")
    ckpt = os.path.join(root, "ckpt")
    shutil.rmtree(root, ignore_errors=True)

    scored = _t(spark, sf_dir, "events").select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").alias("label"),
    )
    scored.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("score double, label boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_into_score_counts(stream, log, ckpt, "score", "label", scale=100)
    _drain(q, 300)

    first = spark.read.parquet(log).filter(F.col("batch_id") == 0)
    first.write.mode("append").parquet(log)

    return calibration_from_log(spark, log, n_bins=10, scale=100).orderBy("bin")


_DD_STREAM_CAL = """
WITH s AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS sc,
         (event_type = 'purchase') AS y
  FROM events
),
bounds AS (SELECT min(sc) AS lo, max(sc) AS hi FROM s),
binned AS (
  SELECT CAST(((sc - lo) * 10) // (hi - lo + 1) AS INT) AS bin, sc, y
  FROM s, bounds
),
agg AS (
  SELECT bin, count(*) AS n, sum(sc) AS ssum,
         sum(CASE WHEN y THEN 1 ELSE 0 END) AS npos
  FROM binned GROUP BY 1
)
SELECT bin, CAST(n AS BIGINT) AS n,
       CAST((ssum * 1000000) // (n * 100) AS BIGINT) AS mean_score_micro,
       CAST((npos * 1000000) // n AS BIGINT) AS pos_rate_micro
FROM agg ORDER BY bin
"""

_register("stream_calibration_replay", _stream_calibration_replay, _DD_STREAM_CAL)


# --------------------------------------------------------------------------
# 20. Margin-based bitext mining (round 10 — operators/mining.py::
# mine_bitext_margin).  Training-data ACQUISITION, not just cleaning:
# the CCMatrix/LASER ratio-margin criterion over coarse blocks (here
# the label quantizer stands in for the IVF assignment a 100x run
# would block by).  The even/odd vec_id halves play src/tgt corpora.
# --------------------------------------------------------------------------

_BITEXT_K = 2
_BITEXT_THR = 1.0


def _mine_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import mine_bitext_margin

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        (F.col("label") % 10).alias("block"),
        F.when(F.col("vec_id") % 2 == 0, F.lit("src"))
        .otherwise(F.lit("tgt"))
        .alias("side"),
    )
    out = mine_bitext_margin(
        emb, k=_BITEXT_K, margin_threshold=_BITEXT_THR
    )
    return out.select(
        "block",
        "src_id",
        "tgt_id",
        F.round("cos", 4).alias("cos"),
        F.round("margin", 4).alias("margin"),
    ).orderBy("block", "src_id", "tgt_id")


def _dd_bitext() -> str:
    from ._base import _dd_dot, _dd_norm

    cos = f"{_dd_dot('s.embedding', 't.embedding')} / ({_dd_norm('s.embedding')} * {_dd_norm('t.embedding')})"
    return f"""
WITH e AS (
  SELECT vec_id, embedding, label % 10 AS block,
         CASE WHEN vec_id % 2 = 0 THEN 'src' ELSE 'tgt' END AS side
  FROM embeddings
),
p AS (
  SELECT s.block, s.vec_id AS sid, t.vec_id AS tid, {cos} AS cos
  FROM e s JOIN e t ON s.block = t.block
  WHERE s.side = 'src' AND t.side = 'tgt'
),
fr AS (
  SELECT block, sid, avg(cos) AS avg_f, min(cos) AS kth_f
  FROM (SELECT *, row_number() OVER (PARTITION BY block, sid
                                     ORDER BY cos DESC) AS r
        FROM p QUALIFY r <= {_BITEXT_K})
  GROUP BY 1, 2
),
bw AS (
  SELECT block, tid, avg(cos) AS avg_b, min(cos) AS kth_b
  FROM (SELECT *, row_number() OVER (PARTITION BY block, tid
                                     ORDER BY cos DESC) AS r
        FROM p QUALIFY r <= {_BITEXT_K})
  GROUP BY 1, 2
)
SELECT p.block, p.sid AS src_id, p.tid AS tgt_id,
       round(p.cos, 4) AS cos,
       round(2.0 * p.cos / (avg_f + avg_b), 4) AS margin
FROM p
JOIN fr ON fr.block = p.block AND fr.sid = p.sid
JOIN bw ON bw.block = p.block AND bw.tid = p.tid
WHERE (p.cos >= kth_f OR p.cos >= kth_b)
  AND 2.0 * p.cos / (avg_f + avg_b) > {_BITEXT_THR}
ORDER BY p.block, src_id, tgt_id
"""


_register("train_mine_bitext_margin", _mine_bitext, _dd_bitext())


# ==========================================================================
# k-center greedy coreset (round 10) — operators/coreset.py.  The
# diversity-selection counterpart of DSIR/prototype picks: k rounds of
# farthest-point selection, each a full-scan argmax (TakeOrdered(1),
# map-side reduced) with the engine-wide sequential-fold l2^2 and a
# vec_id tiebreak; seed = min vec_id.  Oracle = the same k rounds
# unrolled as CTEs with identical fold order and least() chaining.
# ==========================================================================

_KCENTER_K = 6


def _train_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.coreset import kcenter_greedy

    emb = _t(spark, sf_dir, "embeddings")
    return kcenter_greedy(emb, "embedding", "vec_id", _KCENTER_K).orderBy(
        "sel_order"
    )


def _dd_kcenter(k: int) -> str:
    def l2sq(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, len({a})+1), "
            f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)))"
        )

    ctes = [
        "e AS (SELECT vec_id, embedding FROM embeddings)",
        "c1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1)",
        # selected ids leave the candidate pool each round, matching the
        # Spark side's anti-filter (ADVICE r10 duplicate-vector guard)
        f"m1 AS (SELECT e.vec_id, e.embedding, {l2sq('e.embedding', 'c1.embedding')} AS mind "
        f"FROM e, c1 WHERE e.vec_id <> c1.vec_id)",
    ]
    for i in range(2, k + 1):
        prev = f"m{i - 1}"
        ctes.append(
            f"c{i} AS (SELECT vec_id, embedding, mind FROM {prev} "
            f"ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        if i < k:
            ctes.append(
                f"m{i} AS (SELECT p.vec_id, p.embedding, "
                f"least(p.mind, {l2sq('p.embedding', f'c{i}.embedding')}) AS mind "
                f"FROM {prev} p, c{i} WHERE p.vec_id <> c{i}.vec_id)"
            )
    selects = ["SELECT 1 AS sel_order, vec_id, CAST(NULL AS DOUBLE) AS dist FROM c1"] + [
        f"SELECT {i} AS sel_order, vec_id, round(sqrt(mind), 4) AS dist FROM c{i}"
        for i in range(2, k + 1)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY sel_order"
    )


_register("train_kcenter_coreset", _train_kcenter, _dd_kcenter(_KCENTER_K))


# ==========================================================================
# Jaro-Winkler blocked linkage (round 10) — operators/linkage.py::
# jw_blocked_pairs.  The approximate-agreement comparator for the FS
# scorer, gated against DuckDB's NATIVE jaro_winkler_similarity (the
# pandas-UDF implementation is bit-identical — verified on 4000
# randomized cases in tests/test_linkage.py).  Distinct-value form:
# pairs are quadratic only within a (first-token) block and only over
# the 64-value name domain, never over part rows.
# ==========================================================================


def _linkage_jw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import jw_blocked_pairs

    names = (
        _t(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_rows_a"))
        .withColumn("blk", F.split(F.col("name"), " ").getItem(0))
    )
    pairs = jw_blocked_pairs(names.select("name", "blk"), "name", "blk")
    counts = names.select("name", "n_rows_a")
    out = (
        pairs.join(F.broadcast(counts), pairs.name_a == counts.name)
        .drop("name")
        .withColumnRenamed("n_rows_a", "rows_a")
        .join(
            F.broadcast(counts.withColumnRenamed("n_rows_a", "rows_b")),
            F.col("name_b") == F.col("name"),
        )
        .drop("name")
    )
    return (
        out.orderBy(F.col("jw").desc(), "name_a", "name_b")
        .limit(20)
        .select("name_a", "name_b", "rows_a", "rows_b", F.round("jw", 4).alias("jw_r4"))
    )


_DD_JW = """
WITH names AS (
  SELECT p_name AS name, count(*)::BIGINT AS n_rows,
         split_part(p_name, ' ', 1) AS blk
  FROM part GROUP BY 1
),
pairs AS (
  SELECT a.name AS name_a, b.name AS name_b, a.n_rows AS rows_a,
         b.n_rows AS rows_b,
         jaro_winkler_similarity(a.name, b.name) AS jw
  FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
)
SELECT name_a, name_b, rows_a, rows_b, round(jw, 4) AS jw_r4
FROM pairs
ORDER BY jw DESC, name_a, name_b
LIMIT 20
"""

_register("linkage_jw_name_pairs", _linkage_jw, _DD_JW)


# --------------------------------------------------------------------------
# t-closeness audit (round 10) — operators/privacy.py::
# t_closeness_audit: the third rung of the release ladder (a group can
# be k-anonymous AND l-diverse and still leak its sensitive
# DISTRIBUTION).  Total-variation distance cross-multiplied to exact
# ppm; the (QI x sensitive) spine makes missing cells count.
# --------------------------------------------------------------------------

_T_PPMS = (100_000, 200_000, 300_000)


def _t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.privacy import t_closeness_audit

    cust = _t(spark, sf_dir, "customer")
    return t_closeness_audit(cust, ["c_nationkey"], "c_mktsegment", t_ppms=_T_PPMS)


_DD_T_CLOSE = f"""
WITH cells AS (
  SELECT c_nationkey AS g, c_mktsegment AS s, count(*)::BIGINT AS c_gs
  FROM customer GROUP BY 1, 2
),
gmarg AS (SELECT g, sum(c_gs)::BIGINT AS n_g FROM cells GROUP BY 1),
smarg AS (SELECT s, sum(c_gs)::BIGINT AS c_s FROM cells GROUP BY 1),
tot AS (SELECT sum(c_gs)::BIGINT AS N FROM cells),
spine AS (SELECT g, n_g, s, c_s, N FROM gmarg, smarg, tot),
full_cells AS (
  SELECT spine.g, spine.n_g, spine.N, spine.c_s,
         coalesce(cells.c_gs, 0)::BIGINT AS c_gs
  FROM spine LEFT JOIN cells ON spine.g = cells.g AND spine.s = cells.s
),
per_group AS (
  SELECT g, max(n_g) AS n_g,
         CAST((sum(abs(c_gs::HUGEINT * N - c_s::HUGEINT * n_g)) * 1000000)
              // (2 * max(N)::HUGEINT * max(n_g)) AS BIGINT) AS tv_ppm
  FROM full_cells GROUP BY g
),
per_t AS (
  SELECT n_g, tv_ppm, t_ppm
  FROM per_group, unnest([{", ".join(str(t) for t in _T_PPMS)}]) AS t(t_ppm)
)
SELECT t_ppm,
       count(*)::BIGINT AS n_groups,
       CAST(sum(CASE WHEN tv_ppm > t_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
       CAST(sum(CASE WHEN tv_ppm > t_ppm THEN n_g ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       max(tv_ppm) AS max_tv_ppm
FROM per_t GROUP BY t_ppm ORDER BY t_ppm
"""

_register("privacy_t_closeness_audit", _t_closeness, _DD_T_CLOSE)


# ==========================================================================
# Cross-source quantile normalization (round 12): the curation
# normalizer that makes per-source quality scores COMPARABLE before a
# global threshold — each document's score is replaced by the pooled
# corpus's order statistic at the same within-source quantile (the
# microarray-normalization classic applied to corpus mixing; without
# it a global quality cutoff silently over-prunes whichever source
# scores low on its own scale).
#
# Distributed shape — no per-source pass, no per-source window:
#   1. ONE global_rank over (source, score, doc_id) gives every doc
#      `offset(source) + rank_in_source` in one range exchange;
#      per-source offsets are a SOURCE-DOMAIN-bounded artifact
#      (collected like centroids / bin bounds) subtracted via a
#      broadcast join.
#   2. ONE global_rank over (score, doc_id) ranks the pooled corpus.
#   3. target pooled position = (rank_in_source * N) div n_source + 1
#      — pure integers — and an equi-join on position fetches the
#      normalized value.
# Gated on the deterministic doc_id % 29 slice (full-corpus ranks,
# sliced output).  Everything is exact: ranks are unique under the
# (score, doc_id) total order; the normalized value is an existing
# integer score.
# ==========================================================================


def _quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("score")
    )
    # per-source counts -> exclusive offsets in source order (bounded
    # by the source domain — driver-side like any small model artifact)
    per_src = sorted(
        (r["source"], int(r["n"]))
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for src, n_s in per_src:
        offsets.append((src, acc, n_s))
        acc += n_s
    n_total = acc
    off_df = spark.createDataFrame(offsets, "source string, _off long, _ns long")

    ranked = (
        global_rank(docs, [F.col("source"), F.col("score"), F.col("doc_id")])
        .join(F.broadcast(off_df), "source")
        .select(
            "doc_id", "source", "score",
            (F.col("_rank") - 1 - F.col("_off")).alias("_rk"),  # 0-based in-source
            "_ns",
        )
    )
    pooled = global_rank(docs, [F.col("score"), F.col("doc_id")]).select(
        F.col("score").alias("norm_score"), F.col("_rank").alias("_pr")
    )
    picked = ranked.filter(F.col("doc_id") % 29 == 0).withColumn(
        "_target", F.expr(f"(_rk * CAST({n_total} AS BIGINT)) div _ns + 1")
    )
    return (
        picked.join(pooled, picked._target == pooled._pr)
        .select("doc_id", "source", "score", "norm_score")
        .orderBy("doc_id")
    )


_DD_QNORM = """
WITH d AS (SELECT doc_id, source, n_chars::BIGINT AS score FROM documents),
ranked AS (
  SELECT doc_id, source, score,
         row_number() OVER (PARTITION BY source ORDER BY score, doc_id) - 1 AS rk,
         count(*) OVER (PARTITION BY source) AS ns
  FROM d
),
pooled AS (
  SELECT score AS norm_score,
         row_number() OVER (ORDER BY score, doc_id) AS pr
  FROM d
),
n AS (SELECT count(*)::BIGINT AS n FROM d)
SELECT r.doc_id, r.source, r.score, p.norm_score
FROM ranked r, n
JOIN pooled p ON p.pr = (r.rk * n.n) // r.ns + 1
WHERE r.doc_id % 29 = 0
ORDER BY r.doc_id
"""

_register("scores_quantile_normalize", _quantile_normalize, _DD_QNORM)
