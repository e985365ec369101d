# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import DataFrame, F, SparkSession, _DD_NORMALIZE, _register, _t, dd_sql  # noqa: F401
from .dedup import (  # noqa: F401
    BPE_REGEX,
    LANG_MARKERS,
    STOPWORDS_EN,
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)
# Text analysis: language ID, quality, token stats, fingerprint
# (operators/textstats.py)
# ==========================================================================

def _dd_marker_hits(padded: str, words: list[str]) -> str:
    return " + ".join(f"(len(string_split({padded}, ' {w} ')) - 1)" for w in words)


def _langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(_t(spark, sf_dir, "documents"))


_DD_PADDED = "(' ' || " + dd_sql(_DD_NORMALIZE, col="text") + " || ' ')"
_LANGS_SORTED = sorted(LANG_MARKERS)
_DD_LANG_SCORES = ", ".join(
    f"({_dd_marker_hits('padded', LANG_MARKERS[lang])}) AS s_{lang}" for lang in _LANGS_SORTED
)
_DD_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN s_{lang} > 0 AND s_{lang} = best THEN '{lang}'" for lang in _LANGS_SORTED
    )
    + " ELSE 'und' END"
)

_DD_LANGID = f"""
WITH p AS (SELECT doc_id, {_DD_PADDED} AS padded FROM documents),
s AS (SELECT doc_id, {_DD_LANG_SCORES} FROM p),
b AS (SELECT *, greatest({", ".join("s_" + lang for lang in _LANGS_SORTED)}) AS best FROM s)
SELECT doc_id, {_DD_LANG_CASE} AS pred_lang, best::BIGINT AS marker_hits FROM b
"""

_register("text_language_id", _langid, _DD_LANGID)


def _langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a relation: the language-ID confusion
    matrix against the fixture's ground-truth ``lang`` column —
    (truth, prediction, count), the table a pipeline logs to decide
    whether the heuristic is good enough for routing.  Pure composition:
    ``language_id`` with the truth column passed through, one
    aggregate."""
    docs = _t(spark, sf_dir, "documents")
    pred = language_id(docs, keep_cols=("lang",))
    return pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))


_register(
    "text_langid_confusion",
    _langid_confusion,
    f"""
WITH p AS (SELECT doc_id, lang, {_DD_PADDED} AS padded FROM documents),
s AS (SELECT doc_id, lang, {_DD_LANG_SCORES} FROM p),
b AS (SELECT *, greatest({", ".join("s_" + lang for lang in _LANGS_SORTED)}) AS best FROM s)
SELECT lang, {_DD_LANG_CASE} AS pred_lang, count(*) AS n
FROM b GROUP BY 1, 2
""",
)


def _quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_t(spark, sf_dir, "documents"))


_DD_QUALITY = f"""
WITH n AS (
  SELECT doc_id, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents
),
f AS (
  SELECT doc_id,
         length(norm) AS n_chars,
         len(string_split(trim(norm), ' ')) AS n_words,
         ({_dd_marker_hits("(' ' || norm || ' ')", STOPWORDS_EN)}) AS stop_hits,
         length(regexp_replace(norm, '[A-Za-z0-9 ]', '', 'g')) AS n_sym
  FROM n
),
r AS (
  SELECT doc_id, n_chars, n_words,
         (n_chars - (n_words - 1))::DOUBLE / n_words AS avg_word_len,
         stop_hits::DOUBLE / n_words AS stopword_ratio,
         n_sym::DOUBLE / n_chars AS symbol_ratio
  FROM f
)
SELECT doc_id, n_chars::BIGINT AS n_chars, n_words::BIGINT AS n_words,
       round(avg_word_len, 4) AS avg_word_len,
       round(stopword_ratio, 4) AS stopword_ratio,
       round(symbol_ratio, 4) AS symbol_ratio,
       round(least(n_words / 100.0, 1.0) * 0.4
             + least(stopword_ratio * 5.0, 1.0) * 0.3
             + (1.0 - least(symbol_ratio * 10.0, 1.0)) * 0.3, 4) AS quality
FROM r
"""

_register("text_quality_score", _quality, _DD_QUALITY)


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(_t(spark, sf_dir, "documents"))


_DD_TOKENS = f"""
WITH n AS (SELECT doc_id, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents)
SELECT doc_id,
       len(string_split(trim(norm), ' '))::BIGINT AS ws_tokens,
       len(regexp_extract_all(norm, '{BPE_REGEX}'))::BIGINT AS bpe_tokens,
       round(length(norm)::DOUBLE / len(regexp_extract_all(norm, '{BPE_REGEX}')), 4) AS chars_per_token
FROM n
"""

_register("text_token_stats", _tokens, _DD_TOKENS)


def _fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_t(spark, sf_dir, "documents"))


_DD_FINGERPRINT = f"""
WITH n AS (SELECT doc_id, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents)
SELECT doc_id, md5(norm) AS fingerprint,
       ('0x' || substr(md5(norm), 1, 15))::BIGINT AS fingerprint60
FROM n
"""

_register("text_fingerprint", _fingerprint, _DD_FINGERPRINT)


# ==========================================================================


# ==========================================================================
# Readability scores (round 11): LIX (Björnsson 1968 — language-
# agnostic readability from sentence length and long-word share; the
# public formula words/sentences + 100 * longwords/words) per document,
# aggregated per language.  A curation pipeline tiers corpora by
# reading level next to the quality/gopher flags.  All integer: counts
# from identical string primitives on both engines, the two divisions
# as exact micro floor-divs, per-lang mean as a final floor-div.
# Scale shape: per-row expressions (JVM string functions, no UDF) +
# one partial-agg groupBy on lang — nothing else.
# ==========================================================================


def _readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    words = F.size(toks)
    longw = F.size(F.filter(toks, lambda t: F.length(t) >= 7))
    sents = F.greatest(
        F.lit(1),
        F.length("text") - F.length(F.translate("text", ".!?", "")),
    )
    per_doc = docs.select(
        "lang",
        words.alias("_w"),
        longw.alias("_lw"),
        sents.alias("_s"),
    ).withColumn(
        "_lix_micro",
        F.expr("(_w * 1000000) div _s + (_lw * 100000000) div _w"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("_ws"),
            F.sum("_lw").alias("_lws"),
            F.sum("_lix_micro").alias("_lixs"),
        )
        .selectExpr(
            "lang",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(_ws div n_docs AS BIGINT) AS avg_words",
            "CAST((_lws * 1000000) div _ws AS BIGINT) AS longword_ppm",
            "CAST(_lixs div n_docs AS BIGINT) AS avg_lix_micro",
        )
        .orderBy("lang")
    )


_DD_READABILITY = """
WITH per_doc AS (
  SELECT lang,
         len(string_split(trim(text), ' '))::BIGINT AS w,
         len(list_filter(string_split(trim(text), ' '),
                         t -> length(t) >= 7))::BIGINT AS lw,
         greatest(1, length(text) - length(translate(text, '.!?', '')))::BIGINT AS s
  FROM documents
),
scored AS (
  SELECT lang, w, lw,
         (w * 1000000) // s + (lw * 100000000) // w AS lix_micro
  FROM per_doc
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(w)::BIGINT // count(*)::BIGINT AS avg_words,
       (sum(lw)::BIGINT * 1000000) // sum(w)::BIGINT AS longword_ppm,
       sum(lix_micro)::BIGINT // count(*)::BIGINT AS avg_lix_micro
FROM scored GROUP BY lang ORDER BY lang
"""

_register("text_readability_scores", _readability, _DD_READABILITY)


# ==========================================================================
# RAKE keyword extraction (round 12) — Rapid Automatic Keyword
# Extraction (Rose et al. 2010, public method): candidate phrases are
# the maximal token runs BETWEEN delimiters (stopwords / non-alpha /
# single-char tokens), each word scores deg(w)/freq(w) over the
# candidate corpus (deg = summed length of phrases containing w, freq
# = occurrences), and a phrase scores the sum of its words' scores —
# the degree-weighting that makes RAKE prefer longer collocations
# where TextRank (sibling entry, graph_centrality.py) prefers central
# words.  Word scores are quantized to exact ppm integers BEFORE the
# phrase sum (same convention as Adamic-Adar's per-center terms), so
# the sum is order-free and cross-engine exact.
#
# Scale shape: phrase runs come from the per-doc gaps-and-islands
# window (pos - row_number over kept tokens — partitioned by doc,
# never global); word stats are one partial-agg groupBy over exploded
# phrase words; the rest is two keyed joins and a TakeOrdered top-20.
# Candidates are capped at 4 words (the standard RAKE maxWords
# config) so no phrase row exceeds a bounded width.
# ==========================================================================

_RAKE_MAXW = 4
_RAKE_TOP = 20


def _text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from ..operators.retrieval import tokenize_pos

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokenize_pos(docs)
    kept = toks.filter(
        F.col("term").rlike("^[a-z]{2,}$") & ~F.col("term").isin(STOPWORDS_EN)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = kept.withColumn("_isl", F.col("pos") - F.row_number().over(w))
    occ = (
        runs.groupBy("doc_id", "_isl")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "term"))),
                    lambda s: s["term"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .filter(F.col("plen") <= _RAKE_MAXW)
    )
    words = occ.select(
        "phrase", "plen", F.explode(F.split("phrase", " ")).alias("term")
    )
    wstats = words.groupBy("term").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    wscore = wstats.select(
        "term",
        F.expr("(deg * CAST(1000000 AS BIGINT)) div freq").alias("ws_ppm"),
    )
    pscore = (
        words.join(wscore, "term")
        .groupBy("phrase")
        .agg(
            F.sum("ws_ppm").alias("_tot_ppm"),
            F.count(F.lit(1)).alias("_n_wordocc"),
            F.max("plen").alias("n_words"),
        )
    )
    # identical phrases contribute plen words per occurrence; normalize
    # the summed score back to ONE occurrence (exact: _tot is a multiple)
    scored = pscore.select(
        "phrase",
        F.col("n_words").cast("long").alias("n_words"),
        F.expr("(_n_wordocc div n_words)").cast("long").alias("n_occ"),
        F.expr("_tot_ppm div (_n_wordocc div n_words)").alias("score_ppm"),
    )
    return scored.orderBy(
        F.col("score_ppm").desc(), F.col("n_occ").desc(), "phrase"
    ).limit(_RAKE_TOP)


_DD_RAKE = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim({dd_sql(_DD_NORMALIZE, col="text")}), ' ') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, i AS pos, lower(w[i]) AS term
  FROM toks, unnest(range(1, len(w) + 1)) AS t(i)
  WHERE w[i] != ''
),
kept AS (
  SELECT doc_id, pos, term,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM pos
  WHERE regexp_matches(term, '^[a-z]{{2,}}$')
    AND term NOT IN ({", ".join(f"'{s}'" for s in STOPWORDS_EN)})
),
occ AS (
  SELECT doc_id, isl, string_agg(term, ' ' ORDER BY pos) AS phrase,
         count(*)::BIGINT AS plen
  FROM kept GROUP BY 1, 2
  HAVING count(*) <= {_RAKE_MAXW}
),
words AS (
  SELECT phrase, plen, u.term
  FROM occ, unnest(string_split(phrase, ' ')) AS u(term)
),
wscore AS (
  SELECT term, (sum(plen)::BIGINT * 1000000) // count(*)::BIGINT AS ws_ppm
  FROM words GROUP BY term
),
pscore AS (
  SELECT w.phrase, sum(s.ws_ppm)::BIGINT AS tot_ppm,
         count(*)::BIGINT AS n_wordocc, max(w.plen)::BIGINT AS n_words
  FROM words w JOIN wscore s USING (term)
  GROUP BY w.phrase
)
SELECT phrase, n_words, (n_wordocc // n_words) AS n_occ,
       tot_ppm // (n_wordocc // n_words) AS score_ppm
FROM pscore
ORDER BY score_ppm DESC, n_occ DESC, phrase
LIMIT {_RAKE_TOP}
"""

_register("text_rake_keywords", _text_rake, _DD_RAKE)


# ==========================================================================
# Jensen-Shannon source divergence (round 12): for every source s,
# JSD(P_s || Q_s) between its unigram distribution and the REST of the
# corpus — the symmetric, always-finite drift number corpus intake
# dashboards plot per source (KL alone explodes on unshared words;
# the mutual-information entry reports a different, global quantity).
#
# Exactness (micro-nats, quantize-before-sum):
#   p_w/m_w = 2 c_w n_q / (c_w n_q + d_w n_s)  (all integers), so each
#   word's KL(P||M) term is c_w * (ln_micro(2 c_w n_q) -
#   ln_micro(c_w n_q + d_w n_s)) — an exact BIGINT — and
#   KL_micro = sum(term) div n_s; symmetrically for KL(Q||M); JSD =
#   (KL_p + KL_q) div 2.  No float ever sums across rows.
#
# Scale shape: one tokenize pass, one (source, term) partial-agg
# groupBy, one per-term global groupBy, a broadcast of the per-source
# totals (source domain), and a vocabulary x sources grid for the
# Q-side support (linear in vocabulary, which is language-bounded).
# ==========================================================================


def _js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import tokenize

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = tokenize(docs).join(docs.select("doc_id", "source"), "doc_id")
    per_st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    # per_st (sources x vocab, domain-bounded) feeds three branches
    # (per_t / per_s / the grid left join) and each re-ran the full
    # tokenize pass (16 parquet scans in the gated plan, r13 opt) —
    # pin so the corpus is tokenized once
    per_st = per_st.localCheckpoint(eager=False)
    per_t = per_st.groupBy("term").agg(F.sum("c").alias("g"))
    per_s = per_st.groupBy("source").agg(F.sum("c").alias("ns"))
    tot = per_s.agg(F.sum("ns").alias("nt"))
    # full (source x term) grid so words ABSENT from a source still
    # carry their Q-side mass; c coalesces to 0
    grid = (
        per_s.crossJoin(F.broadcast(tot))
        .crossJoin(per_t)
        .join(per_st, ["source", "term"], "left")
        .selectExpr(
            "source",
            "ns",
            "nt - ns AS nq",
            "coalesce(c, CAST(0 AS BIGINT)) AS c",
            "g - coalesce(c, CAST(0 AS BIGINT)) AS d",
        )
        # Degenerate-domain guard (ADVICE r12 #3): with a single source the
        # complement corpus is empty (nq = 0) and JSD-vs-rest is undefined
        # (ln(2*c*nq) = ln 0, division by n_tokens_rest = 0).  Drop such
        # sources on BOTH engines so the result is defined (empty for a
        # single-source corpus) instead of NULL/error.
        .where("nq > 0")
    )
    lnm = "CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
    term_p = (
        "CASE WHEN c > 0 THEN c * ("
        + lnm.format(x="2 * c * nq")
        + " - "
        + lnm.format(x="c * nq + d * ns")
        + ") ELSE 0 END"
    )
    term_q = (
        "CASE WHEN d > 0 THEN d * ("
        + lnm.format(x="2 * d * ns")
        + " - "
        + lnm.format(x="d * ns + c * nq")
        + ") ELSE 0 END"
    )
    agg = grid.groupBy("source").agg(
        F.max("ns").alias("n_tokens_src"),
        F.max("nq").alias("n_tokens_rest"),
        F.expr(f"sum({term_p})").alias("_kp"),
        F.expr(f"sum({term_q})").alias("_kq"),
    )
    # KL >= 0 mathematically, but per-term micro quantization can push a
    # near-zero sum a few micro NEGATIVE on a degenerate fixture.  Spark's
    # `div` and DuckDB's integer `//` BOTH truncate toward zero (verified:
    # (-7)//2 = -3 in DuckDB), so plain div already matches the oracle —
    # no floor rewrite needed (ADVICE r12 #1).
    kp_f = "_kp div n_tokens_src"
    kq_f = "_kq div n_tokens_rest"
    half = f"(({kp_f}) + ({kq_f})) div 2"
    return agg.selectExpr(
        "source",
        "CAST(n_tokens_src AS BIGINT) AS n_tokens_src",
        "CAST(n_tokens_rest AS BIGINT) AS n_tokens_rest",
        f"CAST({half} AS BIGINT) AS jsd_micro",
    ).orderBy("source")


def _dd_lnm(x: str) -> str:
    return f"CAST(floor(ln(({x})::DOUBLE) * 1000000 + 0.5) AS BIGINT)"


_DD_JSD = f"""
WITH {{tokens}},
st AS (
  SELECT d.source, t.term, count(*)::BIGINT AS c
  FROM tokens t JOIN documents d USING (doc_id)
  GROUP BY 1, 2
),
pt AS (SELECT term, sum(c)::BIGINT AS g FROM st GROUP BY 1),
ps AS (SELECT source, sum(c)::BIGINT AS ns FROM st GROUP BY 1),
tot AS (SELECT sum(ns)::BIGINT AS nt FROM ps),
grid AS (
  SELECT ps.source, ps.ns, tot.nt - ps.ns AS nq,
         coalesce(st.c, 0)::BIGINT AS c,
         pt.g - coalesce(st.c, 0)::BIGINT AS d
  FROM ps CROSS JOIN tot CROSS JOIN pt
  LEFT JOIN st ON st.source = ps.source AND st.term = pt.term
  WHERE tot.nt > ps.ns
),
agg AS (
  SELECT source, max(ns)::BIGINT AS n_tokens_src, max(nq)::BIGINT AS n_tokens_rest,
         sum(CASE WHEN c > 0 THEN c * ({_dd_lnm('2 * c * nq')} - {_dd_lnm('c * nq + d * ns')}) ELSE 0 END)::BIGINT AS kp,
         sum(CASE WHEN d > 0 THEN d * ({_dd_lnm('2 * d * ns')} - {_dd_lnm('d * ns + c * nq')}) ELSE 0 END)::BIGINT AS kq
  FROM grid GROUP BY 1
)
SELECT source, n_tokens_src, n_tokens_rest,
       (kp // n_tokens_src + kq // n_tokens_rest) // 2 AS jsd_micro
FROM agg ORDER BY source
"""

_register(
    "text_js_divergence_sources",
    _js_divergence_sources,
    _DD_JSD.replace("{tokens}", "tokens AS (\n  SELECT doc_id, lower(w) AS term\n  FROM (SELECT doc_id, " + dd_sql(_DD_NORMALIZE, col="text") + " AS norm FROM documents),\n       unnest(string_split(trim(norm), ' ')) AS t(w)\n  WHERE w != ''\n)"),
)
