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
    normalize_whitespace_col,
)
# C4 line-level quality filtering (round 4) — the fixtures are single-line
# word soup, so the query first BUILDS multi-line docs deterministically
# (8-word lines; every 3rd line gets terminal punctuation, every 7th a
# javascript/cookie boilerplate phrase, keyed on doc_id+line) identically
# on both sides, then applies operators/textstats.py::line_quality_filter.
# ==========================================================================

from ..operators.textstats import line_quality_filter  # noqa: E402


def _weave_lines(docs: DataFrame) -> DataFrame:
    words = F.split(F.trim(normalize_whitespace_col("text")), " ")
    docs = docs.withColumn("_w", words)
    nl = F.ceil(F.size("_w") / F.lit(8.0)).cast("int")

    def mk(j: Column) -> Column:
        base = F.concat_ws(" ", F.slice(F.col("_w"), j * F.lit(8) + F.lit(1), 8))
        base = F.concat(
            base,
            F.when(
                (F.col("doc_id") * 31 + j) % 7 == 0,
                F.lit(" please enable javascript cookies"),
            ).otherwise(F.lit("")),
        )
        return F.concat(
            base,
            F.when((F.col("doc_id") + j) % 3 == 0, F.lit(".")).otherwise(F.lit("")),
        )

    lines = F.transform(F.sequence(F.lit(0), nl - F.lit(1)), mk)
    return docs.withColumn("text", F.array_join(lines, "\n")).drop("_w")


def _c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _weave_lines(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    out = line_quality_filter(docs)
    return out.select(
        "doc_id", "n_lines", "n_kept",
        F.md5("filtered_text").alias("filt_md5"),
    )


_DD_C4_LINES = dd_sql(
    """
WITH w AS (
  SELECT doc_id, string_split(trim({norm}), ' ') AS words FROM documents
),
built AS (
  SELECT doc_id,
    array_to_string(
      list_transform(range(0, ceil(len(words) / 8.0)::INT),
        j -> (array_to_string(words[j*8+1 : j*8+8], ' ')
              || CASE WHEN (doc_id*31 + j) % 7 = 0
                   THEN ' please enable javascript cookies' ELSE '' END
              || CASE WHEN (doc_id + j) % 3 = 0 THEN '.' ELSE '' END)),
      chr(10)) AS text
  FROM w
),
split AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines FROM built
),
filt AS (
  SELECT doc_id, lines,
         list_filter(lines, l ->
           len(string_split(trim(l), ' ')) >= 3
           AND strpos(lower(l), 'javascript') = 0
           AND strpos(lower(l), 'cookie') = 0
           AND strpos(lower(l), 'lorem ipsum') = 0
           AND (ends_with(l, '.') OR ends_with(l, '!')
                OR ends_with(l, '?') OR ends_with(l, '"'))) AS kept
  FROM split
)
SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
       md5(coalesce(array_to_string(kept, chr(10)), '')) AS filt_md5
FROM filt
""",
    norm=dd_sql(_DD_NORMALIZE, col="text"),
)

_register("text_c4_line_filter", _c4_line_filter, _DD_C4_LINES)


# ==========================================================================
# CCNet-style LM quality scoring (round 5) — per-doc mean unigram
# log-probability under the corpus's own unigram LM, and the
# head/middle/tail equal-frequency split cut on it
# (operators/textstats.py::unigram_logprob / ccnet_buckets;
# Wenzek et al. 2020).
# ==========================================================================

from ..operators.textstats import ccnet_buckets, unigram_logprob  # noqa: E402

# Shared tokens -> tf -> vocab-count SQL (same tokenization convention as
# the BM25/vocab queries).
_DD_UNIGRAM_SCORED = f"""
WITH tokens AS (
  SELECT doc_id, lower(w) AS term
  FROM (SELECT doc_id, {dd_sql(_DD_NORMALIZE, col="text")} AS norm FROM documents),
       unnest(string_split(trim(norm), ' ')) AS t(w)
  WHERE w != ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term),
cnt AS (SELECT term, sum(tf) AS c FROM tf GROUP BY term),
tot AS (SELECT sum(c) AS n FROM cnt),
scored AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         sum(tf * ln(c::DOUBLE / n::DOUBLE)) / sum(tf) AS lp
  FROM tf JOIN cnt USING (term) CROSS JOIN tot
  GROUP BY doc_id
)
"""


def _text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = unigram_logprob(docs)
    return out.select(
        "doc_id", "n_tokens", F.round("logprob", 4).alias("logprob")
    )


_register(
    "text_unigram_logprob",
    _text_unigram_logprob,
    _DD_UNIGRAM_SCORED
    + """
SELECT doc_id, n_tokens, round(lp, 4) AS logprob FROM scored
""",
)


def _text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ccnet_buckets(docs)


_register(
    "text_ccnet_buckets",
    _text_ccnet_buckets,
    _DD_UNIGRAM_SCORED
    + """
SELECT doc_id, n_tokens, round(lp, 4) AS logprob,
       (['head', 'middle', 'tail'])[
         ntile(3) OVER (ORDER BY round(lp, 4) DESC, doc_id)] AS bucket
FROM scored
""",
)


# ==========================================================================
# Inter-document line dedup (round 5) — RefinedWeb/Falcon repeated-span
# removal (operators/dedup.py::interdoc_line_dedup) over the same woven
# multi-line fixture as the C4 filter.  Non-vacuous: the small fixture
# vocabulary makes ~150 8-word lines recur across distinct docs at
# sf0.01 (~90 at sf0.001).
# ==========================================================================

from ..operators.dedup import interdoc_line_dedup  # noqa: E402


def _interdoc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _weave_lines(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    out = interdoc_line_dedup(docs, max_docs=1)
    return out.select(
        "doc_id", "n_lines", "n_kept", F.md5("text").alias("kept_md5")
    )


_DD_LINE_DEDUP = dd_sql(
    """
WITH w AS (
  SELECT doc_id, string_split(trim({norm}), ' ') AS words FROM documents
),
built AS (
  SELECT doc_id,
    array_to_string(
      list_transform(range(0, ceil(len(words) / 8.0)::INT),
        j -> (array_to_string(words[j*8+1 : j*8+8], ' ')
              || CASE WHEN (doc_id*31 + j) % 7 = 0
                   THEN ' please enable javascript cookies' ELSE '' END
              || CASE WHEN (doc_id + j) % 3 = 0 THEN '.' ELSE '' END)),
      chr(10)) AS text
  FROM w
),
ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM built),
lines AS (
  SELECT doc_id, i AS pos, ls[i] AS line
  FROM ls, unnest(range(1, len(ls)+1)) AS t(i)
),
freq AS (SELECT md5(line) AS h, count(DISTINCT doc_id) AS nd FROM lines GROUP BY 1),
kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l JOIN freq f ON md5(l.line) = f.h
  WHERE f.nd <= 1
),
reb AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id, len(string_split(b.text, chr(10))) AS n_lines,
       coalesce(r.n_kept, 0) AS n_kept,
       md5(coalesce(r.text, '')) AS kept_md5
FROM built b LEFT JOIN reb r USING (doc_id)
""",
    norm=dd_sql(_DD_NORMALIZE, col="text"),
)

_register("dedup_interdoc_lines", _interdoc_line_dedup, _DD_LINE_DEDUP)


# ==========================================================================
