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
from .dedup import STOPWORDS_EN, _dd_shingles, exact_dedup, language_id, quality_score  # noqa: F401
from .pii_decontam_mixture import (  # noqa: F401
    _CAP_SALT,
    _DD_MIX_CASE,
    _DECONTAM_N,
    _MIX_DEFAULT,
    _MIX_RATES,
    contamination_flags,
    mixture_sample,
    source_cap,
    stable_hash60_sql,
)
from .textstats import (  # noqa: F401
    _DD_LANG_CASE,
    _DD_LANG_SCORES,
    _DD_PADDED,
    _LANGS_SORTED,
    _dd_marker_hits,
)
from .train_export import token_budget_select  # noqa: F401
# Composed LLM-corpus preparation (round 5) — the FineWeb/RefinedWeb-class
# end-to-end prep expressed as ONE declarative plan: exact dedup ->
# language ID + quality scoring (single projection pass, keep_cols
# composition) -> benchmark decontamination (broadcast anti-join) ->
# deterministic mixture sampling.  Every stage is an already-oracle-gated
# operator; this entry gates their COMPOSITION.
# ==========================================================================

_PREP_QUALITY_MIN = 0.5


def _llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-plan corpus prep.  Scale shape: the corpus path itself
    shuffles ONCE (dedup: one narrow struct per distinct fingerprint);
    langid+quality are one codegen projection over the survivors
    (keep_cols passthrough — no re-join on id); the decontam side
    branch shuffles only hashed gram keys (bytes per gram, never text)
    to produce a tiny contaminated-id list that broadcasts back as a
    left-anti join; the mixture filter is zero-shuffle codegen."""
    from ..operators.dedup import exact_dedup
    from ..operators.textstats import language_id, quality_score

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    bench = docs.filter(F.col("doc_id") % 50 == 0)

    surv = exact_dedup(docs).select("doc_id", "text", "source")
    # train feeds the langid/quality chain AND the decontam gram side;
    # as a plain branch each consumer re-ran the dedup shuffle over the
    # full corpus text (r13 opt — pin once)
    train = surv.filter(F.col("doc_id") % 50 != 0).localCheckpoint(eager=False)

    enriched = quality_score(
        language_id(train, keep_cols=("text", "source")),
        keep_cols=("source", "pred_lang"),
    )
    kept = enriched.filter(
        (F.col("pred_lang") == "en") & (F.col("quality") >= _PREP_QUALITY_MIN)
    )

    bad = (
        contamination_flags(train, bench, n=_DECONTAM_N)
        .filter("contaminated")
        .select("doc_id")
    )
    clean = kept.join(F.broadcast(bad), "doc_id", "left_anti")

    out = mixture_sample(clean, _MIX_RATES, default_rate=_MIX_DEFAULT)
    return out.select("doc_id", "source", "pred_lang", "quality")


_DD_CORPUS_PREP = dd_sql(
    """
WITH docs AS (SELECT doc_id, text, source FROM documents),
surv AS (
  SELECT doc_id, text, source FROM docs
  QUALIFY row_number() OVER (PARTITION BY md5({normtext}) ORDER BY doc_id) = 1
),
train AS (SELECT * FROM surv WHERE doc_id % 50 != 0),
lp AS (SELECT doc_id, source, text, {padded} AS padded FROM train),
ls AS (SELECT doc_id, source, text, {lang_scores} FROM lp),
lb AS (SELECT *, greatest({score_list}) AS best FROM ls),
lang AS (SELECT doc_id, source, text, {lang_case} AS pred_lang FROM lb),
qn AS (SELECT doc_id, source, pred_lang, {normtext} AS norm FROM lang),
qf AS (
  SELECT doc_id, source, pred_lang,
         length(norm) AS n_chars,
         len(string_split(trim(norm), ' ')) AS n_words,
         ({stop_hits}) AS stop_hits,
         length(regexp_replace(norm, '[A-Za-z0-9 ]', '', 'g')) AS n_sym
  FROM qn
),
enr AS (
  SELECT doc_id, source, pred_lang,
         round(least(n_words / 100.0, 1.0) * 0.4
               + least((stop_hits::DOUBLE / n_words) * 5.0, 1.0) * 0.3
               + (1.0 - least((n_sym::DOUBLE / n_chars) * 10.0, 1.0)) * 0.3, 4) AS quality
  FROM qf
),
kept AS (SELECT * FROM enr WHERE pred_lang = 'en' AND quality >= {qmin}),
tw AS (SELECT doc_id, string_split(trim(norm), ' ') AS words, trim(norm) AS norm_text
       FROM (SELECT doc_id, {normtext} AS norm FROM train)),
tsh AS (SELECT doc_id, {shingles} AS shingles FROM tw),
bw AS (SELECT doc_id, string_split(trim(norm), ' ') AS words, trim(norm) AS norm_text
       FROM (SELECT doc_id, {normtext} AS norm FROM docs WHERE doc_id % 50 = 0)),
bsh AS (SELECT doc_id, {shingles} AS shingles FROM bw),
bench AS (SELECT DISTINCT {h} AS gram_h FROM (SELECT unnest(shingles) AS s FROM bsh)),
tg AS (SELECT doc_id, {h} AS gram_h FROM (SELECT doc_id, unnest(shingles) AS s FROM tsh)),
bad AS (SELECT DISTINCT doc_id FROM tg JOIN bench USING (gram_h)),
final AS (SELECT k.* FROM kept k ANTI JOIN bad b USING (doc_id))
SELECT doc_id, source, pred_lang, quality FROM final
WHERE (('0x' || substr(md5('mixture' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000)
      < (CASE source {mix_cases} ELSE {mix_dflt} END)
""",
    normtext=dd_sql(_DD_NORMALIZE, col="text"),
    padded=_DD_PADDED,
    lang_scores=_DD_LANG_SCORES,
    score_list=", ".join("s_" + lang for lang in _LANGS_SORTED),
    lang_case=_DD_LANG_CASE,
    stop_hits=_dd_marker_hits("(' ' || norm || ' ')", STOPWORDS_EN),
    qmin=_PREP_QUALITY_MIN,
    shingles=_dd_shingles("norm_text", _DECONTAM_N, words="words"),
    h=stable_hash60_sql("s"),
    mix_cases=_DD_MIX_CASE,
    mix_dflt=int(round(_MIX_DEFAULT * 10000)),
)

_register("pipeline_llm_corpus_prep", _llm_corpus_prep, _DD_CORPUS_PREP)


def _prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prep pipeline's YIELD FUNNEL: surviving-doc counts after each
    stage (raw -> exact dedup -> train split -> lang+quality ->
    decontam -> mixture) — the one-glance audit of where documents go,
    over the identical stage logic the composed entry gates."""
    from ..operators.dedup import exact_dedup
    from ..operators.textstats import language_id, quality_score

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    surv = exact_dedup(docs).select("doc_id", "text", "source")
    train = surv.filter(F.col("doc_id") % 50 != 0)
    enriched = quality_score(
        language_id(train, keep_cols=("text", "source")),
        keep_cols=("source", "pred_lang"),
    )
    kept = enriched.filter(
        (F.col("pred_lang") == "en") & (F.col("quality") >= _PREP_QUALITY_MIN)
    )
    bad = (
        contamination_flags(train, bench, n=_DECONTAM_N)
        .filter("contaminated")
        .select("doc_id")
    )
    clean = kept.join(F.broadcast(bad), "doc_id", "left_anti")
    out = mixture_sample(clean, _MIX_RATES, default_rate=_MIX_DEFAULT)

    stages = [
        ("raw", docs), ("exact_dedup", surv), ("train_split", train),
        ("lang_quality", kept), ("decontam", clean), ("mixture", out),
    ]
    counts = [
        df.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        for i, (name, df) in enumerate(stages)
    ]
    from functools import reduce as _reduce

    return _reduce(DataFrame.unionByName, counts)


_DD_PREP_FUNNEL = (
    _DD_CORPUS_PREP[: _DD_CORPUS_PREP.index(
        "SELECT doc_id, source, pred_lang, quality FROM final"
    )]
    + dd_sql(
        """mix AS (
  SELECT doc_id FROM final
  WHERE (('0x' || substr(md5('mixture' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000)
        < (CASE source {cases} ELSE {dflt} END)
)
SELECT 0 AS stage_idx, 'raw' AS stage, count(*) AS n_docs FROM docs
UNION ALL SELECT 1, 'exact_dedup', count(*) FROM surv
UNION ALL SELECT 2, 'train_split', count(*) FROM train
UNION ALL SELECT 3, 'lang_quality', count(*) FROM kept
UNION ALL SELECT 4, 'decontam', count(*) FROM final
UNION ALL SELECT 5, 'mixture', count(*) FROM mix
""",
        cases=_DD_MIX_CASE,
        dflt=int(round(_MIX_DEFAULT * 10000)),
    )
)
# the sliced prefix ends inside the WITH list at "final AS (...)\n", so
# the appended fragment must open with a sibling CTE:
_DD_PREP_FUNNEL = _DD_PREP_FUNNEL.replace(
    "final AS (SELECT k.* FROM kept k ANTI JOIN bad b USING (doc_id))\nmix AS (",
    "final AS (SELECT k.* FROM kept k ANTI JOIN bad b USING (doc_id)),\nmix AS (",
)

_register("pipeline_prep_funnel", _prep_funnel, _DD_PREP_FUNNEL)


# Round-5 extension: the same composed prep, then the r5 stages a real
# training cut adds — per-source domain cap (≤8: bites on src0/src1 at
# every fixture) and a 2k-token budget fill (~55-60% of the capped
# corpus tokens — partial everywhere).  Gates the END-TO-END composition
# dedup -> langid/quality -> decontam -> mixture -> cap -> budget.

_PREP_CAP = 8
_PREP_BUDGET = 2_000


def _llm_corpus_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 composition + source_cap + token_budget_select.  The cap's
    source window and the budget's prefix sum both run over the ~70
    prep survivors, not the corpus — their shuffles are negligible next
    to the dedup shuffle upstream."""
    base = _llm_corpus_prep(spark, sf_dir)
    capped = source_cap(base, cap=_PREP_CAP, salt=_CAP_SALT)
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(normalize_whitespace_col("text")), " ")).alias(
            "n_tokens"
        ),
    )
    sized = capped.join(toks, "doc_id")
    out = token_budget_select(sized, budget=_PREP_BUDGET)
    return out.select("doc_id", "source", "quality", "n_tokens")


_DD_CORPUS_PREP_V2 = dd_sql(
    f"""
WITH prep AS (
{_DD_CORPUS_PREP}
),
capped AS (
  SELECT * FROM prep
  QUALIFY row_number() OVER (
    PARTITION BY source
    ORDER BY ('0x' || substr(md5('{_CAP_SALT}' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT,
             doc_id
  ) <= {_PREP_CAP}
),
sized AS (
  SELECT c.doc_id, c.source, c.quality,
         len(string_split(trim({{norm}}), ' ')) AS n_tokens
  FROM capped c JOIN documents d USING (doc_id)
),
sel AS (
  SELECT doc_id, source, quality, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY ('0x' || substr(md5('budget' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT,
                    doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM sized
)
SELECT doc_id, source, quality, n_tokens FROM sel WHERE before < {_PREP_BUDGET}
""",
    norm=dd_sql(_DD_NORMALIZE, col="d.text"),
)

_register("pipeline_llm_corpus_prep_v2", _llm_corpus_prep_v2, _DD_CORPUS_PREP_V2)


# ==========================================================================
