# ==========================================================================
# Bigram-LM perplexity quality filter (round 8) — operators/lm.py.  The
# CCNet recipe (Wenzek et al. 2020): score every document with an n-gram
# LM in integer micro-nats, tier per-language into head/middle/tail,
# train on the head.  Model = MLE bigram counts over the corpus with
# stupid backoff (alpha = 0.4) to a continuation-unigram for hapax
# bigrams; every count marginal derives from one aggregated bigram-count
# relation, the corpus total rides as a broadcast 1-row cross join, and
# nothing collects.  The tier operator deliberately avoids
# `ntile() OVER (PARTITION BY lang)` — a handful of language partitions
# is a single-task funnel at corpus scale — and instead reconstructs
# SQL ntile arithmetically from one range-repartitioned global_rank
# pass (the oracle uses the real windowed ntile, so the equivalence is
# hash-gated, not asserted).
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

_LM_MIN_COUNT = 2


def _lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import perplexity_scores

    docs = _t(spark, sf_dir, "documents")
    return perplexity_scores(docs, min_count=_LM_MIN_COUNT).orderBy("doc_id")


def _dd_lm_base() -> str:
    from ..operators.lm import BACKOFF_PENALTY_MICRO

    norm = dd_sql(_DD_NORMALIZE, col="text")
    return f"""n AS (SELECT doc_id, {norm} AS norm FROM documents),
terms AS MATERIALIZED (
  SELECT doc_id,
         list_filter(list_transform(string_split(trim(norm), ' '), x -> lower(x)),
                     x -> x != '') AS ts
  FROM n
),
bg AS MATERIALIZED (
  SELECT doc_id, ts[i.i] AS w1, ts[i.i + 1] AS w2
  FROM terms, unnest(range(1, len(ts))) AS i(i)
),
c2 AS MATERIALIZED (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg GROUP BY 1, 2),
c1 AS MATERIALIZED (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
cu AS MATERIALIZED (SELECT w2, CAST(sum(c2) AS BIGINT) AS cu FROM c2 GROUP BY 1),
tot AS MATERIALIZED (SELECT CAST(sum(c2) AS BIGINT) AS total FROM c2),
costs AS MATERIALIZED (
  SELECT c2.w1, c2.w2,
         CASE WHEN c2.c2 >= {_LM_MIN_COUNT}
              THEN CAST(floor(-ln(c2.c2::DOUBLE / c1.c1::DOUBLE)
                              * 1000000.0 + 0.5) AS BIGINT)
              ELSE {BACKOFF_PENALTY_MICRO}
                   + CAST(floor(-ln(cu.cu::DOUBLE / tot.total::DOUBLE)
                                * 1000000.0 + 0.5) AS BIGINT)
         END AS cost_micro,
         (c2.c2 < {_LM_MIN_COUNT}) AS backed_off
  FROM c2 JOIN c1 USING (w1) JOIN cu USING (w2) CROSS JOIN tot
),
sc AS MATERIALIZED (
  SELECT bg.doc_id,
         count(*)::BIGINT AS n_bigrams,
         CAST(sum(cost_micro) AS BIGINT) AS total_cost_micro,
         CAST(sum(CASE WHEN backed_off THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff
  FROM bg JOIN costs USING (w1, w2)
  GROUP BY 1
)"""


_DD_LM_SCORES = f"""
WITH {_dd_lm_base()}
SELECT doc_id, n_bigrams, total_cost_micro,
       total_cost_micro // n_bigrams AS avg_cost_micro,
       n_backoff
FROM sc
ORDER BY doc_id
"""

_register("text_lm_perplexity", _lm_scores, _DD_LM_SCORES)


def _lm_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import perplexity_scores, quality_tiers

    docs = _t(spark, sf_dir, "documents")
    scored = perplexity_scores(docs, min_count=_LM_MIN_COUNT)
    return quality_tiers(scored, docs.select("doc_id", "lang"), tiles=3)


_DD_LM_TIERS = f"""
WITH {_dd_lm_base()},
docsc AS MATERIALIZED (
  SELECT s.doc_id, d.lang,
         s.total_cost_micro // s.n_bigrams AS avg_cost_micro
  FROM sc s JOIN documents d USING (doc_id)
),
tiered AS (
  SELECT lang, avg_cost_micro,
         CAST(ntile(3) OVER (PARTITION BY lang
                             ORDER BY avg_cost_micro, doc_id) AS INTEGER) AS tier
  FROM docsc
)
SELECT lang, tier,
       count(*)::BIGINT AS n_docs,
       CAST(min(avg_cost_micro) AS BIGINT) AS min_cost_micro,
       CAST(max(avg_cost_micro) AS BIGINT) AS max_cost_micro,
       CAST(sum(avg_cost_micro) AS BIGINT) AS sum_cost_micro
FROM tiered
GROUP BY lang, tier
ORDER BY lang, tier
"""

_register("text_lm_quality_tiers", _lm_tiers, _DD_LM_TIERS)


# ---- interpolated Kneser-Ney twin (operators/lm.py::kneser_ney_costs) ----
# The model class KenLM ships (so the closest analog to CCNet's actual
# scorer).  The probability is a two-term sum, so it is quantized ONCE
# from a double expression written in the identical operation order on
# both engines; the floor-margin guard in tests/test_lm.py covers the
# cross-libm ln risk exactly as for the other micro-nat models.

def _lm_scores_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import perplexity_scores_kn

    docs = _t(spark, sf_dir, "documents")
    return (
        perplexity_scores_kn(docs)
        .withColumnRenamed("n_backoff", "n_hapax")
        .orderBy("doc_id")
    )


def _dd_lm_kn() -> str:
    from ..operators.lm import KN_DISCOUNT

    norm = dd_sql(_DD_NORMALIZE, col="text")
    return f"""n AS (SELECT doc_id, {norm} AS norm FROM documents),
terms AS MATERIALIZED (
  SELECT doc_id,
         list_filter(list_transform(string_split(trim(norm), ' '), x -> lower(x)),
                     x -> x != '') AS ts
  FROM n
),
bg AS MATERIALIZED (
  SELECT doc_id, ts[i.i] AS w1, ts[i.i + 1] AS w2
  FROM terms, unnest(range(1, len(ts))) AS i(i)
),
c2 AS MATERIALIZED (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg GROUP BY 1, 2),
c1m AS MATERIALIZED (
  SELECT w1, CAST(sum(c2) AS BIGINT) AS c1, count(*)::BIGINT AS n1p
  FROM c2 GROUP BY 1
),
cutm AS MATERIALIZED (SELECT w2, count(*)::BIGINT AS cut FROM c2 GROUP BY 1),
tottm AS MATERIALIZED (SELECT count(*)::BIGINT AS tott FROM c2),
kcosts AS MATERIALIZED (
  SELECT c2.w1, c2.w2,
         CAST(floor(-ln(
           ((CAST(c2.c2 AS DOUBLE) - {KN_DISCOUNT}) / CAST(c1m.c1 AS DOUBLE))
           + ((({KN_DISCOUNT} * CAST(c1m.n1p AS DOUBLE)) / CAST(c1m.c1 AS DOUBLE))
           * (CAST(cutm.cut AS DOUBLE) / CAST(tottm.tott AS DOUBLE)))
         ) * 1000000.0 + 0.5) AS BIGINT) AS cost_micro,
         (c2.c2 = 1) AS backed_off
  FROM c2 JOIN c1m USING (w1) JOIN cutm USING (w2) CROSS JOIN tottm
)"""


_DD_LM_KN_SCORES = f"""
WITH {_dd_lm_kn()}
SELECT bg.doc_id,
       count(*)::BIGINT AS n_bigrams,
       CAST(sum(cost_micro) AS BIGINT) AS total_cost_micro,
       CAST(sum(cost_micro) AS BIGINT) // count(*)::BIGINT AS avg_cost_micro,
       CAST(sum(CASE WHEN backed_off THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
FROM bg JOIN kcosts USING (w1, w2)
GROUP BY bg.doc_id
ORDER BY bg.doc_id
"""

_register("text_lm_perplexity_kn", _lm_scores_kn, _DD_LM_KN_SCORES)
