"""Bigram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020: score web documents with a KenLM n-gram model,
bucket into head/middle/tail tiers, keep the fluent head for LLM training).

The reference engine has no LM filter (its quality signal is the embedding
itself); this module is part of the training-data-pipeline surface the
Spark engine adds as first class.  Design:

* **Model = MLE bigram counts over the scored corpus itself**, with
  stupid-backoff (Brants et al. 2007) to a continuation-unigram model for
  hapax bigrams: rare transitions fall back to ``alpha * P_uni(w2)`` so a
  one-off typo is penalized but not priced as if it were the only event
  in the corpus.  Every quantity derives from ONE aggregated relation
  (the bigram-count table): context totals ``c1`` are its per-``w1``
  sums, continuation totals ``cu`` its per-``w2`` sums, and the corpus
  total is a 1-row in-plan aggregate (broadcast cross join — no
  ``collect``).  A deployment scoring with a *pretrained* model swaps
  the counts relation; the scorer signature takes it as input.

* **Integer micro-nat costs** (the unigram-LM convention,
  operators/unigram.py): ``cost = floor(-ln(p) * 1e6 + 0.5)`` as BIGINT,
  so per-document totals are exact integer sums, cross-engine
  hash-stable, and order-independent.  The backoff branch adds the
  constant ``floor(-ln(alpha)*1e6+0.5)`` to the quantized unigram cost —
  an integer sum of two independently quantized terms, bit-equal in any
  engine that quantizes the same two ratios.  ``ln`` itself is evaluated
  in-plan (whole-stage codegen); the floor-margin test
  (tests/test_lm.py) verifies every fixture ratio sits far from a
  quantization boundary, the same guard the unigram tokenizer ships.

* **Scale shape**: tokenize -> in-array bigram zip (no positional
  self-join, no shuffle to form bigrams) -> map-side-combined counts ->
  key-partitioned join of the bigram stream against the cost table
  (both sides hash on (w1, w2); Spark broadcasts automatically when the
  model is small) -> per-doc aggregate.  Nothing collects; the cost
  table stays distributed, so a 100 TB corpus with a billion distinct
  bigrams is the same plan.

* **Tiers without a low-cardinality window**: CCNet buckets per-language
  by perplexity terciles.  ``ntile(3) OVER (PARTITION BY lang ...)``
  would funnel each language's documents through a single task — the
  classic skew cliff when one language holds half the corpus — so the
  tier operator instead runs the two-pass range-repartitioned
  :func:`~.ranking.global_rank` over ``(lang, cost, doc_id)``, converts
  to per-language ranks by subtracting tiny per-language offsets
  (a broadcast-size relation: one row per language), and reconstructs
  SQL ``ntile`` arithmetically via :func:`~.ranking.ntile_from_rank`.
  The oracle uses the actual windowed ``ntile`` — semantics provably
  identical, plans deliberately different.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_whitespace_col
from .ranking import global_rank, ntile_from_rank

SCALE = 1_000_000  # integer micro-nat cost units (operators/unigram.py)
BACKOFF_ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007)
BACKOFF_PENALTY_MICRO = int(math.floor(-math.log(BACKOFF_ALPHA) * SCALE + 0.5))


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text) -> one (doc_id, w1, w2) row per adjacent token pair.

    Bigrams are zipped inside the token array (``transform`` over an
    index ``sequence``) before the explode, so forming them costs no
    shuffle and no positional self-join.  Documents with fewer than two
    tokens produce no rows (there is no transition to score) — the
    ``CASE`` guard matters because Spark's ``sequence(0, -1)`` would
    count *down*, not return empty.
    """
    ws = F.expr(
        "filter(transform(split(trim(__norm), ' '), x -> lower(x)),"
        " x -> x != '')"
    )
    return (
        docs.select(
            id_col, normalize_whitespace_col(text_col).alias("__norm")
        )
        .select(id_col, ws.alias("__ws"))
        .select(
            id_col,
            F.explode(
                F.expr(
                    "CASE WHEN size(__ws) >= 2 THEN"
                    " transform(sequence(0, size(__ws) - 2),"
                    "           i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))"
                    " ELSE array() END"
                )
            ).alias("__bg"),
        )
        .select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )


def bigram_lm_costs(bigrams: DataFrame, min_count: int = 2) -> DataFrame:
    """Bigram stream -> (w1, w2, c2, cost_micro, backed_off) model table.

    ``cost_micro`` is the integer micro-nat transition cost:

    * seen bigram (``c2 >= min_count``):  ``floor(-ln(c2/c1)*1e6 + 0.5)``
      where ``c1`` is the context total (all bigrams starting with
      ``w1``) — the MLE conditional.
    * rare bigram (``c2 < min_count``): stupid backoff —
      ``floor(-ln(alpha)*1e6+0.5) + floor(-ln(cu/total)*1e6+0.5)`` where
      ``cu`` counts bigrams *ending* in ``w2`` (continuation unigram)
      and ``total`` is the corpus bigram count.

    All three marginals aggregate the already-reduced count table, not
    the raw stream; ``total`` rides in as a broadcast 1-row cross join.
    """
    # Materialize the reduced count relation once: c1 / cu / total are
    # all its re-aggregations, and without the checkpoint each one
    # re-executes the corpus tokenize + explode + group-by lineage
    # (the physical plan showed five parquet scans).  With it the
    # corpus is read exactly twice end-to-end: once here, once by the
    # scoring join.  The checkpoint is distributed (executor-local
    # blocks) — distinct-bigram cardinality never funnels anywhere.
    c2 = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    cu = c2.groupBy("w2").agg(F.sum("c2").alias("cu"))
    total = c2.agg(F.sum("c2").alias("total"))

    mle = F.expr(
        f"CAST(floor(-ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))"
        f" * {SCALE}.0 + 0.5) AS BIGINT)"
    )
    backoff = F.lit(BACKOFF_PENALTY_MICRO).cast("long") + F.expr(
        f"CAST(floor(-ln(CAST(cu AS DOUBLE) / CAST(total AS DOUBLE))"
        f" * {SCALE}.0 + 0.5) AS BIGINT)"
    )
    return (
        c2.join(c1, "w1")
        .join(cu, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "c2",
            F.when(F.col("c2") >= F.lit(min_count), mle)
            .otherwise(backoff)
            .alias("cost_micro"),
            (F.col("c2") < F.lit(min_count)).alias("backed_off"),
        )
    )


def score_documents(
    bigrams: DataFrame, costs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Join the bigram stream to the model and aggregate per document.

    Returns (doc_id, n_bigrams, total_cost_micro, avg_cost_micro,
    n_backoff).  ``avg_cost_micro`` is the exact integer division
    ``total div n`` — the per-transition perplexity proxy in micro-nats
    (perplexity itself would be ``exp(avg/1e6)``; the monotone integer
    form is what ranking and tiering consume, and it hashes exactly).
    """
    return (
        bigrams.join(costs.select("w1", "w2", "cost_micro", "backed_off"), ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("cost_micro").alias("total_cost_micro"),
            F.sum(F.col("backed_off").cast("long")).alias("n_backoff"),
        )
        .withColumn(
            "avg_cost_micro",
            F.expr("total_cost_micro div n_bigrams"),
        )
        .select(
            id_col, "n_bigrams", "total_cost_micro", "avg_cost_micro", "n_backoff"
        )
    )


def perplexity_scores(
    docs: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end self-scored corpus: train MLE+backoff counts on
    ``docs`` and score the same documents (the CCNet monolingual-corpus
    shape; pass a foreign ``costs`` relation to :func:`score_documents`
    to score against a pretrained model instead)."""
    bg = doc_bigrams(docs, text_col=text_col, id_col=id_col)
    return score_documents(bg, bigram_lm_costs(bg, min_count=min_count), id_col)


def quality_tiers(
    scored: DataFrame,
    langs: DataFrame,
    tiles: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head/middle/tail tiering, skew-proof.

    ``scored`` is :func:`perplexity_scores` output; ``langs`` maps
    ``doc_id -> lang``.  Rank order is (avg_cost_micro, doc_id) within
    language — fluent (cheap) documents first, doc_id as the total-order
    tiebreak.  Implementation is one :func:`global_rank` pass over the
    composite (lang, cost, id) order plus a per-language offset join
    (|languages| rows, broadcast), NOT ``ntile OVER (PARTITION BY
    lang)`` — a window partitioned by a handful of languages is a
    single-task funnel per language at corpus scale.

    Returns one row per (lang, tier): document count, min/max/sum of the
    per-doc average cost — the relation a pipeline filters against
    (``tier = 1`` = head).
    """
    # Per-doc relation, materialized: global_rank consumes its input
    # twice (partition summary + final rank pass) and the per-language
    # counts a third time — without the checkpoint the whole scoring
    # pipeline above would re-execute for each.
    s = scored.join(langs, id_col).localCheckpoint(eager=True)
    ranked = global_rank(
        s, [F.col("lang"), F.col("avg_cost_micro"), F.col(id_col)]
    )
    per_lang = s.groupBy("lang").agg(F.count(F.lit(1)).alias("_lang_n"))
    # exclusive offsets: triangular join over the |languages|-row relation
    offsets = (
        per_lang.alias("a")
        .join(
            per_lang.alias("b"),
            F.col("b.lang") < F.col("a.lang"),
            "left",
        )
        .groupBy(F.col("a.lang").alias("lang"), F.col("a._lang_n").alias("_lang_n"))
        .agg(F.coalesce(F.sum("b._lang_n"), F.lit(0)).alias("_offset"))
    )
    in_lang = ranked.join(F.broadcast(offsets), "lang").withColumn(
        "_lang_rank", F.col("_rank") - F.col("_offset")
    )
    tiered = in_lang.withColumn(
        "tier",
        ntile_from_rank(F.col("_lang_rank"), F.col("_lang_n"), tiles).cast("int"),
    )
    return (
        tiered.groupBy("lang", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("avg_cost_micro").alias("min_cost_micro"),
            F.max("avg_cost_micro").alias("max_cost_micro"),
            F.sum("avg_cost_micro").alias("sum_cost_micro"),
        )
        .orderBy("lang", "tier")
    )


# Interpolated Kneser-Ney (Kneser & Ney 1995; Chen & Goodman 1999) — the
# smoothing KenLM itself ships, i.e. the actual CCNet scoring model
# class.  Absolute discount d = 3/4 (exactly representable in binary64,
# so `c2 - 0.75` is an exact float op):
#
#     P_KN(w2|w1) = (c(w1,w2) - d) / c(w1)
#                 + (d * N1+(w1,*) / c(w1)) * (N1+(*,w2) / N1+(*,*))
#
# where the N1+ terms are bigram TYPE counts (how many distinct
# continuations / contexts), the continuation distribution that makes
# KN the strongest fixed-order n-gram smoother: "York" is frequent but
# only ever follows "New", so its continuation probability is tiny.
KN_DISCOUNT = 0.75


def kneser_ney_costs(bigrams: DataFrame) -> DataFrame:
    """Bigram stream -> (w1, w2, c2, cost_micro, backed_off) under
    interpolated Kneser-Ney — a drop-in alternative to
    :func:`bigram_lm_costs` for :func:`score_documents`.

    Every marginal (context total ``c1``, context type count ``n1p``,
    continuation type count ``cut``, total type count ``tott``) is a
    re-aggregation of the ONE reduced count relation; ``c1`` and
    ``n1p`` share a single groupBy pass.  The probability is a sum of
    two terms so it cannot be quantized per-branch like stupid
    backoff; instead the full double expression is written in the
    IDENTICAL operation order on both engines (IEEE binary64 ops are
    deterministic given the same order) and quantized once —
    ``floor(-ln(p) * 1e6 + 0.5)`` — with the same floor-margin guard
    the other micro-nat models ship (tests/test_lm.py).

    ``backed_off`` flags hapax transitions (``c2 == 1``), where the
    continuation term carries most of the probability mass — the KN
    analog of the stupid-backoff branch indicator.
    """
    c2 = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    cut = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("cut"))
    tott = c2.agg(F.count(F.lit(1)).alias("tott"))
    # The exact expression shape is the cross-engine contract — the
    # oracle writes the same parenthesization (queries/lm_perplexity.py).
    cost = F.expr(
        f"CAST(floor(-ln("
        f"((CAST(c2 AS DOUBLE) - {KN_DISCOUNT}) / CAST(c1 AS DOUBLE))"
        f" + ((({KN_DISCOUNT} * CAST(n1p AS DOUBLE)) / CAST(c1 AS DOUBLE))"
        f" * (CAST(cut AS DOUBLE) / CAST(tott AS DOUBLE)))"
        f") * {SCALE}.0 + 0.5) AS BIGINT)"
    )
    return (
        c2.join(c1, "w1")
        .join(cut, "w2")
        .crossJoin(F.broadcast(tott))
        .select(
            "w1",
            "w2",
            "c2",
            cost.alias("cost_micro"),
            (F.col("c2") == F.lit(1)).alias("backed_off"),
        )
    )


def perplexity_scores_kn(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Self-scored corpus under interpolated Kneser-Ney (the KenLM
    model class CCNet deploys); same output schema as
    :func:`perplexity_scores` with ``n_backoff`` counting hapax
    transitions."""
    bg = doc_bigrams(docs, text_col=text_col, id_col=id_col)
    return score_documents(bg, kneser_ney_costs(bg), id_col)
