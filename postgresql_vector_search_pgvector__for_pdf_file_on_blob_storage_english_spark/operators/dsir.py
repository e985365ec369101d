"""DSIR-style data selection: importance resampling via hashed n-gram
features (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling").

The method: model the TARGET domain and the RAW corpus as bag-of-
hashed-feature unigram distributions, score every raw document by its
log importance ratio ``sum_tokens log(p_target(b)/p_raw(b))``, and keep
the highest-ratio documents — cheap domain adaptation of the training
mixture without a learned classifier.

Determinism contract (the engine-wide convention): feature buckets are
md5-prefix hashes (portable to the oracle via the ``('0x' ||
substr(md5(s),1,8))::BIGINT`` twin), the per-bucket log ratios are
quantized to INTEGER MICRO-NATS exactly like the LM family
(``floor(x * 1e6 + 0.5)`` of an IEEE double both engines produce from
the same expression), and document scores are int64 sums of those
integers — bit-replayable cross-engine.  The paper's Gumbel-top-k
sampling step is replaced by deterministic top-k on (score desc, id):
same selection pressure, replayable (a seeded variant is one
``hash_sample`` composition away).

At 100 TB: one token-explode pass builds the (bucket, target, raw)
count table — B rows, map-side-combinable; scoring is a second explode
pass reduced to (doc, bucket) counts joined against the BROADCAST
B-row weight table.  No shuffle ever carries the corpus text: the wide
relations exchange only (doc_id, bucket, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_whitespace_col

SCALE = 1_000_000  # integer micro-nat units (the LM-family convention)


def _bucket_col(term_col, n_buckets: int):
    """Stable md5-prefix feature bucket (same hash family as
    retrieval.term_bucket_col / groupwise.hash_sample)."""
    return (
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        docs.select(
            id_col,
            F.explode(
                F.split(F.trim(normalize_whitespace_col(text_col)), " ")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .withColumn("term", F.lower("term"))
    )


def dsir_bucket_weights(
    docs: DataFrame,
    is_target,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One pass over the token stream -> the B-row weight table
    ``(bucket, t_cnt, r_cnt, weight_micro)``.

    ``is_target`` is a boolean Column marking target-domain documents.
    Laplace-smoothed log ratio per bucket, in integer micro-nats::

        weight = floor((ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B))) * 1e6 + 0.5)

    where T/R are the target/raw token totals.  The raw distribution
    counts ALL documents (the target is a subset of the corpus, as in
    the paper's raw-pool formulation)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # the flag rides through the explode alongside the id
    toks = (
        docs.withColumn("_tgt", is_target)
        .select(
            id_col,
            "_tgt",
            F.explode(
                F.split(F.trim(normalize_whitespace_col(text_col)), " ")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .withColumn("term", F.lower("term"))
    )
    counts = toks.groupBy(_bucket_col(F.col("term"), n_buckets).alias("bucket")).agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("t_cnt"),
        F.count(F.lit(1)).alias("r_cnt"),
    )
    # counts feeds BOTH the totals aggregate and the weight projection:
    # without truncation each branch re-runs the corpus token pass (the
    # r8 branch-copy pathology — plan showed 3 corpus scans).  The
    # relation is <= n_buckets rows, so the eager checkpoint is a tiny
    # job and the corpus is tokenized exactly twice end-to-end (weights
    # + scoring), like the LM family.
    counts = counts.localCheckpoint(eager=True)
    totals = counts.agg(
        F.sum("t_cnt").alias("_T"), F.sum("r_cnt").alias("_R")
    )
    w = F.expr(
        f"CAST(floor((ln(CAST(t_cnt + 1 AS DOUBLE) / CAST(_T + {n_buckets} AS DOUBLE))"
        f" - ln(CAST(r_cnt + 1 AS DOUBLE) / CAST(_R + {n_buckets} AS DOUBLE)))"
        f" * {SCALE}.0 + 0.5) AS BIGINT)"
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket", "t_cnt", "r_cnt", w.alias("weight_micro")
    )


def dsir_scores(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document: ``(doc_id, n_tokens, score_micro)`` where
    ``score_micro = sum over tokens of weight_micro(bucket(token))``.
    The token stream is reduced to (doc, bucket) counts BEFORE the
    weight join, so the broadcast join input is bounded by docs x B,
    not the token count."""
    toks = _tokens(docs, text_col, id_col)
    per_doc_bucket = toks.groupBy(
        id_col, _bucket_col(F.col("term"), n_buckets).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_doc_bucket.join(F.broadcast(weights.select("bucket", "weight_micro")), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("weight_micro")).alias("score_micro"),
        )
    )


def dsir_select(
    docs: DataFrame,
    is_target,
    k: int,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k raw documents by importance ratio — the selection DSIR
    feeds to training.  Deterministic (score desc, id asc) in place of
    the paper's Gumbel noise; ties replay identically cross-engine."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    weights = dsir_bucket_weights(
        docs, is_target, n_buckets=n_buckets, text_col=text_col, id_col=id_col
    )
    scores = dsir_scores(
        docs, weights, n_buckets=n_buckets, text_col=text_col, id_col=id_col
    )
    return scores.orderBy(F.col("score_micro").desc(), F.col(id_col)).limit(k)
