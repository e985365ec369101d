"""In-engine supervised text classification: multinomial Naive Bayes
(train + predict as pure DataFrame algebra — the "train a quality /
language classifier on a labeled slice, score the corpus" stage of a
training-data pipeline, done without leaving the engine).

Model (standard multinomial NB with Laplace smoothing):

    score(d, c) = ln P(c) + sum over terms t of tf(d,t) * ln((cnt(c,t)+1)/(total_c + V))

**Determinism contract** — the reason this is hash-gateable: all log
weights are quantized to integer MICRO-NATS at the MODEL level
(``floor(ln(x) * 1e6 + 0.5)``, one constant per (class, term)), so
per-document scoring is a sum of LONGS — associative, order-free,
bit-identical across engines and partitionings.  The decomposition

    score_units(d, c) = prior_units(c)
                        + sum_t tf * w_units(c, t)      -- w = ln(cnt+1)
                        - n_tokens(d) * b_units(c)       -- b = ln(total_c + V)

lets absent (class, term) pairs contribute exactly 0 (ln 1), so the
scoring join only touches observed model rows.

Scale shape: training is two map-side-combined groupBys (shuffle ∝
distinct (class, term), never the token stream); the model is a
(classes x vocab)-bounded relation broadcast for scoring; prediction
is one join + one integer aggregate + a per-document argmax window
(partitioned by doc — never a global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _units(x: Column) -> Column:
    """ln(x) quantized to integer micro-nats, floor(+0.5) convention."""
    return F.floor(F.log(x.cast("double")) * MICRO + F.lit(0.5)).cast("long")


def nb_train(
    tokens: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
    term_col: str = "term",
):
    """Fit the model from a token stream and per-doc labels.

    Returns ``(weights, class_stats)``:
    * ``weights``    — (label, term, w_units) for observed pairs;
    * ``class_stats`` — (label, prior_units, b_units), one row per class.
    """
    tagged = tokens.join(labels.select(id_col, label_col), id_col)
    tf = tagged.groupBy(label_col, term_col).agg(F.count(F.lit(1)).alias("_cnt"))
    # tf is the (classes x vocab)-bounded model relation, but three
    # downstream branches (weights / vocab / totals) each re-derived it
    # from the raw token stream as plan copies (the gated confusion
    # entry's plan showed 42 parquet scans, r13 opt) — pin one
    # computation so the tokenize+join+groupBy chain runs once
    tf = tf.localCheckpoint(eager=False)
    weights = tf.select(
        label_col, term_col, _units(F.col("_cnt") + 1).alias("w_units")
    )
    vocab = tf.select(term_col).distinct().agg(
        F.count(F.lit(1)).alias("_v")
    )
    totals = tf.groupBy(label_col).agg(F.sum("_cnt").alias("_tot"))
    ndocs = labels.groupBy(label_col).agg(F.count(F.lit(1)).alias("_nd"))
    n_all = labels.agg(F.count(F.lit(1)).alias("_n"))
    class_stats = (
        totals.join(ndocs, label_col)
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_all))
        .select(
            label_col,
            _units(F.col("_nd") / F.col("_n")).alias("prior_units"),
            _units(F.col("_tot") + F.col("_v")).alias("b_units"),
        )
    )
    return weights, class_stats


def nb_predict(
    tokens: DataFrame,
    weights: DataFrame,
    class_stats: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
    term_col: str = "term",
    pred_col: str = "predicted",
) -> DataFrame:
    """Argmax class per document: ``(doc_id, predicted, score_units)``.

    Ties break to the lexicographically first class — deterministic."""
    tf = tokens.groupBy(id_col, term_col).agg(F.count(F.lit(1)).alias("_tf"))
    # same branch-copy discipline as nb_train (r13 opt): matched and
    # ntok both fold over tf — pin it so the held-out token stream is
    # tokenized and aggregated once, not once per branch
    tf = tf.localCheckpoint(eager=False)
    matched = (
        tf.join(F.broadcast(weights), term_col)
        .groupBy(id_col, label_col)
        .agg(F.sum(F.col("_tf") * F.col("w_units")).alias("_match"))
    )
    ntok = tf.groupBy(id_col).agg(F.sum("_tf").alias("_ntok"))
    spine = ntok.crossJoin(F.broadcast(class_stats))
    scored = spine.join(matched, [id_col, label_col], "left").select(
        id_col,
        label_col,
        (
            F.col("prior_units")
            + F.coalesce(F.col("_match"), F.lit(0))
            - F.col("_ntok") * F.col("b_units")
        ).alias("score_units"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_units").desc(), F.col(label_col).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, F.col(label_col).alias(pred_col), "score_units")
    )
