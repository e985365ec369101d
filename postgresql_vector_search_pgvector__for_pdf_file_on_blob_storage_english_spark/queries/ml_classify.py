# ==========================================================================
# In-engine supervised classification (round 6) — multinomial Naive
# Bayes language classifier (operators/nbayes.py): train on the 2/3
# doc_id split, predict the held-out third, report the confusion
# matrix.  The model's log weights are quantized to integer micro-nats
# at training time, so every per-document score is a sum of longs —
# bit-identical across engines — and the full train+predict+confusion
# chain replays in SQL.  (The fixture languages are near-shared-
# vocabulary word soup, so accuracy is modest by design — the gate
# checks the MODEL ARITHMETIC, and test_nbayes.py checks learning on a
# separable corpus.)
# ==========================================================================
from __future__ import annotations

from ._base import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    _dd_l2,
    _register,
    _t,
)
from .retrieval import _DD_TOKENS


def _ml_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split -> NB fit -> held-out confusion matrix
    ``(lang, predicted, n_docs)``.  Scale shape: two map-side-combined
    training groupBys (shuffle ∝ classes x vocab), broadcast model,
    per-document argmax window (partitioned — never global)."""
    from ..operators.nbayes import nb_predict, nb_train
    from ..operators.retrieval import tokenize

    docs = _t(spark, sf_dir, "documents")
    # the train tf and the held-out tf each tokenize the corpus — pin
    # the token stream so the explode runs once for both (r13 opt)
    toks = tokenize(docs).localCheckpoint(eager=False)
    labels = docs.select("doc_id", F.col("lang").alias("label"))
    train_ids = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id")
    test_ids = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    w, cs = nb_train(
        toks.join(train_ids, "doc_id"), labels.join(train_ids, "doc_id")
    )
    preds = nb_predict(toks.join(test_ids, "doc_id"), w, cs)
    return (
        preds.join(labels, "doc_id")
        .groupBy(F.col("label").alias("lang"), "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_DD_NB_CONFUSION = f"""
WITH {_DD_TOKENS},
trn AS (SELECT doc_id, lang FROM documents WHERE doc_id % 3 != 0),
tst AS (SELECT doc_id, lang FROM documents WHERE doc_id % 3 = 0),
tf AS (
  SELECT t.lang, k.term, count(*) AS cnt
  FROM tokens k JOIN trn t USING (doc_id) GROUP BY 1, 2
),
v AS (SELECT count(DISTINCT term) AS v FROM tf),
tot AS (SELECT lang, sum(cnt) AS tot FROM tf GROUP BY lang),
nd AS (SELECT lang, count(*) AS nd FROM trn GROUP BY lang),
na AS (SELECT count(*) AS n FROM trn),
cs AS (
  SELECT tot.lang,
         CAST(floor(ln(nd.nd::DOUBLE / na.n) * 1000000 + 0.5) AS BIGINT) AS prior_units,
         CAST(floor(ln((tot.tot + v.v)::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS b_units
  FROM tot JOIN nd USING (lang), v, na
),
w AS (
  SELECT lang, term,
         CAST(floor(ln((cnt + 1)::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS w_units
  FROM tf
),
ttf AS (
  SELECT k.doc_id, k.term, count(*) AS tf
  FROM tokens k JOIN tst USING (doc_id) GROUP BY 1, 2
),
m AS (
  SELECT ttf.doc_id, w.lang, CAST(sum(ttf.tf * w.w_units) AS BIGINT) AS mtch
  FROM ttf JOIN w USING (term) GROUP BY 1, 2
),
nt AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS ntok FROM ttf GROUP BY doc_id),
scored AS (
  SELECT nt.doc_id, cs.lang,
         cs.prior_units + coalesce(m.mtch, 0) - nt.ntok * cs.b_units AS s
  FROM nt CROSS JOIN cs
  LEFT JOIN m ON m.doc_id = nt.doc_id AND m.lang = cs.lang
),
pred AS (
  SELECT doc_id, lang AS predicted FROM scored
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) = 1
)
SELECT t.lang, p.predicted, count(*) AS n_docs
FROM tst t JOIN pred p USING (doc_id)
GROUP BY 1, 2
"""

_register("ml_nb_langid_confusion", _ml_nb_confusion, _DD_NB_CONFUSION)


# --------------------------------------------------------------------------
# k-NN classification over the embedding space: leave-one-out
# majority vote on a FIXED-size evaluation sample (40 vectors — a
# constant, not a corpus fraction, so the broadcast never scales with
# the data; the ADVICE r5 eval-collect lesson).  One broadcast cross
# join scores corpus x eval, the embedding is dropped before the
# per-query top-5 window (partitioned by query — never global), and the
# vote/argmax/confusion chain is pure integer aggregation.
# --------------------------------------------------------------------------

_N_KNN_EVAL = 40
_KNN_CLS_K = 5


def _ml_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.vector import DISTANCE_FNS

    emb = _t(spark, sf_dir, "embeddings")
    ev = (
        emb.orderBy("vec_id")
        .limit(_N_KNN_EVAL)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("true_label"),
        )
    )
    scored = (
        emb.crossJoin(F.broadcast(ev))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            "vec_id",
            "label",
            DISTANCE_FNS["l2"](F.col("embedding"), F.col("query_vec")).alias("d"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy("d", "vec_id")
    top = scored.withColumn("_rk", F.row_number().over(w_top)).where(
        F.col("_rk") <= _KNN_CLS_K
    )
    votes = top.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_vote = Window.partitionBy("query_id").orderBy(F.col("c").desc(), "label")
    pred = votes.withColumn("_rk", F.row_number().over(w_vote)).where(
        F.col("_rk") == 1
    )
    return (
        pred.groupBy("true_label", F.col("label").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n_queries"))
        .orderBy("true_label", "pred_label")
    )


_DD_KNN_CONFUSION = f"""
WITH ev AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS true_label
  FROM embeddings ORDER BY vec_id LIMIT {_N_KNN_EVAL}
),
scored AS (
  SELECT e.query_id, e.true_label, c.vec_id, c.label,
         {_dd_l2("c.embedding", "e.qv")} AS d
  FROM embeddings c, ev e
  WHERE c.vec_id <> e.query_id
),
top AS (
  SELECT * FROM scored
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) <= {_KNN_CLS_K}
),
votes AS (
  SELECT query_id, true_label, label, count(*) AS c
  FROM top GROUP BY 1, 2, 3
),
pred AS (
  SELECT query_id, true_label, label AS pred_label FROM votes
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY c DESC, label) = 1
)
SELECT true_label, pred_label, count(*)::BIGINT AS n_queries
FROM pred GROUP BY 1, 2
ORDER BY true_label, pred_label
"""

_register("ml_knn_label_confusion", _ml_knn_confusion, _DD_KNN_CONFUSION)


# ==========================================================================
# Scorer evaluation (round 10) — operators/evalmetrics.py.  Before a
# learned scorer gates a 100 TB curation pipeline it has to be
# EVALUATED at corpus scale: ROC-AUC (does it rank?) and the
# calibration table (is the probability a probability?).  Both reduce
# to integer arithmetic over one partial-agg groupBy keyed on the
# quantized score, so the numbers hash-compare across engines.
# ==========================================================================

_AUC_TRUSTED = ("src0", "src1", "src2", "src3", "src4")


def _eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language ROC-AUC of document length predicting membership in
    the trusted-source set — the shape of a quality-scorer validation
    against a trusted-source proxy label.  Mann-Whitney rank identity,
    exact longs end-to-end; the cumulative-negatives window is
    partitioned by lang (never global)."""
    from ..operators.evalmetrics import auc_roc

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("double").alias("score"),
        F.col("source").isin(*_AUC_TRUSTED).alias("label"),
    )
    return auc_roc(docs, "score", "label", group_col="lang", scale=1).orderBy(
        "lang"
    )


_DD_AUC = f"""
WITH s AS (
  SELECT lang,
         CAST(floor(n_chars * 1 + 0.5) AS BIGINT) AS sc,
         source IN {_AUC_TRUSTED} AS y
  FROM documents
),
per AS (
  SELECT lang, sc,
         sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
         sum(CASE WHEN y THEN 0 ELSE 1 END) AS neg
  FROM s GROUP BY 1, 2
),
cum AS (
  SELECT lang, pos, neg,
         coalesce(sum(neg) OVER (PARTITION BY lang ORDER BY sc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS negb
  FROM per
),
agg AS (
  SELECT lang, sum(pos) AS n_pos, sum(neg) AS n_neg,
         sum(2 * pos * negb + pos * neg) AS u2
  FROM cum GROUP BY lang
)
SELECT lang, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(CASE WHEN n_pos > 0 AND n_neg > 0
                 THEN (u2 * 1000000) // (2 * n_pos * n_neg) END AS BIGINT)
         AS auc_micro
FROM agg ORDER BY lang
"""

_register("eval_auc_doclen_trusted", _eval_auc, _DD_AUC)


def _eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source reliability table of document length vs the
    lang='en' rate — ten equal-width bins over each source's own score
    range, mean score and positive rate in exact integer micro-units.
    No window at all; two partial-agg groupBys bounded by
    sources x bins."""
    from ..operators.evalmetrics import calibration_bins

    docs = _t(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").cast("double").alias("score"),
        (F.col("lang") == "en").alias("label"),
    )
    return calibration_bins(
        docs, "score", "label", group_col="source", n_bins=10, scale=1
    ).orderBy("source", "bin")


_DD_CALIBRATION = """
WITH s AS (
  SELECT source,
         CAST(floor(n_chars * 1 + 0.5) AS BIGINT) AS sc,
         (lang = 'en') AS y
  FROM documents
),
bounds AS (SELECT source, min(sc) AS lo, max(sc) AS hi FROM s GROUP BY 1),
binned AS (
  SELECT s.source,
         CAST(((sc - lo) * 10) // (hi - lo + 1) AS INT) AS bin,
         sc, y
  FROM s JOIN bounds USING (source)
),
agg AS (
  SELECT source, bin, count(*) AS n, sum(sc) AS ssum,
         sum(CASE WHEN y THEN 1 ELSE 0 END) AS npos
  FROM binned GROUP BY 1, 2
)
SELECT source, bin, CAST(n AS BIGINT) AS n,
       CAST((ssum * 1000000) // (n * 1) AS BIGINT) AS mean_score_micro,
       CAST((npos * 1000000) // n AS BIGINT) AS pos_rate_micro
FROM agg ORDER BY source, bin
"""

_register("eval_calibration_doclen_en", _eval_calibration, _DD_CALIBRATION)


def _eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language nDCG@10 of the length-descending document ranking
    against the trusted-source relevance label — graded ranking
    evaluation next to the AUC entry, over the same proxy task.  Exact
    integers end-to-end: both engines consume the identical literal
    discount table (no runtime logarithm anywhere)."""
    from pyspark.sql import Window

    from ..operators.evalmetrics import ndcg_at_k

    docs = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("query_id"),
        "doc_id",
        "n_chars",
        F.when(F.col("source").isin(*_AUC_TRUSTED), 1).otherwise(0).alias("rel"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    results = (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "rank", "rel")
    )
    qrels = docs.select("query_id", "rel")
    return ndcg_at_k(results, qrels, k=10).orderBy("query_id")


def _dd_ndcg() -> str:
    from ..operators.evalmetrics import ndcg_discounts_micro

    disc_rows = ", ".join(f"({r}, {d})" for r, d in ndcg_discounts_micro(10))
    return f"""
WITH disc(r, d) AS (VALUES {disc_rows}),
docs AS (
  SELECT lang, doc_id, n_chars,
         CASE WHEN source IN {_AUC_TRUSTED} THEN 1 ELSE 0 END AS rel
  FROM documents
),
res AS (
  SELECT lang, rel,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM docs QUALIFY rk <= 10
),
dcg AS (SELECT lang, sum(rel * d) AS dcg FROM res JOIN disc ON rk = r GROUP BY 1),
ideal AS (
  SELECT lang, rel,
         row_number() OVER (PARTITION BY lang ORDER BY rel DESC) AS rk
  FROM docs QUALIFY rk <= 10
),
idcg AS (SELECT lang, sum(rel * d) AS idcg FROM ideal JOIN disc ON rk = r GROUP BY 1)
SELECT dcg.lang AS query_id,
       CAST(dcg AS BIGINT) AS dcg_micro, CAST(idcg AS BIGINT) AS idcg_micro,
       CAST(CASE WHEN idcg > 0 THEN (dcg * 1000000) // idcg END AS BIGINT)
         AS ndcg_ppm
FROM dcg JOIN idcg ON dcg.lang = idcg.lang ORDER BY query_id
"""


_register("eval_ndcg_doclen_trusted", _eval_ndcg, _dd_ndcg())


# ==========================================================================
# Supervised categorical encoding (round 10) — operators/encoding.py.
# Leave-one-out target encoding (the leakage-safe mean encoder) and
# the WOE/IV scorecard audit, both one partial-agg groupBy to the
# category/bucket domain + broadcast joins — no window, no float mean.
# ==========================================================================


def _ml_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 500 docs with the leave-one-out encoded `source` feature
    against the lang='en' target, in exact ppm.  The encoding table is
    bounded by the source domain; raw rows take one broadcast join."""
    from ..operators.encoding import target_encode_loo

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", (F.col("lang") == "en").cast("long").alias("y")
    )
    return (
        target_encode_loo(docs, "source", "y")
        .select("doc_id", "source", "y", "loo_ppm")
        .orderBy("doc_id")
        .limit(500)
    )


_DD_TE_LOO = """
WITH s AS (
  SELECT doc_id, source, (lang = 'en')::BIGINT AS y FROM documents
),
g AS (SELECT source, count(*)::BIGINT AS n, sum(y)::BIGINT AS sy FROM s GROUP BY 1)
SELECT s.doc_id, s.source, s.y,
       CASE WHEN g.n > 1
            THEN ((g.sy - s.y) * 1000000) // (g.n - 1) END AS loo_ppm
FROM s JOIN g USING (source)
ORDER BY s.doc_id
LIMIT 500
"""

_register("ml_target_encode_loo", _ml_target_encode, _DD_TE_LOO)


def _ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE/IV scorecard of the doc-length bucket (width 64 chars)
    against the trusted-source label: per-bucket micro-nat WOE plus
    the feature-level IV repeated on each row.  Bucket relation is
    bounded by the LENGTH DOMAIN / 64 at any corpus scale."""
    from ..operators.encoding import woe_iv

    docs = _t(spark, sf_dir, "documents").select(
        F.expr("n_chars div 64").alias("b"),
        F.col("source").isin(*_AUC_TRUSTED).cast("long").alias("y"),
    )
    return woe_iv(docs, "b", "y").orderBy("bucket")


_DD_WOE = f"""
WITH s AS (
  SELECT n_chars // 64 AS b, (source IN {_AUC_TRUSTED})::BIGINT AS y
  FROM documents
),
per_b AS (
  SELECT b AS bucket, sum(y)::BIGINT + 1 AS g,
         sum(1 - y)::BIGINT + 1 AS bb
  FROM s GROUP BY 1
),
tot AS (SELECT sum(g)::BIGINT AS gt, sum(bb)::BIGINT AS bt FROM per_b),
scored AS (
  SELECT bucket, g, bb, gt, bt,
         CAST(floor(ln((g * bt)::DOUBLE / (bb * gt)) * 1000000 + 0.5) AS BIGINT) AS woe_micro
  FROM per_b, tot
),
-- the IV numerator is provably >= 0 (each term's factors share sign),
-- so // here equals Spark's truncating div
iv AS (
  SELECT CAST(sum((g::HUGEINT * bt - bb::HUGEINT * gt) * woe_micro)
              // (max(gt)::HUGEINT * max(bt)) AS BIGINT) AS iv_micro
  FROM scored
)
SELECT bucket, g - 1 AS n_good, bb - 1 AS n_bad, woe_micro, iv_micro
FROM scored, iv
ORDER BY bucket
"""

_register("ml_woe_iv_doclen", _ml_woe_iv, _DD_WOE)


# ==========================================================================
# Split-conformal prediction intervals (round 11) — the scorer-eval
# family's uncertainty member.  AUC says a scorer RANKS; calibration
# says its probability is a probability; conformal says how WIDE an
# interval must be to cover at a target rate, distribution-free
# (Vovk et al.; Angelopoulos & Bates 2021 tutorial — public method).
# Mondrian (per-source) variant: each source gets its own calibration
# quantile, the standard guard against per-group miscoverage.
#
# Pipeline shape: a 50/50 hash split (engine stable-hash convention)
# -> per-source integer mean model fit on CALIBRATION only ->
# nonconformity r = |n_chars - mu| -> qhat = ceil(0.9 (n_cal + 1))-th
# smallest calibration r -> empirical coverage of mu ± qhat on TEST.
#
# 100 TB design: two partial-agg groupBys (per-source sums, per
# (source, r) counts); the quantile cumulation runs in a window
# PARTITIONED by source over the (source, distinct r) relation, whose
# per-source width is the n_chars DOMAIN (the fixture's 48..553 —
# document-length ranges are capped by the chunker upstream, not by
# corpus size), so no stage anywhere is global or row-cardinality.
# All integers: exact k = (9 n_cal + 18) div 10, qhat an observed
# residual, coverage in exact ppm.
# ==========================================================================


def _eval_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("conf§"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    tagged = docs.withColumn("_cal", bucket < 50)
    cal = tagged.filter(F.col("_cal"))
    test = tagged.filter(~F.col("_cal"))

    mu = cal.groupBy("source").agg(
        F.sum("n_chars").alias("_s"), F.count(F.lit(1)).alias("n_cal")
    ).select(
        "source", "n_cal", F.expr("_s div n_cal").alias("_mu"),
        F.expr("CAST((9 * n_cal + 18) div 10 AS BIGINT)").alias("k_idx"),
    )
    # mu (per-source, domain-bounded) feeds four branches and each
    # re-ran the md5 split + calibration aggregate over the corpus
    # (18 parquet scans in the gated plan, r13 opt) — pin it
    mu = mu.localCheckpoint(eager=False)
    # per-(source, residual) counts; cumulative count in a window
    # partitioned by source over the domain-bounded residual relation
    r_cal = cal.join(F.broadcast(mu), "source").select(
        "source", F.abs(F.col("n_chars") - F.col("_mu")).alias("_r")
    )
    per_r = r_cal.groupBy("source", "_r").agg(F.count(F.lit(1)).alias("_c"))
    wcum = (
        Window.partitionBy("source")
        .orderBy("_r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_r.withColumn("_cum", F.sum("_c").over(wcum))
    qhat = (
        cum.join(F.broadcast(mu.select("source", "k_idx", "n_cal")), "source")
        # k > n_cal (tiny calibration set) would select nothing: clamp
        # to the max residual so the interval covers everything, the
        # standard finite-sample fallback
        .filter(F.col("_cum") >= F.least(F.col("k_idx"), F.col("n_cal")))
        .groupBy("source")
        .agg(F.min("_r").alias("qhat"))
    )
    # qhat (per-source) is consumed by cov and the output join — pin
    # so the residual-quantile chain runs once (r13 opt)
    qhat = qhat.localCheckpoint(eager=False)
    cov = (
        test.join(F.broadcast(mu), "source")
        .join(F.broadcast(qhat), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (F.abs(F.col("n_chars") - F.col("_mu")) <= F.col("qhat"))
                .cast("long")
            ).alias("_hit"),
        )
    )
    out = (
        mu.select("source", "n_cal", "k_idx")
        .join(qhat, "source")
        .join(cov, "source")
    )
    return out.selectExpr(
        "source",
        "CAST(n_cal AS BIGINT) AS n_cal",
        "CAST(n_test AS BIGINT) AS n_test",
        "k_idx",
        "CAST(qhat AS BIGINT) AS qhat",
        "CAST((_hit * 1000000) div n_test AS BIGINT) AS coverage_ppm",
    ).orderBy("source")


_DD_CONFORMAL = """
WITH tagged AS (
  SELECT doc_id, source, n_chars,
         (('0x' || substr(md5('conf' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT
          % 100) < 50 AS cal
  FROM documents
),
mu AS (
  SELECT source, count(*)::BIGINT AS n_cal,
         sum(n_chars)::BIGINT // count(*)::BIGINT AS mu,
         (9 * count(*)::BIGINT + 18) // 10 AS k_idx
  FROM tagged WHERE cal GROUP BY source
),
per_r AS (
  SELECT t.source, abs(t.n_chars - mu.mu) AS r, count(*)::BIGINT AS c
  FROM tagged t JOIN mu USING (source)
  WHERE t.cal GROUP BY 1, 2
),
cum AS (
  SELECT source, r,
         sum(c) OVER (PARTITION BY source ORDER BY r
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
  FROM per_r
),
qhat AS (
  SELECT cum.source, min(r) AS qhat
  FROM cum JOIN mu USING (source)
  WHERE cm >= least(mu.k_idx, mu.n_cal)
  GROUP BY 1
),
cov AS (
  SELECT t.source, count(*)::BIGINT AS n_test,
         sum((abs(t.n_chars - mu.mu) <= q.qhat)::BIGINT)::BIGINT AS hit
  FROM tagged t JOIN mu USING (source) JOIN qhat q ON q.source = t.source
  WHERE NOT t.cal GROUP BY 1
)
SELECT mu.source, mu.n_cal, cov.n_test, mu.k_idx,
       CAST(q.qhat AS BIGINT) AS qhat,
       (cov.hit * 1000000) // cov.n_test AS coverage_ppm
FROM mu JOIN qhat q ON q.source = mu.source JOIN cov ON cov.source = mu.source
ORDER BY mu.source
"""

_register("eval_conformal_doclen", _eval_conformal, _DD_CONFORMAL)


# ==========================================================================
# Isotonic calibration (round 11): the monotone regression of the
# trusted-source rate onto the doclen score — THE standard calibration
# map for a scorer whose ranking is right but whose probabilities are
# not (Zadrozny & Elkan 2002; pool-adjacent-violators, Barlow-Brunk
# 1972 — public methods).  Completes the scorer-eval family: AUC says
# it ranks, calibration_bins says how far off the probabilities are,
# isotonic produces the corrected monotone probability table.
#
# Engine side: the per-score (cnt, pos) relation is bounded by the
# SCORE DOMAIN (n_chars 48..553 — never row count), so it collects to
# the driver like any bounded model artifact (centroids, bin bounds)
# and exact PAVA runs in integer rationals — comparisons by cross-
# multiplication, no float until the final ppm floor.  The ORACLE is a
# derivation-independent cross-check: the minimax identity
# fit_i = max_{j<=i} min_{k>=i} avg(pos[j..k]) / avg(cnt[j..k])
# expanded as an O(D^3) triple join in SQL (D ~ 300-500 -> a few
# million rows, trivial single-node), with argmin/argmax carrying the
# exact (num, den) pair so the final ppm is integer on both sides.
# ==========================================================================


def _eval_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        F.col("source").isin(*_AUC_TRUSTED).cast("long").alias("y"),
    )
    per_s = (
        docs.groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
        .orderBy("s")
    )
    rows = per_s.collect()  # bounded by the n_chars domain, not rows
    # exact PAVA: blocks of (num=pos, den=cnt); merge while the last
    # two violate monotonicity (cross-multiplied integer compare)
    blocks: list[list[int]] = []  # [num, den, n_scores]
    for r in rows:
        blocks.append([int(r["pos"]), int(r["n"]), 1])
        while (
            len(blocks) >= 2
            and blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][2] += b[2]
        # a block's fit applies to every score it pooled
    fits: list[int] = []
    for num, den, span in blocks:
        fits.extend([(num * 1_000_000) // den] * span)
    out_rows = [
        (int(r["s"]), int(r["n"]), int(r["pos"]), fit)
        for r, fit in zip(rows, fits)
    ]
    return spark.createDataFrame(
        out_rows, "s long, n long, pos long, fit_ppm long"
    ).orderBy("s")


_DD_ISOTONIC = f"""
WITH d AS (
  SELECT n_chars AS s, (source IN {_AUC_TRUSTED})::BIGINT AS y FROM documents
),
per AS (SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos FROM d GROUP BY 1),
pre AS (
  SELECT s, n, pos,
         row_number() OVER (ORDER BY s) AS r,
         sum(n) OVER (ORDER BY s) AS c_incl,
         sum(pos) OVER (ORDER BY s) AS p_incl
  FROM per
),
consts AS (
  -- exact rational sort key: distinct rationals num1/den1 != num2/den2
  -- (den <= total rows N) differ by >= 1/N^2, so key = num*(N^2+1)//den
  -- preserves strict order and equality exactly — no float anywhere in
  -- the argmin/argmax (two rationals closer than a double ulp would
  -- otherwise tie and let the rj/rk tiebreak pick the wrong block)
  SELECT sum(n)::HUGEINT * sum(n)::HUGEINT + 1 AS sq FROM per
),
pairs AS (
  SELECT j.r AS rj, k.r AS rk,
         k.p_incl - (j.p_incl - j.pos) AS num,
         k.c_incl - (j.c_incl - j.n) AS den,
         ((k.p_incl - (j.p_incl - j.pos))::HUGEINT * c.sq)
           // (k.c_incl - (j.c_incl - j.n)) AS key
  FROM pre j JOIN pre k ON j.r <= k.r CROSS JOIN consts c
),
inner_min AS (
  SELECT p.rj, i.r AS ri, p.num, p.den, p.key
  FROM pairs p JOIN pre i ON p.rj <= i.r AND i.r <= p.rk
  QUALIFY row_number() OVER (PARTITION BY p.rj, i.r
                             ORDER BY p.key, p.rk) = 1
),
outer_max AS (
  SELECT ri, num, den
  FROM inner_min
  QUALIFY row_number() OVER (PARTITION BY ri
                             ORDER BY key DESC, rj) = 1
)
SELECT pre.s, pre.n, pre.pos,
       CAST((o.num * 1000000) // o.den AS BIGINT) AS fit_ppm
FROM pre JOIN outer_max o ON o.ri = pre.r
ORDER BY pre.s
"""

_register("eval_isotonic_calibration", _eval_isotonic, _DD_ISOTONIC)


# --------------------------------------------------------------------------
# Streaming conformal coverage replay (round 11).  Production shape:
# the calibration model (per-source mu, qhat) is FROZEN batch-side;
# the serving layer scores a live document stream and logs only the
# per-source nonconformity HISTOGRAM (streaming/evalmetrics_stream.py
# residual-count log — addition merge law, batch-stamped appends);
# monitoring folds the log into running per-source coverage, gated
# here against the one-shot batch computation row-for-row.  Same
# replay discipline as the AUC log: 4 micro-batches, batch-0 rows
# re-appended verbatim, the stamp dedup must absorb them.
# --------------------------------------------------------------------------


def _stream_conformal_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ..streaming.evalmetrics_stream import (
        residual_counts_read,
        stream_into_residual_counts,
    )
    from ._base import _drain

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_stream_conf_{tag}_{os.getpid()}"
    )
    src, log = os.path.join(root, "src"), os.path.join(root, "log")
    ckpt = os.path.join(root, "ckpt")
    shutil.rmtree(root, ignore_errors=True)

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("conf§"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    tagged = docs.withColumn("_cal", bucket < 50)
    mu = (
        tagged.filter(F.col("_cal"))
        .groupBy("source")
        .agg(F.sum("n_chars").alias("_s"), F.count(F.lit(1)).alias("n_cal"))
        .select(
            "source",
            "n_cal",
            F.expr("_s div n_cal").alias("_mu"),
            F.expr("CAST((9 * n_cal + 18) div 10 AS BIGINT)").alias("k_idx"),
        )
    )
    r_cal = tagged.filter(F.col("_cal")).join(F.broadcast(mu), "source").select(
        "source", F.abs(F.col("n_chars") - F.col("_mu")).alias("_r")
    )
    per_r = r_cal.groupBy("source", "_r").agg(F.count(F.lit(1)).alias("_c"))
    wcum = (
        Window.partitionBy("source")
        .orderBy("_r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    qhat = (
        per_r.withColumn("_cum", F.sum("_c").over(wcum))
        .join(F.broadcast(mu.select("source", "k_idx", "n_cal")), "source")
        .filter(F.col("_cum") >= F.least(F.col("k_idx"), F.col("n_cal")))
        .groupBy("source")
        .agg(F.min("_r").alias("qhat"))
    )

    # serving side: the TEST stream scored against the frozen mu
    scored = (
        tagged.filter(~F.col("_cal"))
        .join(F.broadcast(mu.select("source", "_mu")), "source")
        .select("source", F.abs(F.col("n_chars") - F.col("_mu")).alias("r"))
    )
    scored.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("source string, r bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_into_residual_counts(stream, log, ckpt, "source", "r")
    _drain(q, 300)

    # deliberate replay: re-append batch 0's histogram rows verbatim
    first = spark.read.parquet(log).filter(F.col("batch_id") == 0)
    first.write.mode("append").parquet(log)

    hist = residual_counts_read(spark, log)
    return (
        hist.join(F.broadcast(qhat), hist._g == qhat.source)
        .groupBy("source", "qhat")
        .agg(
            F.sum("_c").alias("n_test"),
            F.sum(F.when(F.col("_r") <= F.col("qhat"), F.col("_c")).otherwise(0)).alias(
                "_hit"
            ),
        )
        .selectExpr(
            "source",
            "CAST(n_test AS BIGINT) AS n_test",
            "CAST(qhat AS BIGINT) AS qhat",
            "CAST((_hit * 1000000) div n_test AS BIGINT) AS coverage_ppm",
        )
        .orderBy("source")
    )


_DD_STREAM_CONFORMAL = """
WITH tagged AS (
  SELECT doc_id, source, n_chars,
         (('0x' || substr(md5('conf' || '§' || doc_id::VARCHAR), 1, 8))::BIGINT
          % 100) < 50 AS cal
  FROM documents
),
mu AS (
  SELECT source, count(*)::BIGINT AS n_cal,
         sum(n_chars)::BIGINT // count(*)::BIGINT AS mu,
         (9 * count(*)::BIGINT + 18) // 10 AS k_idx
  FROM tagged WHERE cal GROUP BY source
),
per_r AS (
  SELECT t.source, abs(t.n_chars - mu.mu) AS r, count(*)::BIGINT AS c
  FROM tagged t JOIN mu USING (source)
  WHERE t.cal GROUP BY 1, 2
),
cum AS (
  SELECT source, r,
         sum(c) OVER (PARTITION BY source ORDER BY r
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
  FROM per_r
),
qhat AS (
  SELECT cum.source, min(r) AS qhat
  FROM cum JOIN mu USING (source)
  WHERE cm >= least(mu.k_idx, mu.n_cal)
  GROUP BY 1
),
cov AS (
  SELECT t.source, count(*)::BIGINT AS n_test,
         sum((abs(t.n_chars - mu.mu) <= q.qhat)::BIGINT)::BIGINT AS hit
  FROM tagged t JOIN mu USING (source) JOIN qhat q ON q.source = t.source
  WHERE NOT t.cal GROUP BY 1
)
SELECT cov.source, cov.n_test, CAST(q.qhat AS BIGINT) AS qhat,
       (cov.hit * 1000000) // cov.n_test AS coverage_ppm
FROM cov JOIN qhat q ON q.source = cov.source
ORDER BY cov.source
"""

_register("stream_conformal_replay", _stream_conformal_replay, _DD_STREAM_CONFORMAL)


# ==========================================================================
# Brier score with Murphy decomposition (round 12): the proper-scoring
# companion to the AUC / nDCG / calibration / isotonic entries — the
# standard "is this scorer USABLE as a probability" report.  Brier =
# reliability - resolution + uncertainty; monitoring watches REL (drift
# of the calibration map) separately from RES (lost discriminative
# power), which a single Brier number conflates.
#
# Forecast model under test: the bin-midpoint forecaster over B=10
# equal-width n_chars bins — p_k = (2k+1)/(2B), the same deterministic
# doclen scorer the calibration/isotonic entries gate, so every term
# of the decomposition is a RATIONAL of integer counts:
#   brier contribution of bin k = (n_k u^2 - 4B u pos_k + 4B^2 pos_k)
#                                 / (4B^2 N),          u = 2k+1
#   REL_k = (u n_k - 2B pos_k)^2 / (4B^2 n_k N)
#   RES_k = n_k * (ybar_ppm_k - base_ppm)^2 / (N * 1e6),
#           ybar_ppm_k = floor(1e6 pos_k / n_k), base_ppm = floor(1e6 P / N)
# — all floored at ppm from DECIMAL(38,0)/HUGEINT integers; every
# numerator is a square (or a completed one), so truncating `div` ==
# flooring `//`.  RES quantizes its two rates to ppm BEFORE the square
# (VERDICT r12 #1): the raw-count form (pos N - n P)^2 / (n N^3) blows
# past DECIMAL(38,0) near N ~ 1e9 docs, while n * diff_ppm^2 <= N * 1e12
# holds to N ~ 1e26.  Per-bin rows, not one scalar: the gate then pins all
# 3B contributions, and the reader sees WHERE calibration loss lives.
#
# Scale shape: one partial-agg groupBy to (bin, n, pos) — B=10 rows —
# plus two broadcast one-row joins (global min/max, global N/P).  No
# windows, no collect.
# ==========================================================================

_BRIER_B = 10


def _eval_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("sc"),
        F.col("source").isin(*_AUC_TRUSTED).cast("long").alias("y"),
    )
    bounds = docs.agg(F.min("sc").alias("lo"), F.max("sc").alias("hi"))
    binned = docs.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"CAST(((sc - lo) * {_BRIER_B}) div (hi - lo + 1) AS INT)").alias(
            "bin"
        ),
        "y",
    )
    # B=10 rows feeding TWO consumers (the totals and the contribution
    # projection) — as a plain branch each re-ran the corpus bin scan
    # (r13 opt).  The min/max bounds pass stays separate: binning needs
    # the global bounds before the bin groupBy, an irreducible 2nd pass.
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("y").cast("decimal(38,0)").alias("pos"),
    ).localCheckpoint(eager=False)
    tot = per_bin.agg(
        F.sum("n").alias("nn"), F.sum("pos").alias("pp")
    )
    b = _BRIER_B
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .selectExpr(
            "bin",
            "CAST(n AS BIGINT) AS n",
            "CAST(pos AS BIGINT) AS pos",
            f"CAST((1000000 * (n * (2*bin+1) * (2*bin+1) - {4*b} * (2*bin+1) * pos"
            f" + {4*b*b} * pos)) div ({4*b*b} * nn) AS BIGINT) AS brier_contrib_ppm",
            f"CAST((1000000 * ((2*bin+1) * n - {2*b} * pos) * ((2*bin+1) * n - {2*b} * pos))"
            f" div ({4*b*b} * n * nn) AS BIGINT) AS rel_contrib_ppm",
            # RES = (pos/n - pp/nn)^2 * n/nn.  The raw-count form
            # (pos*nn - n*pp)^2 / (n*nn^3) reaches 10^38+ once nn nears
            # ~10^9 docs (VERDICT r12 #1), so QUANTIZE the two rates to
            # ppm FIRST (exact floors of nonneg integers — div == // here)
            # and square the ppm difference: n * diff_ppm^2 stays under
            # 10^38 until nn ~ 10^26.  ppm-before-square is the same
            # Adamic-Adar convention the file already cites.
            "CAST((n * ((1000000 * pos) div n - (1000000 * pp) div nn)"
            " * ((1000000 * pos) div n - (1000000 * pp) div nn))"
            " div (nn * 1000000) AS BIGINT) AS res_contrib_ppm",
        )
        .orderBy("bin")
    )


_DD_BRIER = f"""
WITH d AS (
  SELECT n_chars::BIGINT AS sc, (source IN {_AUC_TRUSTED})::BIGINT AS y
  FROM documents
),
bounds AS (SELECT min(sc) AS lo, max(sc) AS hi FROM d),
binned AS (
  SELECT CAST(((sc - lo) * {_BRIER_B}) // (hi - lo + 1) AS INT) AS bin, y
  FROM d, bounds
),
per_bin AS (
  SELECT bin, count(*)::HUGEINT AS n, sum(y)::HUGEINT AS pos
  FROM binned GROUP BY 1
),
tot AS (SELECT sum(n) AS nn, sum(pos) AS pp FROM per_bin)
SELECT bin, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
       CAST((1000000 * (n * (2*bin+1) * (2*bin+1) - {4*_BRIER_B} * (2*bin+1) * pos
             + {4*_BRIER_B*_BRIER_B} * pos)) // ({4*_BRIER_B*_BRIER_B} * nn) AS BIGINT)
         AS brier_contrib_ppm,
       CAST((1000000 * ((2*bin+1) * n - {2*_BRIER_B} * pos) * ((2*bin+1) * n - {2*_BRIER_B} * pos))
            // ({4*_BRIER_B*_BRIER_B} * n * nn) AS BIGINT) AS rel_contrib_ppm,
       CAST((n * ((1000000 * pos) // n - (1000000 * pp) // nn)
             * ((1000000 * pos) // n - (1000000 * pp) // nn))
            // (nn * 1000000) AS BIGINT) AS res_contrib_ppm
FROM per_bin, tot
ORDER BY bin
"""

_register("eval_brier_decomposition", _eval_brier, _DD_BRIER)


# ==========================================================================
# Average precision / PR-AUC (round 12): the ranking metric that
# matters when positives are RARE — ROC-AUC (gated above) saturates
# under class imbalance because FPR's denominator is the huge negative
# class; curation pipelines hunting a 1% trusted slice rank scorers by
# AP instead.  Step-wise AP over distinct-score thresholds descending:
#   AP = (1/P) * sum_s pos_s * TP_s / (TP_s + FP_s)
# with TP_s/FP_s the INCLUSIVE cumulative counts at scores >= s.
#
# Exactness: per-threshold precision quantizes to ppm FIRST
# (floor(1e6*TP/(TP+FP)) from exact integers — the Adamic-Adar
# quantize-before-sum convention), so the weighted sum is an
# order-free integer aggregation and the final div by P is one exact
# floor.  Cumulation: the distinct-score relation tracks row
# cardinality (same argument as the ungrouped AUC), so the suffix
# sums come from ONE global_rank pass ordered score-DESCENDING with
# two prefix columns — never a single-partition window.
# ==========================================================================


def _eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank

    docs = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("s"),
        F.col("source").isin(*_AUC_TRUSTED).cast("long").alias("y"),
    )
    per_s = docs.groupBy("s").agg(
        F.sum("y").alias("_pos"),
        F.sum(F.lit(1) - F.col("y")).alias("_neg"),
    )
    staged = global_rank(
        per_s, [F.col("s").desc()], prefix_col=["_pos", "_neg"]
    ).select(
        "_pos",
        (F.col("_before__pos") + F.col("_pos")).alias("_tp"),
        (F.col("_before__neg") + F.col("_neg")).alias("_fp"),
    )
    tot = per_s.agg(
        F.sum("_pos").alias("n_pos"),
        F.sum("_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("n_thresholds"),
    )
    # Overflow audit (VERDICT r12 #3): _tp <= N, so _tp * 1e6 would leave
    # BIGINT near N ~ 9e12; and wsum = sum(pos * prec_ppm) <= 1e6 * P
    # likewise.  Both ride DECIMAL(38,0) here (div is exact integral
    # divide on decimals) — the oracle's window sums are already HUGEINT
    # in DuckDB, so the engines stay symmetric to N ~ 1e32.
    wsum = staged.agg(
        F.sum(
            F.expr(
                "CAST(_pos AS DECIMAL(38,0))"
                " * ((CAST(_tp AS DECIMAL(38,0)) * 1000000) div (_tp + _fp))"
            )
        ).alias("_wsum")
    )
    return (
        tot.crossJoin(F.broadcast(wsum))
        .selectExpr(
            "CAST(n_pos AS BIGINT) AS n_pos",
            "CAST(n_neg AS BIGINT) AS n_neg",
            "CAST(n_thresholds AS BIGINT) AS n_thresholds",
            "CAST(_wsum div n_pos AS BIGINT) AS ap_ppm",
        )
    )


_DD_PR_AUC = f"""
WITH d AS (
  SELECT n_chars::BIGINT AS s, (source IN {_AUC_TRUSTED})::BIGINT AS y
  FROM documents
),
per AS (
  SELECT s, sum(y)::BIGINT AS pos, sum(1 - y)::BIGINT AS neg
  FROM d GROUP BY 1
),
cum AS (
  SELECT pos,
         sum(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         sum(neg) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
  FROM per
),
agg AS (
  SELECT sum(pos * ((tp * 1000000) // (tp + fp)))::HUGEINT AS wsum FROM cum
),
tot AS (
  SELECT sum(pos)::BIGINT AS n_pos, sum(neg)::BIGINT AS n_neg,
         count(*)::BIGINT AS n_thresholds
  FROM per
)
SELECT n_pos, n_neg, n_thresholds,
       CAST(wsum // n_pos AS BIGINT) AS ap_ppm
FROM tot, agg
"""

_register("eval_pr_auc_doclen", _eval_pr_auc, _DD_PR_AUC)


# ==========================================================================
# Cohen's kappa (round 13): chance-corrected agreement — the label-QA
# number for "does the cheap classifier agree with the trusted label
# BEYOND what the class balance hands it for free" (accuracy saturates
# under imbalance exactly like ROC-AUC does; kappa is the standard
# correction).  Raters: the doclen rule (n_chars above the exact corpus
# mean — compared as n_chars * n > sum(n_chars), no division) vs the
# trusted-source label the whole scorer-eval family gates.
#
#   kappa = (po - pe) / (1 - pe)
#         = (a*n - b) / (n^2 - b),  a = tp+tn,
#           b = (tp+fn)(tp+fp) + (fp+tn)(fn+tn)
# — one exact rational of confusion counts; ppm floor at the end.
# kappa can be legitimately NEGATIVE (worse than chance): Spark div and
# DuckDB // both truncate toward zero, so no floor compensation (the
# r13 lesson).  b and n^2 ride DECIMAL(38,0)/HUGEINT (n^2 wraps BIGINT
# past n ~ 3e9 docs).  Degenerate pe = 1 (both raters constant) forces
# po = 1; kappa is DEFINED as 1e6 there on both engines.
#
# Scale shape: one broadcast 1-row join (n, sum) + one partial-agg
# reduction to the 2x2 confusion — no windows, no collect.
# ==========================================================================


def _eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("c"),
        F.col("source").isin(*_AUC_TRUSTED).cast("long").alias("y"),
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"))
    conf = (
        docs.crossJoin(F.broadcast(tot))
        .selectExpr("CASE WHEN c * n > s THEN 1 ELSE 0 END AS p", "y")
        .agg(
            F.sum(F.expr("p * y")).alias("tp"),
            F.sum(F.expr("p * (1 - y)")).alias("fp"),
            F.sum(F.expr("(1 - p) * y")).alias("fn"),
            F.sum(F.expr("(1 - p) * (1 - y)")).alias("tn"),
        )
    )
    return conf.selectExpr(
        "CAST(tp AS BIGINT) AS tp", "CAST(fp AS BIGINT) AS fp",
        "CAST(fn AS BIGINT) AS fn", "CAST(tn AS BIGINT) AS tn",
        "CAST((1000000 * (tp + tn)) div (tp + fp + fn + tn) AS BIGINT)"
        " AS po_ppm",
        """CAST((1000000 * (CAST(tp + fn AS DECIMAL(38,0)) * (tp + fp)
                 + CAST(fp + tn AS DECIMAL(38,0)) * (fn + tn)))
            div (CAST(tp + fp + fn + tn AS DECIMAL(38,0))
                 * (tp + fp + fn + tn)) AS BIGINT) AS pe_ppm""",
        """CAST(CASE WHEN CAST(tp + fp + fn + tn AS DECIMAL(38,0))
                          * (tp + fp + fn + tn)
                     = CAST(tp + fn AS DECIMAL(38,0)) * (tp + fp)
                       + CAST(fp + tn AS DECIMAL(38,0)) * (fn + tn)
                THEN 1000000
                ELSE (1000000 * (CAST(tp + tn AS DECIMAL(38,0))
                                 * (tp + fp + fn + tn)
                                 - (CAST(tp + fn AS DECIMAL(38,0)) * (tp + fp)
                                    + CAST(fp + tn AS DECIMAL(38,0)) * (fn + tn))))
                     div (CAST(tp + fp + fn + tn AS DECIMAL(38,0))
                          * (tp + fp + fn + tn)
                          - (CAST(tp + fn AS DECIMAL(38,0)) * (tp + fp)
                             + CAST(fp + tn AS DECIMAL(38,0)) * (fn + tn)))
           END AS BIGINT) AS kappa_ppm""",
    )


_DD_KAPPA = f"""
WITH d AS (
  SELECT n_chars::BIGINT AS c, (source IN {_AUC_TRUSTED})::BIGINT AS y
  FROM documents
),
tot AS (SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s FROM d),
conf AS (
  SELECT sum(p * y)::BIGINT AS tp, sum(p * (1 - y))::BIGINT AS fp,
         sum((1 - p) * y)::BIGINT AS fn, sum((1 - p) * (1 - y))::BIGINT AS tn
  FROM (SELECT CASE WHEN c * n > s THEN 1 ELSE 0 END AS p, y FROM d, tot)
)
SELECT tp, fp, fn, tn,
       CAST((1000000 * (tp + tn)) // (tp + fp + fn + tn) AS BIGINT) AS po_ppm,
       CAST((1000000 * ((tp + fn)::HUGEINT * (tp + fp)
              + (fp + tn)::HUGEINT * (fn + tn)))
            // ((tp + fp + fn + tn)::HUGEINT * (tp + fp + fn + tn))
            AS BIGINT) AS pe_ppm,
       CAST(CASE WHEN (tp + fp + fn + tn)::HUGEINT * (tp + fp + fn + tn)
                      = (tp + fn)::HUGEINT * (tp + fp)
                        + (fp + tn)::HUGEINT * (fn + tn)
            THEN 1000000
            ELSE (1000000 * ((tp + tn)::HUGEINT * (tp + fp + fn + tn)
                             - ((tp + fn)::HUGEINT * (tp + fp)
                                + (fp + tn)::HUGEINT * (fn + tn))))
                 // ((tp + fp + fn + tn)::HUGEINT * (tp + fp + fn + tn)
                     - ((tp + fn)::HUGEINT * (tp + fp)
                        + (fp + tn)::HUGEINT * (fn + tn)))
       END AS BIGINT) AS kappa_ppm
FROM conf
"""

_register("eval_cohens_kappa_doclen", _eval_cohens_kappa, _DD_KAPPA)
