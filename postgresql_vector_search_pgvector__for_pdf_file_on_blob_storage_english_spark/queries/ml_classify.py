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
    toks = tokenize(docs)
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
