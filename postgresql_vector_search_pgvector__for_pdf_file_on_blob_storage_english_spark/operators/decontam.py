"""Benchmark decontamination — flag training documents that share word
n-grams with a benchmark/eval set, the standard leakage guard in LLM
training-data pipelines (the 13-gram test of GPT-3 appendix C / PaLM;
n is a parameter here).

Not in the reference (it ingests trusted PDFs); part of the
training-data-pipeline surface this engine adds, alongside dedup
(``dedup.py``) whose shingle/hash primitives it reuses so Spark and the
DuckDB oracle agree bit-for-bit (``hashing.py`` portable md5-60bit).

Scale shape (the benchmark set is SMALL, the train set is the 100 TB
side — the asymmetry the plan exploits):

* benchmark grams: shingle → hash → distinct — a few million longs at
  most, **broadcast** to every executor;
* train side: shingle → hash → explode → **broadcast** inner join (no
  shuffle of train data) → partial-count groupBy per doc, so the one
  exchange carries ``(doc_id, count)`` for docs with at least one hit —
  contamination-bound, not corpus-bound;
* the final left join back onto train doc ids re-uses the train scan
  and broadcasts the hit counts (hit docs are a tiny minority by
  construction in a healthy corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash60
from .dedup import shingle_stage


def benchmark_grams(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct 60-bit hashes of the benchmark's word n-grams —
    the small broadcast side: ``(gram_h long)``."""
    sh = shingle_stage(benchmark, text_col, n, keep_cols=[], out_col="_sh")
    return (
        sh.select(F.explode("_sh").alias("_s"))
        .select(stable_hash60("_s").alias("gram_h"))
        .distinct()
    )


def contamination_flags(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-train-document contamination report:
    ``(id, n_grams, n_hits, contaminated)``.

    ``n_hits`` counts the doc's distinct n-grams that appear anywhere in
    the benchmark set (shingle arrays are pre-deduplicated per doc);
    ``contaminated`` is ``n_hits > 0``.  Callers drop or quarantine
    flagged docs: ``flags.filter(~F.col("contaminated"))`` joined back
    by id, or inverted as a left-anti join at scale.
    """
    grams = benchmark_grams(benchmark, text_col, n).withColumn("_hit", F.lit(1))
    train_sh = shingle_stage(train, text_col, n, keep_cols=[id_col], out_col="_sh")
    # ONE pass over the train corpus: explode grams, mark hits via the
    # broadcast left join (no train-side shuffle), then a single partial-
    # combinable groupBy whose exchange carries (id, two longs) per doc.
    train_grams = train_sh.select(
        F.col(id_col), F.explode("_sh").alias("_s")
    ).select(id_col, stable_hash60("_s").alias("gram_h"))
    marked = train_grams.join(F.broadcast(grams), "gram_h", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )
