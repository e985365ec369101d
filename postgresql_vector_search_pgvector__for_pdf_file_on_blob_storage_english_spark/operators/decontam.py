"""Benchmark decontamination — flag training documents that share word
n-grams with a benchmark/eval set, the standard leakage guard in LLM
training-data pipelines (the 13-gram test of GPT-3 appendix C / PaLM;
n is a parameter here).

Not in the reference (it ingests trusted PDFs); part of the
training-data-pipeline surface this engine adds, alongside dedup
(``dedup.py``) whose shingle semantics it mirrors and the portable
md5-60bit hash (``hashing.py``) so Spark and the DuckDB oracle agree
bit-for-bit.

Scale shape (the benchmark set is SMALL, the train set is the 100 TB
side — the asymmetry the plan exploits):

* benchmark grams: shingle → hash → distinct — a few million longs at
  most, **broadcast** to every executor;
* train side: ONE pass — explode *shingle indices* (see below), hash,
  per-doc distinct, **broadcast** left join (no shuffle of train rows
  against the benchmark), then a partial-combinable per-doc count;
* the two exchanges both carry hashed-gram-sized rows, never text.

**Why indices, not ``explode(shingle_array)``**: Spark's ``Generate``
re-evaluates a non-attribute generator expression per OUTPUT row, so
exploding the composed shingle array costs ``O(shingles_per_doc^2)``
text work per document (measured 7x wall-clock at sf0.1; a
non-deterministic projection barrier does not help).  Exploding a cheap
``sequence(1, k)`` instead and building ONE shingle per output row from
the carried ``_words`` attribute keeps total work linear in corpus
tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash60
from ..functions.text import normalize_whitespace_col


def _exploded_gram_hashes(
    df: DataFrame, text_col: str, n: int, keep_cols: list[str]
) -> DataFrame:
    """``(keep_cols..., gram_h)`` — one row per word-n-gram occurrence.

    ``slice(words, i, n)`` self-truncates at the array end, so documents
    shorter than ``n`` words fall back to a single full-text gram —
    byte-identical to ``dedup.py::shingle_stage``'s fallback (normalized
    text is single-spaced, so re-joining all words IS the trimmed text).
    """
    words = F.split(F.trim(normalize_whitespace_col(text_col)), " ")
    staged = df.select(*keep_cols, words.alias("_words")).withColumn(
        "_k", F.greatest(F.size("_words") - (n - 1), F.lit(1))
    )
    ex = staged.select(
        *keep_cols,
        "_words",
        F.explode(F.sequence(F.lit(1), F.col("_k"))).alias("_i"),
    )
    gram = F.concat_ws(" ", F.slice("_words", F.col("_i"), n))
    return ex.select(*keep_cols, stable_hash60(gram).alias("gram_h"))


def benchmark_grams(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct 60-bit hashes of the benchmark's word n-grams —
    the small broadcast side: ``(gram_h long)``."""
    return _exploded_gram_hashes(benchmark, text_col, n, keep_cols=[]).distinct()


def contamination_flags(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-train-document contamination report:
    ``(id, n_grams, n_hits, contaminated)``.

    ``n_grams`` counts the doc's distinct n-grams; ``n_hits`` counts how
    many of those appear anywhere in the benchmark set; ``contaminated``
    is ``n_hits > 0``.  Callers drop or quarantine flagged docs:
    ``flags.filter(~F.col("contaminated"))`` joined back by id, or
    inverted as a left-anti join at scale.
    """
    grams = benchmark_grams(benchmark, text_col, n).withColumn("_hit", F.lit(1))
    train_grams = _exploded_gram_hashes(
        train, text_col, n, keep_cols=[id_col]
    ).dropDuplicates([id_col, "gram_h"])
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
