"""Model-quality evaluation metrics for data-pipeline classifiers.

A 100 TB curation pipeline gates on learned scorers (quality
classifiers, language ID, dedup thresholds); before a scorer gates
anything it has to be EVALUATED at corpus scale.  Two standard
metrics, both reduced to integer arithmetic so the result is
bit-identical across partitionings and engines:

- :func:`auc_roc` — ROC-AUC via the Mann-Whitney U rank statistic
  (Hanley & McNeil 1982; the rank identity is public statistics).
  AUC = P(score_pos > score_neg) + P(tie)/2 over all (pos, neg)
  pairs.  Computed WITHOUT materializing pairs: group by quantized
  score (one partial-agg exchange bounded by distinct score values),
  cumulative negatives below each score via a group-partitioned
  window, then

      2U = sum_s( 2 * pos_s * neg_below_s + pos_s * neg_s )

  which is exact in longs; the reported ``auc_micro`` is
  floor(1e6 * 2U / (2 * n_pos * n_neg)).

- :func:`calibration_bins` — the reliability table: quantized scores
  bucketed into equal-width bins over the group's own [min, max],
  per-bin mean predicted score vs empirical positive rate (both in
  integer micro-units).  A scorer can rank perfectly (AUC 1.0) and
  still be miscalibrated; pipelines thresholding a probability need
  this table, not AUC.

Scale shape (both): one scan reduced by a map-side-combinable groupBy
keyed on (group, quantized score / bin) — nothing downstream exceeds
distinct-score / n_bins cardinality per group, and no global window
exists (the AUC cumsum is partitioned by the group key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _quantized(score_col: str, scale: int):
    return F.expr(f"CAST(floor({score_col} * {scale} + 0.5) AS BIGINT)")


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """ROC-AUC of ``score_col`` against boolean ``label_col``, one row
    per ``group_col`` value (or one global row), as
    ``(group?, n_pos, n_neg, auc_micro)`` with ``auc_micro`` in
    [0, 1_000_000].  Groups with no positives or no negatives report
    ``auc_micro`` NULL (AUC undefined) rather than a fabricated 0.5.

    Ties share credit at 1/2 exactly (average-rank convention), and
    every intermediate is a long, so the number is reproducible
    bit-for-bit at any partitioning — the property that lets two
    engines gate on equality instead of tolerance.
    """
    keys = [group_col] if group_col else []
    per_score = (
        df.select(
            *keys,
            _quantized(score_col, scale).alias("_s"),
            F.col(label_col).cast("boolean").alias("_y"),
        )
        .groupBy(*(keys + ["_s"]))
        .agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_pos"),
            F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("_neg"),
        )
    )
    return auc_from_score_counts(per_score, keys)


def auc_from_score_counts(per_score: DataFrame, keys: list[str]) -> DataFrame:
    """The counts -> AUC stage of :func:`auc_roc`, split out so any
    PER-SCORE COUNT relation plugs in — notably the streamed score-count
    log (streaming/evalmetrics_stream.py), where the raw rows are long
    gone but their (score, label) histogram survives.  Input columns:
    ``keys..., _s (quantized score), _pos, _neg``."""
    if keys:
        w = (
            Window.partitionBy(*keys)
            .orderBy("_s")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        staged = per_score.withColumn(
            "_neg_below", F.coalesce(F.sum("_neg").over(w), F.lit(0))
        )
    else:
        # ungrouped: the distinct-score relation is bounded only by the
        # caller's quantization scale — at scale=100 it measured 2.7x
        # growth for 10x rows (partial domain saturation), and a finer
        # scale makes it row-cardinality.  The r11 discipline: no
        # single-partition window may depend on a tuning knob for its
        # boundedness — cumulate through the global_rank prefix sum.
        from .ranking import global_rank

        staged = (
            global_rank(per_score, [F.col("_s")], prefix_col="_neg")
            .withColumnRenamed("_before", "_neg_below")
            .drop("_rank", "_n")
        )
    out = staged.groupBy(*keys).agg(
        F.sum("_pos").alias("n_pos"),
        F.sum("_neg").alias("n_neg"),
        F.sum(
            2 * F.col("_pos") * F.col("_neg_below") + F.col("_pos") * F.col("_neg")
        ).alias("_u2"),
    )
    denom = 2 * F.col("n_pos") * F.col("n_neg")
    # exact integer floor of 1e6 * U2 / denom (same _idiv trick as
    # graph.py: reduce the numerator to an exact multiple first)
    num = F.col("_u2") * 1_000_000
    auc = ((num - num % denom) / denom).cast("long")
    return out.select(
        *keys,
        "n_pos",
        "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc)
        .alias("auc_micro"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
    n_bins: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Reliability table: ``(group?, bin, n, mean_score_micro,
    pos_rate_micro)`` over ``n_bins`` equal-width bins of the quantized
    score between the GROUP's own min and max (so every group uses its
    full bin range).  Bins with no rows are absent (a dense spine adds
    nothing here — there is no smoothing term, unlike PSI).

    Both reported columns are exact integer floors of 1e6-scaled
    ratios, so the table hash-compares across engines.
    """
    keys = [group_col] if group_col else []
    per_score = (
        df.select(
            *keys,
            _quantized(score_col, scale).alias("_s"),
            F.col(label_col).cast("boolean").alias("_y"),
        )
        .groupBy(*(keys + ["_s"]))
        .agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_pos"),
            F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("_neg"),
        )
    )
    return calibration_from_score_counts(per_score, keys, n_bins, scale)


def calibration_from_score_counts(
    per_score: DataFrame, keys: list[str], n_bins: int = 10, scale: int = 100
) -> DataFrame:
    """The counts -> reliability-table stage of :func:`calibration_bins`
    over a PER-SCORE COUNT relation (``keys..., _s, _pos, _neg``) —
    shared with the streamed score-count log, which holds exactly this
    histogram (streaming/evalmetrics_stream.py)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    bounds = per_score.groupBy(*keys).agg(
        F.min("_s").alias("_lo"), F.max("_s").alias("_hi")
    )
    j = (
        per_score.join(F.broadcast(bounds), keys)
        if keys
        else per_score.crossJoin(F.broadcast(bounds))
    )
    b = F.expr(f"CAST(((_s - _lo) * {n_bins}) div (_hi - _lo + 1) AS INT)")
    cnt = F.col("_pos") + F.col("_neg")
    agg = (
        j.withColumn("bin", b)
        .groupBy(*(keys + ["bin"]))
        .agg(
            F.sum(cnt).alias("n"),
            F.sum(F.col("_s") * cnt).alias("_ssum"),
            F.sum("_pos").alias("_npos"),
        )
    )

    def micro_ratio(num_col, den_col):
        num = num_col * 1_000_000
        return ((num - num % den_col) / den_col).cast("long")

    return agg.select(
        *keys,
        "bin",
        "n",
        # mean RAW score in micro-units: 1e6 * _ssum / (n * scale)
        # (scale divides the quantization back out)
        micro_ratio(F.col("_ssum"), F.col("n") * F.lit(scale)).alias(
            "mean_score_micro"
        ),
        micro_ratio(F.col("_npos"), F.col("n")).alias("pos_rate_micro"),
    )


def ndcg_discounts_micro(k: int) -> list[tuple[int, int]]:
    """The literal rank-discount table ``(rank, floor(1e6 / log2(rank
    + 1)))`` for ranks 1..k — computed ONCE in Python so neither engine
    evaluates a logarithm at query time (the PSI lesson, taken one step
    further: no runtime transcendental at all, both engines consume
    identical integer literals)."""
    import math

    return [(i, int(1_000_000 / math.log2(i + 1))) for i in range(1, k + 1)]


def ndcg_at_k(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """nDCG@k per query — THE graded ranking metric (Järvelin &
    Kekäläinen 2002) a retrieval stack is tuned against, next to the
    existing MRR/recall entry.

    ``results``: retrieved ranking ``(query, rank 1.., doc-level
    rel)``; ``qrels``: the full judged relevance set ``(query, rel)``
    per query (ideal DCG takes its top-k relevances, so a system is
    penalized for missing relevant docs it never retrieved — the
    standard convention, not within-retrieved-set renormalization).

    Exact arithmetic end-to-end: DCG = sum(rel * disc(rank)) over the
    literal micro-discount table, nDCG in ppm-of-a-million via exact
    integer floor division; queries with zero ideal gain report NULL.

    Shape: two bounded aggregations (results are <= k rows per query
    already; the ideal side is a query-partitioned top-k window over
    qrels) and a broadcast-sized per-query join."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    disc = F.create_map(
        *[F.lit(x) for pair in ndcg_discounts_micro(k) for x in pair]
    )
    dcg = (
        results.filter(F.col(rank_col) <= k)
        .withColumn("_d", disc[F.col(rank_col)])
        .groupBy(query_col)
        .agg(F.sum(F.col(rel_col) * F.col("_d")).alias("_dcg"))
    )
    # rel-desc alone is a sufficient ideal order: equal relevances are
    # interchangeable across discount slots (rel * disc sums the same
    # under any tie permutation), so no tie-break column is needed for
    # determinism.
    ideal = (
        qrels.select(query_col, rel_col)
        .withColumn("_r", F.row_number().over(
            Window.partitionBy(query_col).orderBy(F.col(rel_col).desc())
        ))
        .filter(F.col("_r") <= k)
        .withColumn("_d", disc[F.col("_r")])
        .groupBy(query_col)
        .agg(F.sum(F.col(rel_col) * F.col("_d")).alias("_idcg"))
    )
    j = dcg.join(ideal, query_col, "full_outer").fillna(
        0, subset=["_dcg", "_idcg"]
    )
    num = F.col("_dcg") * 1_000_000
    den = F.col("_idcg")
    ndcg = ((num - num % den) / den).cast("long")
    return j.select(
        query_col,
        F.col("_dcg").alias("dcg_micro"),
        F.col("_idcg").alias("idcg_micro"),
        F.when(F.col("_idcg") > 0, ndcg).alias("ndcg_ppm"),
    )
