"""Privacy audits over tabular corpora.

k-anonymity is the release-gating question for any dataset carrying
quasi-identifiers (the attribute combinations that re-identify a row
when joined against an external table — Sweeney 2002): a dataset is
k-anonymous iff every quasi-identifier combination is shared by at
least k rows.  The audit here reports, for each requested k, how far
the dataset is from that bar — the number the pipeline checks BEFORE
exporting training data containing user attributes.

Shape at 100 TB: one groupBy on the quasi-identifier tuple (map-side
partial count — the only corpus-sized exchange ships (QI tuple, count)
partials), then the per-k report aggregates the GROUP relation, whose
size is the distinct QI combinations, not the row count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: Sequence[str],
    ks: Sequence[int] = (2, 5, 10),
) -> DataFrame:
    """Per-k audit rows ``(k, n_groups, n_violating_groups,
    n_rows_at_risk, min_group_size)``: a group violates k when fewer
    than k rows share its quasi-identifier combination, and its rows
    are "at risk" (re-identifiable at that k).  ``min_group_size`` is
    the dataset's actual k-anonymity level (the largest k the data
    satisfies)."""
    if not qi_cols:
        raise ValueError("k_anonymity_audit needs at least one QI column")
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be positive, got {ks!r}")
    groups = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).alias("_size")
    )
    per_k = groups.select(
        "_size", F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k")
    )
    return (
        per_k.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("_size") < F.col("k"), 1).otherwise(0)).alias(
                "n_violating_groups"
            ),
            F.sum(
                F.when(F.col("_size") < F.col("k"), F.col("_size")).otherwise(0)
            ).alias("n_rows_at_risk"),
            F.min("_size").alias("min_group_size"),
        )
        .orderBy("k")
    )


def l_diversity_audit(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    ls: Sequence[int] = (2, 3),
) -> DataFrame:
    """Distinct l-diversity companion audit: a QI group is l-diverse
    when its rows carry at least l DISTINCT values of the sensitive
    attribute (k-anonymity alone lets a homogeneous group leak the
    sensitive value without re-identification).  Returns ``(l,
    n_groups, n_violating_groups, n_rows_at_risk, min_distinct)``.

    Same two-aggregate shape: the corpus-sized exchange carries the QI
    tuple plus one column; the report runs on the group relation."""
    if not qi_cols:
        raise ValueError("l_diversity_audit needs at least one QI column")
    if not ls or any(v < 1 for v in ls):
        raise ValueError(f"ls must be positive, got {ls!r}")
    groups = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).alias("_size"),
        F.countDistinct(sensitive_col).alias("_ndist"),
    )
    per_l = groups.select(
        "_size",
        "_ndist",
        F.explode(F.array(*[F.lit(int(v)) for v in ls])).alias("l"),
    )
    return (
        per_l.groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("_ndist") < F.col("l"), 1).otherwise(0)).alias(
                "n_violating_groups"
            ),
            F.sum(
                F.when(F.col("_ndist") < F.col("l"), F.col("_size")).otherwise(0)
            ).alias("n_rows_at_risk"),
            F.min("_ndist").alias("min_distinct"),
        )
        .orderBy("l")
    )
