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


def t_closeness_audit(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    t_ppms: Sequence[int] = (100_000, 200_000, 300_000),
) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian 2007) — the third rung
    of the release-audit ladder: a group can be k-anonymous AND
    l-diverse yet still leak if its sensitive-value DISTRIBUTION sits
    far from the global one (e.g. a group that is 95% one diagnosis).
    For categorical attributes the distance is total variation,
    ``tv = 0.5 * sum_s |p_g(s) - p(s)|``, computed CROSS-MULTIPLIED —
    ``tv_ppm = sum_s |c_gs * N - c_s * n_g| * 10^6 // (2 * N * n_g)``
    — so no float distribution ever forms and the audit is exact.

    Returns one row per requested threshold: ``(t_ppm, n_groups,
    n_violating_groups, n_rows_at_risk, max_tv_ppm)``; a group
    violates t when its tv_ppm EXCEEDS the threshold.

    Scale shape: one groupBy on (QI, sensitive) cells plus two
    marginal aggregates of that cell relation — every exchange is
    bounded by the attribute domains, never the row count.
    """
    if not qi_cols:
        raise ValueError("t_closeness_audit needs at least one QI column")
    if not t_ppms or any(t <= 0 or t > 1_000_000 for t in t_ppms):
        raise ValueError(f"t_ppms must be in (0, 1e6], got {t_ppms!r}")
    qi = [F.col(c) for c in qi_cols]
    cells = df.groupBy(*qi, F.col(sensitive_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_c_gs")
    )
    gmarg = cells.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.sum("_c_gs").alias("_n_g")
    )
    smarg = cells.groupBy("_s").agg(F.sum("_c_gs").alias("_c_s"))
    tot = cells.agg(F.sum("_c_gs").alias("_N"))
    # every sensitive value must appear for every group (a group MISSING
    # a value contributes |0 - c_s * n_g|), so build the full spine
    spine = gmarg.crossJoin(F.broadcast(smarg)).crossJoin(F.broadcast(tot))
    full = spine.join(cells, [*qi_cols, "_s"], "left").withColumn(
        "_c_gs", F.coalesce("_c_gs", F.lit(0))
    )
    per_group = full.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.max("_n_g").alias("_n_g"),
        F.max("_N").alias("_N"),
        F.sum(
            F.abs(
                F.col("_c_gs").cast("decimal(38,0)") * F.col("_N")
                - F.col("_c_s").cast("decimal(38,0)") * F.col("_n_g")
            )
        ).alias("_tvnum"),
    ).selectExpr(
        "_n_g",
        "CAST((_tvnum * 1000000) div (2 * CAST(_N AS DECIMAL(38,0)) * _n_g) AS BIGINT) AS _tv_ppm",
    )
    per_t = per_group.select(
        "_n_g", "_tv_ppm",
        F.explode(F.array(*[F.lit(int(t)) for t in t_ppms])).alias("t_ppm"),
    )
    return (
        per_t.groupBy("t_ppm")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("_tv_ppm") > F.col("t_ppm"), 1).otherwise(0)).alias(
                "n_violating_groups"
            ),
            F.sum(
                F.when(F.col("_tv_ppm") > F.col("t_ppm"), F.col("_n_g")).otherwise(0)
            ).alias("n_rows_at_risk"),
            F.max("_tv_ppm").alias("max_tv_ppm"),
        )
        .orderBy("t_ppm")
    )
