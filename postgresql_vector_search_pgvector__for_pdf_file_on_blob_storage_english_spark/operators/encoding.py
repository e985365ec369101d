"""Supervised categorical-feature encoding for training pipelines.

Two classics a feature platform runs over the corpus before model
training:

* ``target_encode_loo`` — leave-one-out target encoding: replace a
  high-cardinality categorical with the mean label of its group
  EXCLUDING the row itself, the standard leakage-safe variant (plain
  mean encoding leaks each row's own label into its feature; LOO is
  the k-fold scheme's exact n-fold limit).  Encoded values are exact
  ppm integers — floor((sum_y - y) * 10^6 / (n - 1)) — so no float
  mean ever forms; singleton groups yield NULL (no peer evidence).
* ``woe_iv`` — Weight-of-Evidence / Information-Value feature audit:
  per-bucket WOE = ln(P(bucket|good) / P(bucket|bad)) with +1 Laplace
  smoothing, quantized to micro-nats the way the Fellegi-Sunter
  linkage weights are (floor(ln(x) * 10^6 + 0.5) over an identically
  constructed double ratio on both engines), and the scorecard
  IV = sum over buckets of (P(b|good) - P(b|bad)) * WOE_b delivered
  as one exact floor-divided micro integer.

100 TB design: both operators are one partial-agg groupBy to the
(category / bucket) relation — bounded by the CATEGORY DOMAIN, not
row count — plus, for LOO, one broadcast join of that small stats
table back onto the fact rows.  No window, no global stage, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def target_encode_loo(df: DataFrame, cat_col: str, label_col: str) -> DataFrame:
    """Append ``loo_ppm`` — the leave-one-out mean label of the row's
    ``cat_col`` group in exact ppm — to ``df``.

    ``label_col`` must be integral 0/1.  Groups of size 1 encode NULL:
    there is no peer evidence, and emitting the global prior would mix
    two estimators in one column (callers can coalesce themselves).
    """
    stats = df.groupBy(F.col(cat_col).alias("_c")).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(label_col).alias("_s")
    )
    joined = df.join(
        F.broadcast(stats), F.col(cat_col) == F.col("_c"), "left"
    ).drop("_c")
    loo = F.when(
        F.col("_n") > 1,
        F.expr(f"(( _s - {label_col} ) * CAST({PPM} AS BIGINT)) div (_n - 1)"),
    ).cast("long")
    return joined.withColumn("loo_ppm", loo).drop("_n", "_s")


def woe_iv(df: DataFrame, bucket_col: str, label_col: str) -> DataFrame:
    """Per-bucket WOE scorecard plus the feature's total IV.

    Returns one row per bucket: ``bucket, n_good, n_bad, woe_micro,
    iv_micro`` (iv_micro is the feature-level total, identical on
    every row — the scorecard shape a model-risk reviewer reads).

    Counts are Laplace-smoothed (+1 per cell) so empty cells stay
    finite; WOE is quantized to micro-nats from an identically
    associated double ratio — ``ln((g*B)::DOUBLE / (b*G))`` — on both
    engines; IV sums the exact integer products
    (g*B - b*G) * woe_micro and floor-divides by G*B once.
    """
    per_b = df.groupBy(F.col(bucket_col).alias("bucket")).agg(
        (F.sum(label_col) + 1).alias("_g"),
        (F.sum(F.lit(1) - F.col(label_col)) + 1).alias("_b"),
    )
    tot = per_b.agg(
        F.sum("_g").alias("_gt"), F.sum("_b").alias("_bt")
    )
    scored = per_b.crossJoin(F.broadcast(tot)).withColumn(
        "woe_micro",
        F.floor(
            F.log(
                (F.col("_g").cast("double") * F.col("_bt"))
                / (F.col("_b").cast("double") * F.col("_gt"))
            )
            * PPM
            + F.lit(0.5)
        ).cast("long"),
    )
    iv = scored.agg(
        F.sum(
            (
                F.col("_g").cast("decimal(38,0)") * F.col("_bt")
                - F.col("_b").cast("decimal(38,0)") * F.col("_gt")
            )
            * F.col("woe_micro")
        ).alias("_num"),
        F.max(F.col("_gt").cast("decimal(38,0)") * F.col("_bt")).alias("_den"),
    ).selectExpr("CAST(_num div _den AS BIGINT) AS iv_micro")
    return (
        scored.crossJoin(F.broadcast(iv))
        .select(
            "bucket",
            (F.col("_g") - 1).alias("n_good"),
            (F.col("_b") - 1).alias("n_bad"),
            "woe_micro",
            "iv_micro",
        )
    )
