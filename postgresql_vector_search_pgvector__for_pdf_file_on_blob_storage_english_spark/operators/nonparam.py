"""Nonparametric / rank-based statistics and gaps-and-islands streaks.

Widens the robust-statistics family (winsorize in ranking.py, MAD
outliers, KS drift in the monitoring layer) with the two classic
distribution-free tools a data-quality gate reaches for when nothing
can be assumed Gaussian, plus the gaps-and-islands streak primitive
behavioral analytics is built on:

* ``mann_whitney_u`` — two-sample rank test (does distribution A
  stochastically dominate B?).  Computed on the (distinct value,
  per-group counts) relation a partial-agg groupBy already reduced
  the fact table to, with AVERAGE ranks for ties carried as exact
  DOUBLED integers (2*rank is always integral), so the statistic is
  exact and engine-independent — no float rank ever forms.
* ``theil_sen_micro`` — the median-of-pairwise-slopes robust trend
  estimator.  Runs on an already-aggregated bounded series (e.g.
  monthly revenue): the pair relation is |series|^2, bounded by the
  CALENDAR, not the corpus.  Slopes are ordered by one IEEE division
  (bit-identical across engines) and the winning pair's slope is
  re-derived as an exact floor-division integer in micro-units.
* ``daily_streaks`` — per-key consecutive-day islands via the
  row_number anchor trick; every window is partitioned by the key,
  so the operator scales with the per-key history, never globally.

100 TB design: the only shuffles are partial-agg groupBys (value
counts, per-key distinct days) and the per-key windows; the global
ordered windows inside ``mann_whitney_u`` / ``theil_sen_micro`` see
the REDUCED relation only (distinct cents / calendar-pair rows) —
the same boundedness contract the monitoring family documents in
tests/test_plans.py's allowlist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def mann_whitney_u(df: DataFrame, value_col: str, is_a_col: str) -> DataFrame:
    """Exact two-sample Mann-Whitney U over an integer value column.

    ``df`` must carry an integral ``value_col`` (quantize money to
    cents first) and ``is_a_col`` in {0, 1} marking membership of
    sample A (1) vs B (0).  Returns one row:

    ``n_a, n_b, r2_a`` (doubled rank-sum of A, exact), ``u2_a, u2_b``
    (doubled U statistics, ``u2_a + u2_b == 2 n_a n_b``) and
    ``auc_ppm`` = floor(10^6 * U_A / (n_A n_B)) — the common-language
    effect size (P(a > b) + P(a == b)/2), an exact integer.

    With average ranks for ties, the rank mass contributed at value v
    is  a_v * (2*cum_before + a_v + b_v + 1) / 2;  doubling removes
    the halving so everything stays in DECIMAL(38,0).
    """
    per_v = (
        df.groupBy(F.col(value_col).alias("_v"))
        .agg(
            F.sum(F.col(is_a_col)).alias("_a"),
            F.sum(F.lit(1) - F.col(is_a_col)).alias("_b"),
        )
    )
    # cumulative count STRICTLY below v, over the bounded distinct-value
    # series (allowlisted global window: the relation was reduced by the
    # groupBy above; its size is the value DOMAIN, not the row count)
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    scored = per_v.withColumn(
        "_cb", F.coalesce(F.sum(F.col("_a") + F.col("_b")).over(w), F.lit(0))
    )
    agg = scored.agg(
        F.sum("_a").cast("decimal(38,0)").alias("_na"),
        F.sum("_b").cast("decimal(38,0)").alias("_nb"),
        F.sum(
            F.col("_a").cast("decimal(38,0)")
            * (2 * F.col("_cb") + F.col("_a") + F.col("_b") + 1)
        ).alias("_r2a"),
    )
    return agg.selectExpr(
        "CAST(_na AS BIGINT) AS n_a",
        "CAST(_nb AS BIGINT) AS n_b",
        "CAST(_r2a AS BIGINT) AS r2_a",
        "CAST(_r2a - _na * (_na + 1) AS BIGINT) AS u2_a",
        "CAST(2 * _na * _nb - (_r2a - _na * (_na + 1)) AS BIGINT) AS u2_b",
        f"CAST(((_r2a - _na * (_na + 1)) * {PPM}) div (2 * _na * _nb) AS BIGINT) AS auc_ppm",
    )


def theil_sen_micro(series: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Theil-Sen slope over a BOUNDED integer series (x strictly
    increasing integers, y integral units, e.g. month index / revenue
    cents).

    Pairs (i < j) are formed by a self-join on the already-aggregated
    series (|series|^2 rows, calendar-bounded); each pair's slope is
    ordered by the double quotient dy/dx — a single IEEE division,
    bit-identical across engines — with an (x_i, x_j) tiebreak, and the
    LOWER-median pair is selected by row_number.  The reported
    ``slope_micro`` re-derives that pair's slope as an exact
    floor((dy * 10^6) / dx) in integers (explicit negative handling:
    Spark's ``div`` truncates while DuckDB's ``//`` floors, so the
    negative branch is spelled out on both sides).

    Returns one row: ``n_points, n_pairs, slope_micro``.
    """
    a = series.select(F.col(x_col).alias("_xi"), F.col(y_col).alias("_yi"))
    b = series.select(F.col(x_col).alias("_xj"), F.col(y_col).alias("_yj"))
    pairs = a.join(b, F.col("_xi") < F.col("_xj")).select(
        "_xi",
        "_xj",
        (F.col("_xj") - F.col("_xi")).alias("_dx"),
        (F.col("_yj") - F.col("_yi")).alias("_dy"),
    )
    pairs = pairs.withColumn(
        "_slope_dbl", F.col("_dy").cast("double") / F.col("_dx").cast("double")
    )
    # lower median by (slope, xi, xj) — global window over the bounded
    # pair relation (calendar^2), allowlisted with that argument
    wn = Window.orderBy("_slope_dbl", "_xi", "_xj")
    ranked = pairs.withColumn("_rn", F.row_number().over(wn)).withColumn(
        "_cnt", F.count(F.lit(1)).over(Window.partitionBy())
    )
    med = ranked.filter(F.col("_rn") == F.floor((F.col("_cnt") + 1) / 2))
    n_points = series.count()
    return med.selectExpr(
        f"CAST({n_points} AS BIGINT) AS n_points",
        "CAST(_cnt AS BIGINT) AS n_pairs",
        f"""CAST(CASE WHEN _dy >= 0
                 THEN (_dy * CAST({PPM} AS BIGINT)) div _dx
                 ELSE -((-_dy * CAST({PPM} AS BIGINT) + _dx - 1) div _dx)
            END AS BIGINT) AS slope_micro""",
    )


def daily_streaks(df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Consecutive-day activity islands per key (gaps-and-islands).

    Reduces to distinct (key, epoch-day), anchors each run with
    ``epoch_day - row_number()`` (constant within a consecutive run),
    and aggregates runs.  Returns one row per (key, island):
    ``key, start_epochday, streak_len``.

    Every window is PARTITIONED BY the key — the operator's cost is
    the per-key history length; at 100x keys it parallelizes across
    the key hash space with no global stage.
    """
    days = (
        df.select(
            F.col(key_col).alias("_k"),
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("_d"),
        )
        .distinct()
    )
    w = Window.partitionBy("_k").orderBy("_d")
    anchored = days.withColumn("_anchor", F.col("_d") - F.row_number().over(w))
    return (
        anchored.groupBy("_k", "_anchor")
        .agg(F.min("_d").alias("start_epochday"), F.count(F.lit(1)).alias("streak_len"))
        .select(F.col("_k").alias(key_col), "start_epochday", "streak_len")
    )
