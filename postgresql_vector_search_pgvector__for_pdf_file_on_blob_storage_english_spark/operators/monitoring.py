"""Series-monitoring operators: exact CUSUM changepoint scores and the
Kaplan-Meier survival table.

Both operate on AGGREGATED series (a time bucket per row, a distinct
duration per row), so their unpartitioned ordered windows see bounded
row counts at any corpus scale — the heavy fact-table reduction happens
upstream as a partial-agg groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cusum_scores(
    series: DataFrame,
    value_col: str,
    order_col: str,
    target: Column | None = None,
) -> DataFrame:
    """Two-sided CUSUM scores for an integer series (Page 1954, public
    method), EXACT via the prefix-min identity: the textbook recurrence

        S_t = max(0, S_{t-1} + x_t - mu)

    is not a window function, but it equals ``P_t - min(0, min_{i<=t}
    P_i)`` for the plain prefix sum ``P_t = sum_{i<=t}(x_i - mu)`` (the
    0 is the virtual empty-prefix origin S_0 = 0) — two running
    windows, all BIGINT, bit-replayable in SQL.  ``cusum_neg`` is the
    mirrored downward score.

    ``target``: the reference level mu as a Column evaluated per row
    (defaults to the floored global mean, computed in-plan and
    broadcast).  Adds columns ``cusum_pos``/``cusum_neg``; input
    columns pass through.
    """
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    d = series
    if target is None:
        tot = series.agg(
            F.sum(value_col).alias("_tot"), F.count(F.lit(1)).alias("_nh")
        )
        d = series.crossJoin(F.broadcast(tot))
        target = (
            (F.col("_tot") - F.col("_tot") % F.col("_nh")) / F.col("_nh")
        ).cast("long")
    return (
        d.withColumn("_p", F.sum(F.col(value_col) - target).over(w))
        .withColumn("cusum_pos", F.col("_p") - F.least(F.min("_p").over(w), F.lit(0)))
        .withColumn("cusum_neg", F.greatest(F.max("_p").over(w), F.lit(0)) - F.col("_p"))
        .drop("_p", "_tot", "_nh")
    )


def page_hinkley_scores(
    series: DataFrame,
    value_col: str,
    order_col: str,
    delta_micro: int = 0,
) -> DataFrame:
    """Page-Hinkley drift scores for an integer series (Page 1954 /
    Hinkley 1971, public method) — CUSUM's self-referencing sibling:
    instead of a FIXED reference mu it deviates against the RUNNING
    mean, so no training period chooses the level:

        m_t  = sum_{i<=t} (x_i - xbar_i - delta)
        PH_t = m_t - min(0, min_{i<=t} m_i)

    (origin 0 in the min = the virtual empty prefix, the same S_0 = 0
    convention as :func:`cusum_scores`).  Exactness: the running mean
    S_i/i is quantized PER TERM to micro units (floor(S_i * 1e6 / i)
    from exact integers — truncating div == floor on the positive
    prefix), so every m_t is an exact BIGINT prefix sum and the oracle
    replays the identity verbatim.  Adds ``ph_micro``; input columns
    pass through.
    """
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    d = (
        series.withColumn("_s", F.sum(value_col).over(w))
        .withColumn("_i", F.count(F.lit(1)).over(w))
        .withColumn(
            "_term",
            F.expr(
                f"CAST(`{value_col}` AS BIGINT) * 1000000"
                " - CAST(CAST(_s AS DECIMAL(38,0)) * 1000000 div _i AS BIGINT)"
                f" - {int(delta_micro)}"
            ),
        )
        .withColumn("_m", F.sum("_term").over(w))
    )
    return (
        d.withColumn(
            "ph_micro", F.col("_m") - F.least(F.min("_m").over(w), F.lit(0))
        )
        .drop("_s", "_i", "_term", "_m")
    )


def km_curve(durations: DataFrame, dur_col: str = "dur", observed_col: str = "observed") -> DataFrame:
    """Kaplan-Meier survival table (Kaplan & Meier 1958, public method)
    from a relation of ``(duration, observed)`` rows — observed = 1 for
    an event, 0 for a right-censored duration.

    Returns one row per distinct EVENT time: ``(dur, n_risk, d_events,
    survival)``.  Risk sets and event counts are exact integers over
    the bounded distinct-duration series; ``survival`` is the one
    rounded float — a sequential cumulative ln-sum whose evaluation
    order is identical across engines (running-frame windows evaluate
    in order), with the ln argument NULLed (not ln(0)) when the risk
    set is exhausted and those rows forced to exactly 0.0.
    """
    # bounded distinct-duration series feeding TWO consumers (totals +
    # risk table) — as a plain branch each re-ran the upstream duration
    # derivation (per-key lead() window over the full scan at the gated
    # entry; r13 opt).  Pin once.
    per_t = durations.groupBy(F.col(dur_col).alias("dur")).agg(
        F.count(F.lit(1)).alias("_n_at"), F.sum(observed_col).alias("d_events")
    ).localCheckpoint(eager=False)
    tot = per_t.agg(F.sum("_n_at").alias("_n"))
    w = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn("n_risk", F.col("_n") - F.sum("_n_at").over(w) + F.col("_n_at"))
        .filter(F.col("d_events") > 0)
    )
    return (
        risk.withColumn(
            "_lnratio",
            F.log(
                F.when(
                    F.col("n_risk") > F.col("d_events"),
                    (F.col("n_risk") - F.col("d_events")) / F.col("n_risk"),
                )
            ),
        )
        .withColumn("_minleft", F.min(F.col("n_risk") - F.col("d_events")).over(w))
        .withColumn(
            "survival",
            F.when(F.col("_minleft") == 0, F.lit(0.0)).otherwise(
                F.round(F.exp(F.sum("_lnratio").over(w)), 4)
            ),
        )
        .select("dur", "n_risk", "d_events", "survival")
    )
