"""Data profiling and declarative quality constraints — the validation
stage a training-data pipeline runs before anything trains on a new
snapshot (the Deequ/Great-Expectations capability, re-expressed as plain
aggregates).

* :func:`column_profile` — per-column statistics (rows, nulls, exact
  distincts, min/max, mean) in ONE aggregation pass: all columns'
  measures are expressions of a single ``agg``, so the corpus is read
  once; Spark plans the multi-distinct via Expand + one shuffle of
  partial aggregates, never N scans for N columns.
* :func:`histogram` — equi-width value histogram with a closed bucket
  formula (``floor((x-lo)/width)``, top edge clamped into the last
  bucket) so any engine reproduces identical buckets.
* :func:`check_constraints` — Deequ-style declarative checks: each
  constraint contributes one aggregate expression (its *observation*)
  and a threshold; all observations compute in the same single pass and
  the report is one row per constraint ``(constraint, observed,
  passed)``.  Helpers build the standard observations: completeness
  (non-null fraction), uniqueness (distinct/total), range and set
  conformance fractions, regex-match fraction.

100 TB shape: everything here is a map-side-partial aggregate over one
scan; no joins, no windows, no driver loop.  Gate a pipeline by
``check_constraints(...).filter(~passed)`` being empty.

Determinism: fractions are rounded to 6 decimals; min/max/mean on
doubles follow the engine-portable rounding conventions used across the
registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format per-column profile:
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value, mean)``.

    ``min_value``/``max_value`` are stringified (profile rows span
    heterogeneous column types); ``mean`` is NULL for non-numeric
    columns.  Exact distincts, not sketches — the profile IS the gate,
    so it must not wobble run-to-run."""
    cols = cols or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
        if isinstance(schema[c], _NUMERIC_TYPES):
            aggs.append(F.round(F.avg(F.col(c).cast("double")), 6).alias(f"__mean_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__mean_{c}"))
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
            F.col(f"__mean_{c}").alias("mean"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def histogram(
    df: DataFrame,
    col: str,
    n_buckets: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram ``(bucket, lo, hi, n)`` over ``col``.

    Bounds default to the observed min/max (one cheap agg, broadcast
    back as literals is avoided — the bounds join is a 1-row cross
    join).  Bucket = ``floor((x - lo) / width)`` with the top edge
    clamped into bucket ``n_buckets - 1``; empty buckets are absent
    (outer-join a bucket spine if a dense axis is needed).  A constant
    column (or explicit ``lo == hi``) degenerates to a single bucket 0
    rather than dividing by a zero width (ANSI-mode safe)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    x = F.col(col).cast("double")
    if lo is None or hi is None:
        bounds = df.agg(
            F.min(x).alias("__lo"), F.max(x).alias("__hi")
        )
        src = df.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    else:
        src = df
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(float(n_buckets))
    bucket = F.least(
        F.greatest(
            F.floor(F.coalesce(F.try_divide(x - lo_c, width), F.lit(0.0))),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    ).cast("int")
    nb = F.lit(float(n_buckets))
    return (
        src.filter(x.isNotNull() & (x >= lo_c) & (x <= hi_c))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.min(lo_c + F.lit(0.0)).alias("_lo"),
            F.min(hi_c + F.lit(0.0)).alias("_hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "bucket",
            F.round(
                F.col("_lo") + F.col("bucket") * (F.col("_hi") - F.col("_lo")) / nb, 6
            ).alias("bucket_lo"),
            F.round(
                F.col("_lo") + (F.col("bucket") + 1) * (F.col("_hi") - F.col("_lo")) / nb, 6
            ).alias("bucket_hi"),
            "n",
        )
    )


# ---- constraint observation builders (each is ONE aggregate Column) ----

def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value."""
    return F.avg(F.col(col).isNotNull().cast("double"))


def uniqueness(col: str) -> Column:
    """Exact distinct values / total rows (1.0 = a key).  Empty input
    yields NULL (``try_divide``), not an ANSI DIVIDE_BY_ZERO — a NULL
    observation fails any ``>=`` threshold gracefully."""
    return F.try_divide(F.count_distinct(F.col(col)), F.count(F.lit(1)))


def fraction_in_range(col: str, lo: float, hi: float) -> Column:
    """Fraction of non-null values inside [lo, hi]."""
    x = F.col(col).cast("double")
    return F.avg(((x >= lo) & (x <= hi)).cast("double"))


def fraction_in_set(col: str, allowed: list) -> Column:
    """Fraction of ALL rows whose value is one of ``allowed`` — a NULL
    is non-conforming (``isin`` yields NULL on NULL input, which
    ``avg`` would silently drop; coalesce pins it to False)."""
    return F.avg(F.coalesce(F.col(col).isin(allowed), F.lit(False)).cast("double"))


def fraction_matching(col: str, pattern: str) -> Column:
    """Fraction of ALL rows matching the (portable-subset) regex; NULL
    is non-conforming (same coalesce rationale as ``fraction_in_set``)."""
    return F.avg(F.coalesce(F.col(col).rlike(pattern), F.lit(False)).cast("double"))


def check_constraints(
    df: DataFrame,
    checks: list[tuple[str, Column, float]],
) -> DataFrame:
    """Evaluate ``(name, observation, min_threshold)`` constraints in one
    aggregation pass.  Returns ``(constraint, observed, passed)`` — one
    row per check, ``observed`` rounded to 6, ``passed`` =
    ``observed >= min_threshold``."""
    if not checks:
        raise ValueError("no constraints given")
    names = [n for n, _, _ in checks]
    if len(set(names)) != len(names):
        raise ValueError("duplicate constraint names")
    wide = df.agg(
        *[F.round(obs.cast("double"), 6).alias(f"__obs_{i}") for i, (_, obs, _) in enumerate(checks)]
    )
    rows = [
        F.struct(
            F.lit(name).alias("constraint"),
            F.col(f"__obs_{i}").alias("observed"),
            # NULL observation (e.g. uniqueness over an empty snapshot)
            # is a FAILED constraint, not a NULL verdict
            F.coalesce(
                F.col(f"__obs_{i}") >= F.lit(float(thr)), F.lit(False)
            ).alias("passed"),
        )
        for i, (name, _, thr) in enumerate(checks)
    ]
    return wide.select(F.explode(F.array(*rows)).alias("c")).select("c.*")


def profile_drift(before: DataFrame, after: DataFrame) -> DataFrame:
    """Snapshot drift report: join two :func:`column_profile` outputs on
    ``column`` and emit per-column deltas — the check a pipeline runs
    between corpus snapshots (did the null rate jump? did the mean
    shift? did cardinality collapse?) before retraining on the new one.

    Returns ``(column, n_rows_before, n_rows_after, null_frac_delta,
    distinct_ratio_delta, mean_delta)``; ratio deltas are fractions of
    the respective snapshot's row count so differently-sized snapshots
    compare meaningfully.  Inner join: a column present in only one
    snapshot is a SCHEMA change, which callers should catch by comparing
    ``df.columns`` first (this operator reports value drift, not schema
    drift)."""
    b = before.select(
        "column",
        F.col("n_rows").alias("n_rows_before"),
        F.try_divide(F.col("n_nulls"), F.col("n_rows")).alias("_b_null_frac"),
        F.try_divide(F.col("n_distinct"), F.col("n_rows")).alias("_b_dist_ratio"),
        F.col("mean").alias("_b_mean"),
    )
    a = after.select(
        "column",
        F.col("n_rows").alias("n_rows_after"),
        F.try_divide(F.col("n_nulls"), F.col("n_rows")).alias("_a_null_frac"),
        F.try_divide(F.col("n_distinct"), F.col("n_rows")).alias("_a_dist_ratio"),
        F.col("mean").alias("_a_mean"),
    )
    return b.join(a, "column").select(
        "column",
        "n_rows_before",
        "n_rows_after",
        F.round(F.col("_a_null_frac") - F.col("_b_null_frac"), 6).alias("null_frac_delta"),
        F.round(F.col("_a_dist_ratio") - F.col("_b_dist_ratio"), 6).alias("distinct_ratio_delta"),
        F.round(F.col("_a_mean") - F.col("_b_mean"), 6).alias("mean_delta"),
    )


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    id_col: str = "doc_id",
    hash_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level dataset diff — the data-version-control primitive
    (what a Delta/lakeFS-style diff shows between two corpus
    snapshots): every id classified ``added`` / ``removed`` /
    ``changed`` / ``unchanged``.

    ``changed`` is decided by a portable md5 content hash over
    ``hash_cols`` (default: every shared non-id column, in column-name
    order).  Each column is digested INDEPENDENTLY first (null → the
    literal token ``null``, which can never collide with a 32-char hex
    digest, and [0-9a-f]-only digests can never contain it) and the row
    hash is the md5 of the fixed-width digest concatenation — so no
    separator-in-value or sentinel-in-value string can make two
    different rows hash equal (ADVICE r8).  One full-outer join keyed
    on the id — both sides shuffle once on the key and only (id,
    16-byte hash) cross the exchange, never the payload, so a
    100 TB-vs-100 TB diff moves ids and hashes only.

    Returns ``(id, status, hash_before, hash_after)``; aggregate for
    the summary, filter for the change-feed.
    """
    if hash_cols is None:
        shared = [c for c in before.columns if c in set(after.columns) and c != id_col]
        hash_cols = sorted(shared)
    if not hash_cols:
        raise ValueError("snapshot_diff needs at least one hash column")

    def content_hash(df: DataFrame) -> DataFrame:
        tokens = [
            F.when(F.col(c).isNull(), F.lit("null")).otherwise(
                F.md5(F.col(c).cast("string"))
            )
            for c in hash_cols
        ]
        h = F.md5(F.concat(*tokens))
        return df.select(F.col(id_col), h.alias("_h"))

    b = content_hash(before).withColumnRenamed("_h", "hash_before")
    a = content_hash(after).withColumnRenamed("_h", "hash_after")
    joined = b.join(a, id_col, "full_outer")
    status = (
        F.when(F.col("hash_before").isNull(), F.lit("added"))
        .when(F.col("hash_after").isNull(), F.lit("removed"))
        .when(F.col("hash_before") != F.col("hash_after"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(id_col, status.alias("status"), "hash_before", "hash_after")


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    group_col: str | None = None,
    n_buckets: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — THE industry drift metric for deployment gates (PSI < 0.1
    stable / 0.1-0.25 drifting / > 0.25 retrain):
    ``psi = sum_b (p_b - q_b) * ln(p_b / q_b)`` over n equal-width
    buckets, Laplace-smoothed so empty buckets stay finite.

    Determinism contract: values quantize to integers
    (``floor(v * scale + 0.5)``), bucket boundaries derive from the
    BASE snapshot's integer min/max (current clamps into range — new
    out-of-range mass lands in the edge buckets, which is exactly the
    drift signal), and each bucket's PSI term quantizes to integer
    micro-units BEFORE the sum, so the result is an int64 both engines
    reproduce bit-for-bit.

    The group spine is base UNION current group keys: a group present
    only in ``current`` (a brand-new population segment — the strongest
    drift signal a deployment gate exists to catch) is reported with
    smoothed-only base mass (``n_base = 0``, every base bucket at the
    Laplace floor) rather than silently dropped; its bounds fall back
    to the current snapshot's own min/max.

    Shape at 100 TB: two scans reduced by map-side-partial groupBys to
    (group, bucket) counts — at most groups x n_buckets rows anywhere
    downstream."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    q = F.expr(f"CAST(floor({value_col} * {scale} + 0.5) AS BIGINT)")
    keys = [group_col] if group_col else []

    base_bounds = base.select(q.alias("_v"), *keys).groupBy(*keys).agg(
        F.min("_v").alias("_blo"), F.max("_v").alias("_bhi")
    )
    if keys:
        cur_bounds = current.select(q.alias("_v"), *keys).groupBy(*keys).agg(
            F.min("_v").alias("_clo"), F.max("_v").alias("_chi")
        )
        bounds = base_bounds.join(cur_bounds, keys, "full_outer").select(
            *keys,
            F.coalesce("_blo", "_clo").alias("_lo"),
            F.coalesce("_bhi", "_chi").alias("_hi"),
        )
    else:
        bounds = base_bounds.select(
            F.col("_blo").alias("_lo"), F.col("_bhi").alias("_hi")
        )

    def bucketed(df: DataFrame, cnt_name: str) -> DataFrame:
        staged = df.select(q.alias("_v"), *keys)
        j = staged.join(F.broadcast(bounds), keys) if keys else staged.crossJoin(
            F.broadcast(bounds)
        )
        clamped = F.greatest(F.least(F.col("_v"), F.col("_hi")), F.col("_lo"))
        b = F.expr(
            f"CAST(((_vc - _lo) * {n_buckets}) div (_hi - _lo + 1) AS INT)"
        )
        return (
            j.withColumn("_vc", clamped)
            .withColumn("_b", b)
            .groupBy(*(keys + ["_b"]))
            .agg(F.count(F.lit(1)).alias(cnt_name))
        )

    p = bucketed(base, "_cb")
    c = bucketed(current, "_cc")
    # dense bucket spine so empty buckets contribute their smoothed term
    spine_keys = bounds.select(*keys) if keys else bounds.select()
    spine = spine_keys.crossJoin(
        base.sparkSession.range(n_buckets).select(F.col("id").cast("int").alias("_b"))
    )
    joink = keys + ["_b"]
    counts = (
        spine.join(p, joink, "left")
        .join(c, joink, "left")
        .fillna(0, subset=["_cb", "_cc"])
    )
    tot = counts.groupBy(*keys).agg(
        F.sum("_cb").alias("_nb"), F.sum("_cc").alias("_nc")
    )
    j = counts.join(F.broadcast(tot), keys) if keys else counts.crossJoin(
        F.broadcast(tot)
    )
    term = F.expr(
        f"CAST(floor((CAST(_cb + 1 AS DOUBLE) / CAST(_nb + {n_buckets} AS DOUBLE)"
        f" - CAST(_cc + 1 AS DOUBLE) / CAST(_nc + {n_buckets} AS DOUBLE))"
        f" * ln((CAST(_cb + 1 AS DOUBLE) / CAST(_nb + {n_buckets} AS DOUBLE))"
        f" / (CAST(_cc + 1 AS DOUBLE) / CAST(_nc + {n_buckets} AS DOUBLE)))"
        f" * 1000000.0 + 0.5) AS BIGINT)"
    )
    out = j.withColumn("_t", term).groupBy(*keys).agg(
        F.sum("_t").alias("psi_micro"),
        F.max("_nb").alias("n_base"),
        F.max("_nc").alias("n_current"),
    )
    return out
