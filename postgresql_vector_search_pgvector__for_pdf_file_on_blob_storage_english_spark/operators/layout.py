"""Data-layout operators: compaction and sort-clustered writes.

At 100 TB the file layout is a first-class query-performance input:

* ``compact`` — small-files compaction.  Streaming ingest and
  fine-grained partitioning leave thousands of KB-scale files; scans
  pay per-file open/footer costs and lose vectorized-read efficiency.
  Repartition to ~``target_mb`` output files using the real input
  size (from the files' own metadata, not a guess).
* ``sorted_write`` — range-partition + sort-within-partitions on the
  clustering columns before writing.  Parquet stores per-row-group
  min/max; a sorted layout makes those ranges disjoint, so selective
  filters skip whole files/row groups (the poor man's Z-order — exact
  for 1-D clustering keys, still effective for a leading composite).
* ``bucketed_write`` / ``cobucketed_join`` — hash-bucketed persisted
  layout: both sides of a recurring equi-join are written
  ``bucketBy(n, key)`` into catalog tables, so the join key's hash
  partitioning is baked into the FILES.  Reading them back, Catalyst
  sees matching output partitionings on both sides and plans the join
  with ZERO Exchange — the shuffle that dominates a 100 TB fact-fact
  join is paid once at write time and amortized over every subsequent
  join.  With one file per bucket (``bucketed_write`` repartitions on
  the key first) the ``sortBy`` metadata also satisfies the SMJ's
  ordering requirement, eliminating the per-query Sort.
* ``zorder_write`` — true multi-column clustering: each clustering
  column is quantile-bucketed (approxQuantile boundaries, skew-robust
  unlike linear min/max scaling), the bucket ids are Morton
  bit-interleaved into one z-value, and the data is range-partitioned
  + sorted on z.  Every file then covers a small HYPERCUBE of the key
  space, so min/max skipping works for a selective predicate on ANY
  clustering column — the property a lexicographic sort only gives its
  leading column.  This is the layout Delta's OPTIMIZE ZORDER BY
  produces, built from plain DataFrame ops.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def input_size_bytes(df: DataFrame) -> int:
    """Total bytes of the scan inputs feeding this plan (file sources)."""
    # Catalyst exposes per-relation sizeInBytes; for a raw file scan it
    # is the sum of file lengths.
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def compact(df: DataFrame, target_mb: int = 128) -> DataFrame:
    """Repartition so each output file lands near ``target_mb``."""
    total = input_size_bytes(df)
    n = max(1, round(total / (target_mb * 1024 * 1024)))
    return df.repartition(n)


def sorted_write(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition on ``sort_cols`` (disjoint per-file key ranges)
    then sort within each partition (monotone row groups), then write.
    """
    parted = (
        df.repartitionByRange(num_files, *sort_cols)
        if num_files
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a hash-bucketed (and bucket-sorted) catalog
    table — the pay-the-shuffle-once layout for recurring equi-joins.

    The repartition on the bucket columns makes each write task own
    exactly the rows of the buckets it writes, so every bucket lands in
    ONE file.  That single-file-per-bucket property is what lets the
    scan report the ``sortBy`` ordering to the optimizer (multi-file
    buckets would need a merge), turning downstream sort-merge joins
    into exchange-free AND sort-free plans.
    """
    sort_cols = sort_cols or bucket_cols
    # Drop any prior registration AND its files: a stale warehouse dir
    # from a dead session (table absent from this session's in-memory
    # catalog) fails managed-table creation with LOCATION_ALREADY_EXISTS.
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if path is None:
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        path = os.path.join(warehouse.removeprefix("file:"), table.lower())
    shutil.rmtree(path, ignore_errors=True)
    (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .mode(mode)
        .format("parquet")
        .option("path", path)
        .saveAsTable(table)
    )


def cobucketed_join(
    spark, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    Both scans expose ``HashPartitioning(on, n)``, so the join requires
    no Exchange on either side (asserted from the executed plan in
    tests/test_layout.py).  At 100 TB this is the difference between
    shuffling two fact tables per query and a scan-local merge.

    The MERGE hint pins the sort-merge strategy: on small fixtures the
    planner would otherwise pick a broadcast join, and the bucketed
    scan is then "disabled by query planner" — at fact-fact scale SMJ
    is what it would choose anyway, so the hint makes the demonstrated
    plan the scale plan.
    """
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), on, how
    )


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed plan (plan-shape
    gate for the co-located-join property)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line
    )


def _bucket_col(col: str, boundaries: list[float], bits: int) -> F.Column:
    """Quantile-bucket ``col`` into [0, 2**bits): the bucket is how many
    of the ``2**bits - 1`` interior quantile boundaries lie at or below
    the value.  A literal-array ``filter`` — pure codegen, no join; the
    boundary list is driver-computed and tiny (255 doubles at bits=8)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= F.col(col).cast("double")))


def _morton2(x: F.Column, y: F.Column, bits: int) -> F.Column:
    """Interleave the low ``bits`` bits of two bucket ids: bit i of x
    lands at position 2i, bit i of y at 2i+1.  A fixed sum of
    shift/mask terms — whole-stage-codegen arithmetic, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered write on exactly two numeric columns.

    1. approxQuantile each column into ``2**bits`` equi-depth buckets
       (driver-side boundary list; skew-robust where linear min/max
       scaling collapses under heavy-tailed keys);
    2. Morton-interleave the bucket ids into a single z-value;
    3. range-partition + sort on z, write, drop the helper column.

    Scale shape: one quantile sketch pass (no shuffle beyond the
    aggregation), then exactly the ``sorted_write`` single range
    shuffle.  Each output file covers a compact square-ish region of
    the (colA, colB) space, so parquet min/max stats prune files for
    selective predicates on EITHER column (gated from real footers in
    tests/test_layout.py)."""
    if len(cols) != 2:
        raise ValueError(f"zorder_write clusters exactly 2 columns, got {len(cols)}")
    n_bounds = 2**bits - 1
    probs = [(i + 1) / (n_bounds + 1) for i in range(n_bounds)]
    cast_df = df.select(
        *df.columns, *[F.col(c).cast("double").alias(f"__zq_{c}") for c in cols]
    )
    bounds = {
        c: cast_df.stat.approxQuantile(f"__zq_{c}", probs, 0.001) for c in cols
    }
    zed = df.withColumn(
        "__z",
        _morton2(
            _bucket_col(cols[0], bounds[cols[0]], bits),
            _bucket_col(cols[1], bounds[cols[1]], bits),
            bits,
        ),
    )
    (
        zed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def hilbert2_frame(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int,
    out: str = "__h",
) -> DataFrame:
    """Append the Hilbert-curve index of integer grid coords
    ``(x_col, y_col)`` in ``[0, 2**bits)`` as column ``out``.

    The standard xy→d walk (Hilbert 1891; the iterative bit form is
    the classic public-domain formulation): at each scale ``s = 2**i``
    the quadrant bit pair ``(rx, ry)`` contributes ``s*s*((3*rx)^ry)``
    to ``d``, then the frame is rotated/reflected so the sub-square's
    curve orientation lines up.  Unlike Morton interleave
    (:func:`_morton2`), CONSECUTIVE Hilbert indexes are always
    grid-adjacent — no 2^k "seam jumps" — so range-partitioning on
    ``d`` gives each output file a tighter bounding box over the key
    space (better min/max skipping for the same file count).

    Built as ``bits`` chained simultaneous projections (``withColumns``
    reads all three carried columns from the SAME input row), each a
    few codegen bit-ops — no UDF, no shuffle, and no expression-tree
    blowup from nesting the rotation into one Column.
    """
    X, Y = "__hil_x", "__hil_y"
    stage = df.withColumns(
        {
            X: F.col(x_col).cast("long"),
            Y: F.col(y_col).cast("long"),
            out: F.lit(0).cast("long"),
        }
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col(X), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col(Y), i).bitwiseAND(F.lit(1))
        stage = stage.withColumns(
            {
                out: F.col(out)
                + F.lit(s * s).cast("long") * (rx * F.lit(3)).bitwiseXOR(ry),
                # ry==1: frame unchanged; ry==0 & rx==1: reflect both then
                # swap; ry==0 & rx==0: plain swap.
                X: F.when(ry == F.lit(1), F.col(X))
                .when(rx == F.lit(1), F.lit(s - 1) - F.col(Y))
                .otherwise(F.col(Y)),
                Y: F.when(ry == F.lit(1), F.col(Y))
                .when(rx == F.lit(1), F.lit(s - 1) - F.col(X))
                .otherwise(F.col(X)),
            }
        )
    return stage.drop(X, Y)


def hilbert_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Hilbert-clustered write on exactly two numeric columns —
    :func:`zorder_write` with the Morton interleave swapped for the
    Hilbert index.  Same scale shape (one quantile-sketch pass, one
    range shuffle); strictly better worst-case locality: a Morton
    curve jumps across the whole key space at power-of-two seams, so
    the files straddling a seam get a bounding box covering most of
    one axis, while every Hilbert step is grid-adjacent and each
    file's box stays compact (gated from real footers in
    tests/test_layout.py::TestHilbert)."""
    if len(cols) != 2:
        raise ValueError(f"hilbert_write clusters exactly 2 columns, got {len(cols)}")
    n_bounds = 2**bits - 1
    probs = [(i + 1) / (n_bounds + 1) for i in range(n_bounds)]
    cast_df = df.select(
        *df.columns, *[F.col(c).cast("double").alias(f"__hq_{c}") for c in cols]
    )
    bounds = {
        c: cast_df.stat.approxQuantile(f"__hq_{c}", probs, 0.001) for c in cols
    }
    bucketed = df.withColumns(
        {
            "__bx": _bucket_col(cols[0], bounds[cols[0]], bits).cast("long"),
            "__by": _bucket_col(cols[1], bounds[cols[1]], bits).cast("long"),
        }
    )
    hed = hilbert2_frame(bucketed, "__bx", "__by", bits, out="__h").drop(
        "__bx", "__by"
    )
    (
        hed.repartitionByRange(num_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode(mode)
        .parquet(path)
    )
