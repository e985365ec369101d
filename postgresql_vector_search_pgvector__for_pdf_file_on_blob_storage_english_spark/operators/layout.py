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
"""

from __future__ import annotations

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
