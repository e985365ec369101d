"""Layout operators: compaction file counts, and sorted writes
producing disjoint per-file min/max ranges (verified from the parquet
footers) that selective scans can prune on."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
    compact,
    input_size_bytes,
    sorted_write,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_input_size_positive(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert input_size_bytes(li) > 10_000


def test_compact_reduces_file_count(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    frag = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(frag)  # simulate small-files problem
    assert len(glob.glob(f"{frag}/part-*")) == 64
    out = str(tmp_path / "compacted")
    compact(spark.read.parquet(frag), target_mb=128).write.parquet(out)
    n_after = len(glob.glob(f"{out}/part-*"))
    assert n_after < 8  # ~300KB of data -> one ~target file (plus slack)
    assert spark.read.parquet(out).count() == li.count()


def test_sorted_write_disjoint_ranges_and_pruning(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = str(tmp_path / "sorted")
    sorted_write(orders, out, ["o_custkey"], num_files=8)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) == 8
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_custkey"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {hi1} > {lo2}"

    # the sorted copy answers a selective filter identically
    key = orders.select(F.min("o_custkey")).first()[0]
    a = spark.read.parquet(out).filter(F.col("o_custkey") == key).count()
    b = orders.filter(F.col("o_custkey") == key).count()
    assert a == b > 0
