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


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    """(min, max) of ``col`` per parquet file, from the real footers."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


class TestZorder:
    def test_both_columns_skippable(self, spark, tmp_path):
        """The Z-order property: per-file min/max ranges are narrow on
        BOTH clustering columns, where a lexicographic sort localizes
        only its leading column.  Measured as the fraction of files a
        point-predicate scan can skip, straight from the footers."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            zorder_write,
        )

        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        zpath = str(tmp_path / "zordered")
        spath = str(tmp_path / "lexsorted")
        cols = ["l_partkey", "l_suppkey"]
        zorder_write(li, zpath, cols, bits=8, num_files=16)
        sorted_write(li, spath, cols, num_files=16)

        def skip_fraction(path, col, probes):
            ranges = _file_ranges(path, col)
            skipped = sum(
                sum(1 for lo, hi in ranges if probe < lo or probe > hi)
                for probe in probes
            )
            return skipped / (len(probes) * len(ranges))

        lo_p, hi_p = li.select(F.min("l_partkey"), F.max("l_partkey")).first()
        lo_s, hi_s = li.select(F.min("l_suppkey"), F.max("l_suppkey")).first()
        probes_p = [lo_p + (hi_p - lo_p) * i // 8 for i in range(1, 8)]
        probes_s = [lo_s + (hi_s - lo_s) * i // 8 for i in range(1, 8)]

        # Leading column: both layouts skip well.
        assert skip_fraction(zpath, "l_partkey", probes_p) >= 0.5
        assert skip_fraction(spath, "l_partkey", probes_p) >= 0.75
        # Second column: z-order keeps skipping, lex sort cannot.
        z_second = skip_fraction(zpath, "l_suppkey", probes_s)
        lex_second = skip_fraction(spath, "l_suppkey", probes_s)
        assert z_second >= 0.5, f"z-order second-column skip {z_second}"
        assert lex_second <= 0.1, f"lex sort unexpectedly skips {lex_second}"

    def test_roundtrip_and_schema(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            zorder_write,
        )

        orders = spark.read.parquet(f"{SF}/orders.parquet")
        out = str(tmp_path / "z2")
        zorder_write(orders, out, ["o_custkey", "o_totalprice"], num_files=4)
        back = spark.read.parquet(out)
        assert back.columns == orders.columns  # helper column dropped
        assert back.count() == orders.count()
        key = orders.select(F.min("o_custkey")).first()[0]
        assert (
            back.filter(F.col("o_custkey") == key).count()
            == orders.filter(F.col("o_custkey") == key).count()
            > 0
        )

    def test_two_columns_required(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            zorder_write,
        )

        orders = spark.read.parquet(f"{SF}/orders.parquet")
        with pytest.raises(ValueError):
            zorder_write(orders, str(tmp_path / "z3"), ["o_custkey"])


class TestBucketedJoin:
    """Co-bucketed catalog tables: the equi-join must plan with ZERO
    Exchange (the shuffle is paid once at write), and one file per
    bucket so the sortBy metadata holds."""

    def _tables(self, spark, tmp_path_factory):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            bucketed_write,
        )

        ot, lt = "t_bkt_orders", "t_bkt_lineitem"
        orders = spark.read.parquet(f"{SF}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        bucketed_write(orders, ot, ["o_orderkey"], 4)
        bucketed_write(li, lt, ["o_orderkey"], 4)
        return ot, lt

    def test_join_has_zero_exchange_and_matches_plain_join(
        self, spark, tmp_path_factory
    ):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            cobucketed_join,
            n_exchanges,
        )

        ot, lt = self._tables(spark, tmp_path_factory)
        j = cobucketed_join(spark, ot, lt, ["o_orderkey"])
        assert n_exchanges(j) == 0, j._jdf.queryExecution().executedPlan().toString()

        plain = spark.read.parquet(f"{SF}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        ).join(
            spark.read.parquet(f"{SF}/lineitem.parquet").select(
                F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
            ),
            "o_orderkey",
        )
        got = sorted(map(tuple, j.collect()))
        want = sorted(map(tuple, plain.collect()))
        assert got == want and len(got) > 0

    def test_one_file_per_bucket(self, spark, tmp_path_factory):
        import glob
        import os

        ot, _ = self._tables(spark, tmp_path_factory)
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {ot}")
            .filter(F.col("col_name") == "Location")
            .first()[1]
        )
        files = glob.glob(os.path.join(loc.replace("file:", ""), "*.parquet"))
        assert len(files) == 4, files

    def test_aggregate_after_join_single_exchange(self, spark, tmp_path_factory):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            cobucketed_join,
            n_exchanges,
        )

        ot, lt = self._tables(spark, tmp_path_factory)
        agg = (
            cobucketed_join(spark, ot, lt, ["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        # only the post-join groupBy may shuffle
        assert n_exchanges(agg) <= 1


def _xy2d_ref(bits: int, x: int, y: int) -> int:
    """Reference Hilbert xy->d (the classic iterative bit form)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


class TestHilbert:
    def test_full_grid_parity_and_bijectivity(self, spark):
        """hilbert2_frame == the python reference on the ENTIRE 16x16
        grid, and the mapping is a bijection onto [0, 256)."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            hilbert2_frame,
        )

        bits = 4
        n = 1 << bits
        df = spark.createDataFrame(
            [(x, y) for x in range(n) for y in range(n)], "x long, y long"
        )
        got = {
            (r["x"], r["y"]): r["__h"]
            for r in hilbert2_frame(df, "x", "y", bits).collect()
        }
        assert all(got[k] == _xy2d_ref(bits, *k) for k in got)
        assert sorted(got.values()) == list(range(n * n))

    def test_consecutive_indexes_are_grid_adjacent(self, spark):
        """The locality property Morton lacks: every +1 step of the
        Hilbert index moves exactly one grid cell, while the Morton
        order jumps across the key space at power-of-two seams."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            _morton2,
            hilbert2_frame,
        )
        from pyspark.sql import functions as F2

        bits = 4
        n = 1 << bits
        df = spark.createDataFrame(
            [(x, y) for x in range(n) for y in range(n)], "x long, y long"
        )
        by_h = {
            r["__h"]: (r["x"], r["y"])
            for r in hilbert2_frame(df, "x", "y", bits).collect()
        }
        h_steps = [
            abs(by_h[d][0] - by_h[d + 1][0]) + abs(by_h[d][1] - by_h[d + 1][1])
            for d in range(n * n - 1)
        ]
        assert max(h_steps) == 1

        by_z = {
            r["z"]: (r["x"], r["y"])
            for r in df.withColumn(
                "z", _morton2(F2.col("x"), F2.col("y"), bits)
            ).collect()
        }
        z_steps = [
            abs(by_z[d][0] - by_z[d + 1][0]) + abs(by_z[d][1] - by_z[d + 1][1])
            for d in range(n * n - 1)
        ]
        assert max(z_steps) > 1  # the Morton seam jump Hilbert removes

    def test_write_both_columns_skippable(self, spark, tmp_path):
        """Same footer-measured gate as TestZorder: per-file min/max
        boxes stay narrow on BOTH clustering columns."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            hilbert_write,
        )

        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        hpath = str(tmp_path / "hilberted")
        cols = ["l_partkey", "l_suppkey"]
        hilbert_write(li, hpath, cols, bits=8, num_files=16)

        def skip_fraction(path, col, probes):
            ranges = _file_ranges(path, col)
            skipped = sum(
                sum(1 for lo, hi in ranges if probe < lo or probe > hi)
                for probe in probes
            )
            return skipped / (len(probes) * len(ranges))

        lo_p, hi_p = li.select(F.min("l_partkey"), F.max("l_partkey")).first()
        lo_s, hi_s = li.select(F.min("l_suppkey"), F.max("l_suppkey")).first()
        probes_p = [lo_p + (hi_p - lo_p) * i // 8 for i in range(1, 8)]
        probes_s = [lo_s + (hi_s - lo_s) * i // 8 for i in range(1, 8)]
        assert skip_fraction(hpath, "l_partkey", probes_p) >= 0.5
        assert skip_fraction(hpath, "l_suppkey", probes_s) >= 0.5

    def test_roundtrip_and_schema(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            hilbert_write,
        )

        orders = spark.read.parquet(f"{SF}/orders.parquet")
        out = str(tmp_path / "h2")
        hilbert_write(orders, out, ["o_custkey", "o_totalprice"], num_files=4)
        back = spark.read.parquet(out)
        assert back.columns == orders.columns
        assert back.count() == orders.count()
        key = orders.select(F.min("o_custkey")).first()[0]
        assert (
            back.filter(F.col("o_custkey") == key).count()
            == orders.filter(F.col("o_custkey") == key).count()
            > 0
        )

    def test_two_columns_required(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.layout import (
            hilbert_write,
        )

        orders = spark.read.parquet(f"{SF}/orders.parquet")
        with pytest.raises(ValueError):
            hilbert_write(orders, str(tmp_path / "h3"), ["o_custkey"])


class TestDynamicPartitionPruning:
    """Runtime partition pruning: a date-partitioned fact joined to a
    selectively-filtered dim must plan a ``dynamicpruningexpression``
    in the fact scan's PartitionFilters — at 100 TB this is the
    difference between scanning a week and scanning the table.  (The
    STATIC twin — literal `isin` PartitionFilters on persisted
    ANN/BM25 indexes — is gated in test_ivf_index/test_bm25_index;
    this covers the runtime-subquery form Catalyst inserts itself.)"""

    def test_dpp_fires_and_values_match(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            _events,
        )

        ev = _events(spark, SF)
        fact = ev.withColumn("event_date", F.to_date("ts"))
        fact.write.partitionBy("event_date").parquet(str(tmp_path / "fact"))
        dim = (
            fact.select("event_date")
            .distinct()
            .withColumn("wk", F.weekofyear("event_date"))
        )
        dim.write.parquet(str(tmp_path / "dim"))

        f2 = spark.read.parquet(str(tmp_path / "fact"))
        d2 = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("wk") == 2)
        j = f2.join(d2, "event_date").groupBy("event_date").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruningexpression" in plan.lower(), plan[:2000]

        # pruning is a scan optimization, never a semantics change
        got = {(str(r["event_date"]), r["count"]) for r in j.collect()}
        want = {
            (str(r["event_date"]), r["count"])
            for r in fact.withColumn("wk", F.weekofyear("event_date"))
            .filter(F.col("wk") == 2)
            .groupBy("event_date")
            .count()
            .collect()
        }
        assert got == want and len(got) > 0
