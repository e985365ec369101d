"""Two-pass global rank (operators/ranking.py): exact parity with the
single-partition window it replaces, plan free of unpartitioned ordered
windows, and the integer ntile reconstruction vs Spark's own ntile."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
    global_rank,
    ntile_from_rank,
)


@pytest.fixture(scope="module")
def people(spark):
    # values with ties (tiebreak on id), enough rows to span partitions
    rows = [(i, float((i * 37) % 50)) for i in range(1, 501)]
    return spark.createDataFrame(rows, "id int, v double")


class TestGlobalRank:
    def test_rank_matches_single_partition_reference(self, people):
        sort = [F.col("v").desc(), F.col("id").asc()]
        got = {
            r["id"]: r["_rank"]
            for r in global_rank(people, sort, npart=7).collect()
        }
        ref = {
            r["id"]: r["rk"]
            for r in people.withColumn(
                "rk", F.row_number().over(Window.orderBy(*sort))
            ).collect()
        }
        assert got == ref

    def test_n_and_rank_are_a_permutation(self, people):
        out = global_rank(people, [F.col("id").asc()], npart=5).collect()
        assert all(r["_n"] == 500 for r in out)
        assert sorted(r["_rank"] for r in out) == list(range(1, 501))

    def test_exclusive_prefix_sum(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30), (4, 40)], "id int, c long"
        )
        out = {
            r["id"]: r["_before"]
            for r in global_rank(
                df, [F.col("c").desc(), F.col("id").asc()], npart=3, prefix_col="c"
            ).collect()
        }
        # rank order: 40, 30, 20, 10 -> exclusive prefixes 0, 40, 70, 90
        assert out == {4: 0, 3: 40, 2: 70, 1: 90}

    def test_single_row_and_empty(self, spark):
        one = spark.createDataFrame([(1, 5)], "id int, c long")
        r = global_rank(one, [F.col("c").asc()], npart=4, prefix_col="c").collect()
        assert len(r) == 1 and r[0]["_rank"] == 1 and r[0]["_before"] == 0
        empty = one.filter("id < 0")
        assert global_rank(empty, [F.col("c").asc()], npart=4).count() == 0

    def test_no_unpartitioned_ordered_window_in_plan(self, people):
        df = global_rank(
            people, [F.col("v").desc(), F.col("id").asc()], npart=7, prefix_col="v"
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            line = line.strip().lstrip("+-: ")
            if line.startswith("Window "):
                # partitioned windows print 3 bracket groups; a global
                # ordered window prints 2 with ASC/DESC in the last
                assert line.count("], [") >= 2, line


class TestNtileFromRank:
    @pytest.mark.parametrize("n,tiles", [(10, 3), (9, 3), (2, 3), (500, 4), (7, 7)])
    def test_matches_spark_ntile(self, spark, n, tiles):
        df = spark.range(1, n + 1).withColumnRenamed("id", "k")
        ref = df.withColumn(
            "t", F.ntile(tiles).over(Window.orderBy("k"))
        )
        got = ref.withColumn(
            "t2", ntile_from_rank(F.col("k"), F.lit(n).cast("long"), tiles)
        )
        bad = got.filter(F.col("t") != F.col("t2")).count()
        assert bad == 0


class TestKthSmallestHistogram:
    def test_matches_sorted_reference(self, spark):
        import random

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            kth_smallest_histogram,
        )

        rng = random.Random(5)
        vals = [rng.randrange(-10_000, 10_000_000) for _ in range(5000)]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        s = sorted(vals)
        for k in (1, 2, 2500, 4999, 5000):
            assert kth_smallest_histogram(df, "v", k, fanout=16) == s[k - 1]

    def test_duplicates_and_tiny_ranges(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            kth_smallest_histogram,
        )

        df = spark.createDataFrame([(7,)] * 10 + [(3,)] * 5, "v long")
        assert kth_smallest_histogram(df, "v", 5) == 3
        assert kth_smallest_histogram(df, "v", 6) == 7

    def test_full_long_domain_exact(self, spark):
        """ADVICE r8: bucketing must be exact over the FULL int64 domain —
        double division misrounds past 2^53 and a raw int64 ``c - lo``
        overflows at opposite extremes; the DECIMAL(20,0) integral
        division handles both."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            kth_smallest_histogram,
        )

        lo, hi = -(2**63), 2**63 - 1
        # adjacent values past 2^53 (indistinguishable in double) plus
        # the domain extremes (int64-overflowing difference)
        vals = [lo, lo + 1, -(2**53) - 1, -(2**53), 0,
                2**53, 2**53 + 1, hi - 1, hi]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        s = sorted(vals)
        # default fanout=256 / max_levels=8: the log_256 claim on a
        # full-width domain only holds with exact bucket arithmetic
        for k in (1, 2, 3, 4, 5, 6, 7, 8, 9):
            assert kth_smallest_histogram(df, "v", k) == s[k - 1]

    def test_guards(self, spark):
        import pytest as _pt

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            kth_smallest_histogram,
        )

        df = spark.createDataFrame([(1,), (2,)], "v long")
        with _pt.raises(ValueError, match="k must be"):
            kth_smallest_histogram(df, "v", 0)
        with _pt.raises(ValueError, match="exceeds"):
            kth_smallest_histogram(df, "v", 3)

    def test_nulls_carry_no_rank(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            kth_smallest_histogram,
        )

        df = spark.createDataFrame([(5,), (None,), (1,), (None,), (9,)], "v long")
        assert kth_smallest_histogram(df, "v", 3) == 9
        import pytest as _pt

        with _pt.raises(ValueError, match="exceeds"):
            kth_smallest_histogram(df, "v", 4)


class TestWinsorize:
    """Exact per-group winsorization (operators/ranking.py::winsorize, r10)."""

    def _py_cutoffs(self, vals, lo_ppm, hi_ppm):
        s = sorted(vals)
        n = len(s)
        k_lo = -(-(n * lo_ppm) // 1_000_000)  # ceil
        k_hi = -(-(n * hi_ppm) // 1_000_000)
        return s[max(k_lo, 1) - 1], s[max(k_hi, 1) - 1]

    def test_matches_percentile_disc_reference(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            winsorize,
        )

        vals = [float(v) for v in (1, 2, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        out = winsorize(df, "x", lo_ppm=100_000, hi_ppm=900_000, scale=1).collect()
        qlo, qhi = self._py_cutoffs([round(v) for v in vals], 100_000, 900_000)
        got = sorted(r["x_wins"] for r in out)
        want = sorted(min(max(round(v), qlo), qhi) for v in vals)
        assert got == want

    def test_grouped_cutoffs_independent(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            winsorize,
        )

        rows = [("a", float(i)) for i in range(1, 101)] + [
            ("b", float(1000 + i)) for i in range(1, 11)
        ]
        df = spark.createDataFrame(rows, "g string, x double")
        out = winsorize(df, "x", group_col="g", lo_ppm=50_000,
                        hi_ppm=950_000, scale=1).collect()
        for g, n in (("a", 100), ("b", 10)):
            vals = sorted(r["x_wins"] for r in out if r["g"] == g)
            src = [i for i in range(1, n + 1)] if g == "a" else [
                1000 + i for i in range(1, 11)]
            qlo, qhi = self._py_cutoffs(src, 50_000, 950_000)
            assert vals == sorted(min(max(v, qlo), qhi) for v in src)

    def test_full_range_is_identity_on_quantized(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            winsorize,
        )

        df = spark.createDataFrame(
            [(float(v),) for v in (3, 1, 4, 1, 5)], "x double"
        )
        out = sorted(r["x_wins"] for r in
                     winsorize(df, "x", lo_ppm=0, hi_ppm=1_000_000, scale=1).collect())
        assert out == [1, 1, 3, 4, 5]

    def test_partitioning_invariant(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            winsorize,
        )

        rows = [(float((i * 37) % 251),) for i in range(400)]
        df = spark.createDataFrame(rows, "x double")
        vals = {
            tuple(sorted(r["x_wins"] for r in
                         winsorize(df.repartition(p), "x", scale=1).collect()))
            for p in (1, 8, 32)
        }
        assert len(vals) == 1

    def test_rejects_bad_ppm(self, spark):
        import pytest as _pt

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ranking import (
            winsorize,
        )

        df = spark.createDataFrame([(1.0,)], "x double")
        with _pt.raises(ValueError, match="ppm"):
            winsorize(df, "x", lo_ppm=900_000, hi_ppm=100_000)


class TestMultiPrefix:
    def test_list_prefix_matches_single_calls(self, spark):
        # r11: the KS shape — two running sums from ONE range exchange
        rows = [(i, (i * 7) % 13, (i * 11) % 5, (i * 3) % 4) for i in range(1, 101)]
        df = spark.createDataFrame(rows, "id int, v long, a long, b long")
        sort = [F.col("v").asc(), F.col("id").asc()]
        multi = {
            r["id"]: (r["_before_a"], r["_before_b"])
            for r in global_rank(df, sort, npart=6, prefix_col=["a", "b"]).collect()
        }
        ref_a = {
            r["id"]: r["_before"]
            for r in global_rank(df, sort, npart=6, prefix_col="a").collect()
        }
        ref_b = {
            r["id"]: r["_before"]
            for r in global_rank(df, sort, npart=6, prefix_col="b").collect()
        }
        assert multi == {i: (ref_a[i], ref_b[i]) for i in ref_a}

    def test_many_prefix_cols_no_alias_collision(self, spark):
        # 13+ prefix columns: the r11 alias fix ("_s1" + "2" used to
        # collide with "_s12") — Kendall's per-x-bucket pivot needs this
        n_cols = 14
        rows = [
            tuple([i] + [(i * (j + 3)) % 7 for j in range(n_cols)])
            for i in range(1, 41)
        ]
        schema = "id int, " + ", ".join(f"c{j} long" for j in range(n_cols))
        df = spark.createDataFrame(rows, schema)
        cols = [f"c{j}" for j in range(n_cols)]
        out = global_rank(df, [F.col("id").asc()], npart=4, prefix_col=cols)
        got = {r["id"]: [r[f"_before_{c}"] for c in cols] for r in out.collect()}
        # exclusive prefix of each column in id order, computed in python
        run = [0] * n_cols
        for i in range(1, 41):
            assert got[i] == run
            for j in range(n_cols):
                run[j] += (i * (j + 3)) % 7


class TestPrefixMax:
    def test_exclusive_prefix_max_matches_window(self, spark):
        # r11: prefix_op="max" — the 2D-skyline sweep primitive
        rows = [(i, (i * 37) % 50, (i * 13) % 23) for i in range(1, 201)]
        df = spark.createDataFrame(rows, "id int, v long, m long")
        sort = [F.col("v").desc(), F.col("id").asc()]
        got = {
            r["id"]: r["_before"]
            for r in global_rank(
                df, sort, npart=7, prefix_col="m", prefix_op="max"
            ).collect()
        }
        wp = Window.orderBy(*sort).rowsBetween(Window.unboundedPreceding, -1)
        ref = {
            r["id"]: r["ref"]
            for r in df.withColumn("ref", F.max("m").over(wp)).collect()
        }
        assert got == ref
        # the first row in sort order has an empty prefix -> NULL
        assert None in got.values()

    def test_rejects_unknown_op(self, spark):
        df = spark.createDataFrame([(1, 2)], "id int, c long")
        with pytest.raises(ValueError):
            global_rank(df, [F.col("id")], prefix_col="c", prefix_op="min")
