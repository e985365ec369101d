"""Count-min sketch: never underestimates, exact at generous width,
merge-by-addition property, determinism, and argument guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
    countmin_build,
    countmin_estimate,
)


@pytest.fixture(scope="module")
def tokens(spark):
    # zipf-ish: term t_i appears (60 - i) times
    rows = [(f"t{i}",) for i in range(50) for _ in range(60 - i)]
    return spark.createDataFrame(rows, "term string")


class TestCountMin:
    def test_never_underestimates_and_bounded(self, spark, tokens):
        sk = countmin_build(tokens, "term", depth=4, width=64)
        exact = {r["term"]: r["n"] for r in tokens.groupBy("term").agg(F.count("*").alias("n")).collect()}
        probes = spark.createDataFrame([(t,) for t in exact], "key string")
        est = {r["key"]: r["est"] for r in countmin_estimate(sk, probes, depth=4, width=64).collect()}
        n_total = sum(exact.values())
        for t, e in exact.items():
            assert est[t] >= e  # CMS overestimates, never under
            assert est[t] <= e + 2 * n_total / 64 * 4  # loose sanity bound

    def test_exact_at_generous_width(self, spark, tokens):
        # width >> distinct keys: collisions vanish, estimate == exact
        sk = countmin_build(tokens, "term", depth=4, width=4096)
        exact = {r["term"]: r["n"] for r in tokens.groupBy("term").agg(F.count("*").alias("n")).collect()}
        probes = spark.createDataFrame([(t,) for t in exact], "key string")
        est = {r["key"]: r["est"] for r in countmin_estimate(sk, probes, depth=4, width=4096).collect()}
        assert est == exact

    def test_absent_key_small_estimate(self, spark, tokens):
        sk = countmin_build(tokens, "term", depth=4, width=4096)
        probes = spark.createDataFrame([("never-seen",)], "key string")
        est = countmin_estimate(sk, probes, depth=4, width=4096).collect()[0]["est"]
        assert est == 0  # no collisions at this width

    def test_merge_is_cellwise_addition(self, spark, tokens):
        # sketch(A union B) == cell-wise sum of sketch(A) and sketch(B)
        a = tokens.filter(F.length("term") <= 2)   # t0..t9
        b = tokens.filter(F.length("term") > 2)    # t10..t49
        sa = countmin_build(a, "term", depth=3, width=32)
        sb = countmin_build(b, "term", depth=3, width=32)
        merged = (
            sa.union(sb).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
        )
        full = countmin_build(tokens, "term", depth=3, width=32)
        got = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
        want = {(r["row"], r["col"]): r["cnt"] for r in full.collect()}
        assert got == want

    def test_partitioning_invariant(self, spark, tokens):
        want = {(r["row"], r["col"]): r["cnt"] for r in countmin_build(tokens, "term", depth=2, width=16).collect()}
        got = {
            (r["row"], r["col"]): r["cnt"]
            for r in countmin_build(tokens.repartition(13), "term", depth=2, width=16).collect()
        }
        assert got == want

    def test_rejects_bad_args(self, tokens):
        with pytest.raises(ValueError):
            countmin_build(tokens, "term", depth=0)
        with pytest.raises(ValueError):
            countmin_build(tokens, "term", width=0)


class TestStreamingCountMin:
    def test_drained_log_equals_batch_sketch(self, spark, tokens, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sketch_stream import (
            countmin_compact,
            countmin_read,
            stream_into_countmin,
        )

        src = str(tmp_path / "src")
        tokens.filter(F.length("term") <= 2).coalesce(1).write.parquet(f"{src}/f0")
        tokens.filter(F.length("term") > 2).coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(tokens.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        log = str(tmp_path / "log")
        q = stream_into_countmin(
            stream, log, str(tmp_path / "ckpt"), "term", depth=3, width=32
        )
        q.awaitTermination(120)
        got = {(r["row"], r["col"]): r["cnt"] for r in countmin_read(spark, log).collect()}
        want = {
            (r["row"], r["col"]): r["cnt"]
            for r in countmin_build(tokens, "term", depth=3, width=32).collect()
        }
        assert got == want
        # compaction folds the log without changing the sketch
        dest = str(tmp_path / "compact")
        countmin_compact(spark, log, dest)
        compacted = {
            (r["row"], r["col"]): r["cnt"] for r in spark.read.parquet(dest).collect()
        }
        assert compacted == want
        import pytest as _pytest

        with _pytest.raises(ValueError):
            countmin_compact(spark, log, log)


class TestHyperLogLog:
    def test_accuracy_within_3_sigma(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            HLL_M,
            hll_estimate,
            hll_registers,
        )

        for n in (500, 5000, 20000):
            df = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
            est = hll_estimate(hll_registers(df, "k")).first()[0]
            sigma = 1.04 / (HLL_M ** 0.5)
            assert abs(est - n) / n < 3 * sigma, (n, est)

    def test_duplicates_do_not_move_registers(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_registers,
        )

        base = spark.range(200).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
        dup = base.union(base).union(base)
        a = {r["reg"]: r["m_rank"] for r in hll_registers(base, "k").collect()}
        b = {r["reg"]: r["m_rank"] for r in hll_registers(dup, "k").collect()}
        assert a == b

    def test_merge_is_elementwise_max(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_registers,
        )

        a = spark.range(0, 300).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
        b = spark.range(300, 700).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
        ra = hll_registers(a, "k").withColumnRenamed("m_rank", "ra")
        rb = hll_registers(b, "k").withColumnRenamed("m_rank", "rb")
        merged = {
            r["reg"]: max(r["ra"], r["rb"])
            for r in ra.join(rb, "reg").collect()
        }
        full = {
            r["reg"]: r["m_rank"]
            for r in hll_registers(a.union(b), "k").collect()
        }
        assert merged == full

    def test_partitioning_invariant(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_registers,
        )

        df = spark.range(1000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
        a = {r["reg"]: r["m_rank"] for r in hll_registers(df, "k").collect()}
        b = {r["reg"]: r["m_rank"] for r in hll_registers(df.repartition(17), "k").collect()}
        assert a == b


class TestStreamingHll:
    def test_drained_log_equals_batch_registers(self, spark, tokens, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_registers,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sketch_stream import (
            hll_compact,
            hll_read,
            stream_into_hll,
        )

        src = str(tmp_path / "src")
        tokens.filter(F.length("term") <= 2).coalesce(1).write.parquet(f"{src}/f0")
        tokens.filter(F.length("term") > 2).coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(tokens.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        log = str(tmp_path / "log")
        q = stream_into_hll(stream, log, str(tmp_path / "ckpt"), "term")
        q.awaitTermination(120)
        got = {r["reg"]: r["m_rank"] for r in hll_read(spark, log).collect()}
        want = {r["reg"]: r["m_rank"] for r in hll_registers(tokens, "term").collect()}
        assert got == want
        dest = str(tmp_path / "compact")
        hll_compact(spark, log, dest)
        compacted = {
            r["reg"]: r["m_rank"] for r in spark.read.parquet(dest).collect()
        }
        assert compacted == want
        with pytest.raises(ValueError):
            hll_compact(spark, log, log)


class TestQuantileSketch:
    """Base-2 quantile sketch (r7): bucket bit-math, relative-error
    bound vs exact, merge law, streaming replay dedup."""

    def _exact_quantile(self, values, q_bp):
        s = sorted(values)
        rank = (q_bp * len(s) + 9999) // 10000
        return s[max(rank - 1, 0)]

    def test_small_values_are_exact(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_build,
            qsketch_quantiles,
        )

        vals = [1, 2, 3, 5, 7, 11, 13, 15]  # all < 2^4
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        sk = qsketch_build(df, "x")
        got = {
            r["q_bp"]: r["quantile_lower"]
            for r in qsketch_quantiles(sk, [2500, 5000, 10000]).collect()
        }
        assert got == {
            q: self._exact_quantile(vals, q) for q in (2500, 5000, 10000)
        }

    def test_relative_error_bound(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_build,
            qsketch_quantiles,
        )

        # deterministic skewed values spanning several octaves
        vals = [((i * 2654435761) % 1_000_000) + 1 for i in range(5000)]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = qsketch_quantiles(
            qsketch_build(df, "x"), [1000, 2500, 5000, 7500, 9000, 9900]
        ).collect()
        for r in got:
            exact = self._exact_quantile(vals, r["q_bp"])
            est = r["quantile_lower"]
            # lower-bound estimate within 2^-4 relative error
            assert est <= exact
            assert exact <= est * (1 + 2 ** -4) + 1, (r["q_bp"], est, exact)

    def test_quantiles_monotone_and_extremes(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_bucket_col,
            qsketch_build,
            qsketch_lower_col,
            qsketch_quantiles,
        )
        from pyspark.sql import functions as F

        vals = [10 ** (i % 6) + i for i in range(200)]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        rows = sorted(
            qsketch_quantiles(
                qsketch_build(df, "x"), [100, 5000, 9999, 10000]
            ).collect(),
            key=lambda r: r["q_bp"],
        )
        qs = [r["quantile_lower"] for r in rows]
        assert qs == sorted(qs)
        assert rows[0]["n_values"] == len(vals)
        # bucket -> lower is the left inverse on representable values
        probe = df.select(
            "x",
            qsketch_lower_col(qsketch_bucket_col(F.col("x"))).alias("lo"),
        ).collect()
        for r in probe:
            assert r["lo"] <= r["x"] < r["lo"] + max(r["lo"] >> 4, 1) + 1

    def test_merge_law_is_addition(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_build,
        )
        from pyspark.sql import functions as F

        vals = [(i % 977) + 1 for i in range(3000)]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        whole = {
            r["bucket"]: r["cnt"] for r in qsketch_build(df, "x").collect()
        }
        a = qsketch_build(df.filter(F.col("x") % 2 == 0), "x")
        b = qsketch_build(df.filter(F.col("x") % 2 == 1), "x")
        merged = {}
        for r in a.unionByName(b).groupBy("bucket").agg(
            F.sum("cnt").alias("cnt")
        ).collect():
            merged[r["bucket"]] = r["cnt"]
        assert merged == whole

    def test_replayed_batch_does_not_double_count(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_build,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sketch_stream import (
            qsketch_read,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(v + 1,) for v in range(500)], "x long")
        path = str(tmp_path / "qs")
        mat = qsketch_build(df, "x").withColumn("batch_id", F.lit(0))
        mat.write.mode("append").parquet(path)
        once = {(r["bucket"]): r["cnt"] for r in qsketch_read(spark, path).collect()}
        mat.write.mode("append").parquet(path)  # the replay
        again = {(r["bucket"]): r["cnt"] for r in qsketch_read(spark, path).collect()}
        assert again == once

    def test_nonpositive_tracked_not_counted(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_build,
            qsketch_quantiles,
        )

        df = spark.createDataFrame(
            [(-5,), (0,), (1,), (2,), (3,), (4,)], "x long"
        )
        sk = qsketch_build(df, "x")
        assert {r["bucket"] for r in sk.collect()} >= {-1}
        rows = qsketch_quantiles(sk, [10000]).collect()
        assert rows[0]["n_values"] == 4  # positives only
        assert rows[0]["quantile_lower"] == 4


class TestHllSetAlgebra:
    """HLL merge + inclusion-exclusion set estimates (r7)."""

    def _regs(self, spark, lo, hi):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_registers,
        )

        df = spark.createDataFrame([(f"k{i}",) for i in range(lo, hi)], "k string")
        return hll_registers(df, "k")

    def test_merge_equals_union_stream(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_merge,
            hll_registers,
        )

        a = self._regs(spark, 0, 400)
        b = self._regs(spark, 200, 700)
        both = spark.createDataFrame(
            [(f"k{i}",) for i in list(range(0, 400)) + list(range(200, 700))],
            "k string",
        )
        merged = {r["reg"]: r["m_rank"] for r in hll_merge(a, b).collect()}
        direct = {
            r["reg"]: r["m_rank"] for r in hll_registers(both, "k").collect()
        }
        assert merged == direct

    def test_inclusion_exclusion_tracks_truth(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_set_estimates,
        )

        # |A|=400, |B|=500, |A ∩ B|=200
        a = self._regs(spark, 0, 400)
        b = self._regs(spark, 200, 700)
        r = hll_set_estimates(a, b).collect()[0]
        assert abs(r["est_a"] - 400) / 400 < 0.35
        assert abs(r["est_b"] - 500) / 500 < 0.35
        assert abs(r["est_union"] - 700) / 700 < 0.35
        # intersection inherits both errors; just demand the right order
        assert 0 < r["est_intersect"] < r["est_union"]
        assert r["est_intersect"] == r["est_a"] + r["est_b"] - r["est_union"]

    def test_disjoint_sets_intersect_near_zero(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_set_estimates,
        )

        a = self._regs(spark, 0, 300)
        b = self._regs(spark, 1000, 1300)
        r = hll_set_estimates(a, b).collect()[0]
        # inclusion-exclusion noise, but far below either set's size
        assert abs(r["est_intersect"]) < 0.5 * min(r["est_a"], r["est_b"])


class TestGroupedQuantileSketch:
    def test_groups_match_independent_sketches(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_build,
            qsketch_build_grouped,
            qsketch_quantiles,
            qsketch_quantiles_grouped,
        )
        from pyspark.sql import functions as F

        rows = [("a", (i % 500) + 1) for i in range(2000)] + [
            ("b", (i % 37) * 100 + 1) for i in range(700)
        ]
        df = spark.createDataFrame(rows, "g string, x long")
        grouped = {
            (r["grp"], r["q_bp"]): (r["n_values"], r["quantile_lower"])
            for r in qsketch_quantiles_grouped(
                qsketch_build_grouped(df, "g", "x"), [2500, 5000, 9900]
            ).collect()
        }
        for g in ("a", "b"):
            solo = qsketch_quantiles(
                qsketch_build(df.filter(F.col("g") == g), "x"),
                [2500, 5000, 9900],
            ).collect()
            for r in solo:
                assert grouped[(g, r["q_bp"])] == (
                    r["n_values"],
                    r["quantile_lower"],
                ), (g, r["q_bp"])

    def test_no_cross_group_leakage(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_build_grouped,
            qsketch_quantiles_grouped,
        )

        df = spark.createDataFrame(
            [("lo", v) for v in (1, 2, 3, 4)] + [("hi", v) for v in (1000, 2000)],
            "g string, x long",
        )
        got = {
            (r["grp"], r["q_bp"]): r["quantile_lower"]
            for r in qsketch_quantiles_grouped(
                qsketch_build_grouped(df, "g", "x"), [10000]
            ).collect()
        }
        assert got[("lo", 10000)] == 4
        assert got[("hi", 10000)] >= 1024  # hi's max bucket lower bound


class TestSketchLogGuards:
    """ADVICE r7 low: mixed null/stamped logs are rejected; compact
    stamps strictly descend so two folds never share a dedup key."""

    def test_mixed_null_batch_log_rejected(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_build,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sketch_stream import (
            qsketch_read,
        )
        from pyspark.sql import functions as F
        import pytest

        df = spark.createDataFrame([(v + 1,) for v in range(100)], "x long")
        path = str(tmp_path / "qs")
        # writer contract (adba6a8): stamps are always LONG
        qsketch_build(df, "x").withColumn(
            "batch_id", F.lit(0).cast("long")
        ).write.mode("append").parquet(path)
        # a legacy append: same schema, null stamp
        qsketch_build(df, "x").withColumn(
            "batch_id", F.lit(None).cast("long")
        ).write.mode("append").parquet(path)
        # the guard lives in the fold's group key (no extra job on clean
        # logs), so it surfaces at action time as USER_RAISED_EXCEPTION
        with pytest.raises(Exception, match="null and stamped"):
            qsketch_read(spark, path).collect()

    def test_clean_log_read_runs_no_guard_job(self, spark, tmp_path):
        """VERDICT r8 #5: the null-stamp guard is part of the fold's own
        group key, so constructing the read over a clean log launches NO
        Spark job (the old guard ran a .count() probe per read)."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            qsketch_build,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sketch_stream import (
            qsketch_read,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(v + 1,) for v in range(100)], "x long")
        path = str(tmp_path / "qs_clean")
        qsketch_build(df, "x").withColumn(
            "batch_id", F.lit(0).cast("long")
        ).write.mode("append").parquet(path)

        sc = spark.sparkContext
        # baseline: jobs a bare parquet read-construction launches
        # (schema inference) — the guard must add ZERO on top of it
        sc.setJobGroup("guard-baseline", "bare read construction")
        spark.read.parquet(path)
        baseline = len(sc.statusTracker().getJobIdsForGroup("guard-baseline"))
        sc.setJobGroup("guard-probe", "guarded read construction")
        try:
            folded = qsketch_read(spark, path)  # construction only
            probed = len(sc.statusTracker().getJobIdsForGroup("guard-probe"))
        finally:
            sc.setJobGroup("guard-probe-done", "")
        assert probed <= baseline
        # and the fold itself still works
        assert folded.count() > 0

    def test_compact_stamp_strictly_descends(self, spark, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            countmin_build,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.sketch_stream import (
            countmin_compact,
            countmin_read,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(f"k{v}",) for v in range(50)], "k string")
        p0, p1, p2 = (str(tmp_path / n) for n in ("log", "c1", "c2"))
        countmin_build(df, "k").withColumn(
            "batch_id", F.lit(0).cast("long")
        ).write.mode("append").parquet(p0)
        base = {(r["row"], r["col"]): r["cnt"]
                for r in countmin_read(spark, p0).collect()}

        countmin_compact(spark, p0, p1)
        assert spark.read.parquet(p1).agg(
            F.max("batch_id")
        ).first()[0] == -1
        countmin_compact(spark, p1, p2)
        assert spark.read.parquet(p2).agg(
            F.max("batch_id")
        ).first()[0] == -2
        # folds preserve the sketch through both generations
        assert {(r["row"], r["col"]): r["cnt"]
                for r in countmin_read(spark, p2).collect()} == base


class TestGroupedHll:
    """Sparse per-group HLL (operators/sketch.py::hll_registers_grouped /
    hll_estimate_grouped): sparse == dense arithmetic, merge law."""

    def test_sparse_estimate_matches_dense(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_estimate,
            hll_estimate_grouped,
            hll_registers,
            hll_registers_grouped,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(f"k{i % 97}", "g") for i in range(500)], "key string, grp string"
        )
        dense = hll_estimate(hll_registers(df, "key")).first()["hll_estimate"]
        sparse = hll_estimate_grouped(
            hll_registers_grouped(df, "key", "grp"), "grp"
        ).first()["hll_estimate"]
        assert sparse == dense

    def test_register_max_merge_equals_union_sketch(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_estimate_grouped,
            hll_registers_grouped,
        )
        from pyspark.sql import functions as F

        rows = [(f"k{i}", "a" if i % 2 == 0 else "b") for i in range(300)]
        df = spark.createDataFrame(rows, "key string, grp string")
        sparse = hll_registers_grouped(df, "key", "grp")
        merged = (
            sparse.groupBy("reg")
            .agg(F.max("m_rank").alias("m_rank"))
            .withColumn("grp", F.lit("u"))
        )
        est_merged = hll_estimate_grouped(merged, "grp").first()["hll_estimate"]
        union = df.withColumn("grp", F.lit("u"))
        est_union = hll_estimate_grouped(
            hll_registers_grouped(union, "key", "grp"), "grp"
        ).first()["hll_estimate"]
        assert est_merged == est_union

    def test_sparse_rows_all_positive_rank(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            hll_registers_grouped,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(f"k{i}", f"g{i % 3}") for i in range(100)], "key string, grp string"
        )
        sparse = hll_registers_grouped(df, "key", "grp")
        assert sparse.filter(F.col("m_rank") < 1).count() == 0


class TestKmvSketch:
    """KMV / theta sketch: unsaturated exactness, estimator error,
    merge law, set algebra, partitioning invariance."""

    def _rows(self, spark, n, start=0):
        return spark.range(start, start + n).select(F.col("id").alias("k"))

    def test_unsaturated_sketch_is_exact(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            kmv_minset,
            kmv_set_estimates,
        )

        a = kmv_minset(self._rows(spark, 40), "k", k=64)
        b = kmv_minset(self._rows(spark, 30, start=20), "k", k=64)
        r = kmv_set_estimates(a, b, k=64).collect()[0]
        # both sides unsaturated -> every estimate is exact
        assert r["est_a"] == 40.0 and r["est_b"] == 30.0
        assert r["est_union"] == 50.0
        assert abs(r["est_intersect"] - 20.0) < 1e-9  # ids 20..39 shared

    def test_estimator_relative_error(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            kmv_minset,
            kmv_set_estimates,
        )

        a = kmv_minset(self._rows(spark, 2000), "k", k=64)
        b = kmv_minset(self._rows(spark, 2000, start=1000), "k", k=64)
        r = kmv_set_estimates(a, b, k=64).collect()[0]
        # sigma ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
        for est, true in [(r["est_a"], 2000), (r["est_b"], 2000), (r["est_union"], 3000)]:
            assert abs(est - true) / true < 0.5, (est, true)
        assert 0.0 < r["jaccard"] < 1.0
        assert abs(r["est_intersect"] - 1000) / 1000 < 0.75

    def test_merge_law(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            kmv_minset,
        )

        k = 32
        whole = kmv_minset(self._rows(spark, 500), "k", k=k)
        pa = kmv_minset(self._rows(spark, 250), "k", k=k)
        pb = kmv_minset(self._rows(spark, 250, start=250), "k", k=k)
        merged = pa.unionAll(pb).distinct().orderBy("hv").limit(k)
        assert sorted(r["hv"] for r in merged.collect()) == sorted(
            r["hv"] for r in whole.collect()
        )

    def test_partitioning_invariant(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            kmv_minset,
        )

        base = self._rows(spark, 300)
        a = sorted(r["hv"] for r in kmv_minset(base, "k", k=16).collect())
        b = sorted(r["hv"] for r in kmv_minset(base.repartition(13), "k", k=16).collect())
        assert a == b

    def test_null_keys_dropped(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            kmv_minset,
        )

        df = spark.createDataFrame([(1,), (None,), (2,), (None,)], "k long")
        assert kmv_minset(df, "k", k=8).count() == 2


class TestReservoirSample:
    def test_merge_law_union_then_truncate(self, spark):
        # bottom-k of the union of two bottom-k sets == bottom-k of the
        # full relation (the property the streaming fold stands on)
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            reservoir_sample,
        )

        df = spark.createDataFrame(
            [(i, f"u{i % 7}") for i in range(500)], "event_id long, tagv string"
        )
        k = 16
        full = reservoir_sample(df, "event_id", ["event_id", "tagv"], k).collect()
        a = reservoir_sample(
            df.filter("event_id % 2 = 0"), "event_id", ["event_id", "tagv"], k
        )
        b = reservoir_sample(
            df.filter("event_id % 2 = 1"), "event_id", ["event_id", "tagv"], k
        )
        merged = (
            a.unionByName(b).distinct().orderBy("hv").limit(k).collect()
        )
        assert sorted(r.event_id for r in merged) == sorted(
            r.event_id for r in full
        )

    def test_replay_is_absorbed(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            reservoir_sample,
        )

        df = spark.createDataFrame([(i,) for i in range(200)], "event_id long")
        k = 8
        s = reservoir_sample(df, "event_id", ["event_id"], k)
        once = s.collect()
        twice = s.unionByName(s).distinct().orderBy("hv").limit(k).collect()
        assert sorted(r.event_id for r in twice) == sorted(r.event_id for r in once)

    def test_sample_is_exact_size_and_unbiased_order(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            reservoir_sample,
        )

        df = spark.createDataFrame([(i,) for i in range(1000)], "event_id long")
        rows = reservoir_sample(df, "event_id", ["event_id"], 50).collect()
        assert len(rows) == 50
        ids = [r.event_id for r in rows]
        # a uniform 5% sample of 0..999 should not be a contiguous slab
        assert max(ids) - min(ids) > 500

    def test_null_ids_dropped(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.sketch import (
            reservoir_sample,
        )

        df = spark.createDataFrame([(None,), (1,), (2,)], "event_id long")
        rows = reservoir_sample(df, "event_id", ["event_id"], 10).collect()
        assert sorted(r.event_id for r in rows) == [1, 2]
