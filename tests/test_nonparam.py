"""Nonparametric family: Mann-Whitney U (exact tie handling),
Theil-Sen slope (exact micro floor-division, negative branch), and
gaps-and-islands daily streaks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
    daily_streaks,
    mann_whitney_u,
    theil_sen_micro,
)


class TestMannWhitney:
    def test_hand_computed_with_ties(self, spark):
        # A = [1, 2, 2], B = [2, 3].  Pooled average ranks:
        # v=1 -> 1; v=2 (three-way tie, ranks 2,3,4) -> 3; v=3 -> 5.
        # R_A = 1 + 3 + 3 = 7 -> r2_a = 14; U_A = R_A - nA(nA+1)/2 = 1
        # -> u2_a = 2; u2_b = 2*3*2 - 2 = 10; AUC = 1/6.
        df = spark.createDataFrame(
            [(1, 1), (2, 1), (2, 1), (2, 0), (3, 0)], "v long, is_a long"
        )
        row = mann_whitney_u(df, "v", "is_a").collect()[0]
        assert (row.n_a, row.n_b) == (3, 2)
        assert row.r2_a == 14
        assert row.u2_a == 2
        assert row.u2_b == 10
        assert row.auc_ppm == 1_000_000 // 6

    def test_no_overlap_gives_full_dominance(self, spark):
        df = spark.createDataFrame(
            [(10, 1), (11, 1), (1, 0), (2, 0)], "v long, is_a long"
        )
        row = mann_whitney_u(df, "v", "is_a").collect()[0]
        assert row.u2_a == 2 * row.n_a * row.n_b  # every A beats every B
        assert row.auc_ppm == 1_000_000

    def test_identical_samples_are_half(self, spark):
        df = spark.createDataFrame(
            [(5, 1), (7, 1), (5, 0), (7, 0)], "v long, is_a long"
        )
        row = mann_whitney_u(df, "v", "is_a").collect()[0]
        assert row.u2_a == row.u2_b
        assert row.auc_ppm == 500_000


class TestTheilSen:
    def test_exact_line_recovers_slope(self, spark):
        # y = 7x + 3: every pairwise slope is exactly 7.
        rows = [(x, 7 * x + 3) for x in range(1, 9)]
        df = spark.createDataFrame(rows, "x long, y long")
        row = theil_sen_micro(df, "x", "y").collect()[0]
        assert row.n_points == 8
        assert row.n_pairs == 8 * 7 // 2
        assert row.slope_micro == 7_000_000

    def test_outlier_resistant_where_mean_is_not(self, spark):
        # y = 2x with one wild outlier; the median slope stays 2.
        rows = [(x, 2 * x) for x in range(1, 10)]
        rows[4] = (5, 1000)
        df = spark.createDataFrame(rows, "x long, y long")
        row = theil_sen_micro(df, "x", "y").collect()[0]
        assert row.slope_micro == 2_000_000

    def test_negative_slope_floor_division(self, spark):
        # y = -3x - 1 exactly: slope_micro must be -3_000_000 (the
        # negative branch must not truncate toward zero).
        rows = [(x, -3 * x - 1) for x in range(1, 7)]
        df = spark.createDataFrame(rows, "x long, y long")
        row = theil_sen_micro(df, "x", "y").collect()[0]
        assert row.slope_micro == -3_000_000

    def test_negative_non_integral_slope_floors(self, spark):
        # two points, slope -1/3: floor(-1000000/3) = -333334
        df = spark.createDataFrame([(0, 0), (3, -1)], "x long, y long")
        row = theil_sen_micro(df, "x", "y").collect()[0]
        assert row.slope_micro == -333_334


class TestDailyStreaks:
    def test_islands_split_on_gaps(self, spark):
        df = spark.createDataFrame(
            [
                (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03"),
                (1, "2024-01-05"),
                (2, "2024-01-01"), (2, "2024-01-01"),  # same day twice
            ],
            "user_id long, ts string",
        ).select("user_id", F.to_timestamp("ts").alias("ts"))
        runs = {
            (r.user_id, r.start_epochday): r.streak_len
            for r in daily_streaks(df, "user_id", "ts").collect()
        }
        d0 = 19723  # 2024-01-01 epoch day
        assert runs == {(1, d0): 3, (1, d0 + 4): 1, (2, d0): 1}

    def test_single_long_run(self, spark):
        df = spark.createDataFrame(
            [(9, f"2024-02-{d:02d}") for d in range(1, 11)],
            "user_id long, ts string",
        ).select("user_id", F.to_timestamp("ts").alias("ts"))
        rows = daily_streaks(df, "user_id", "ts").collect()
        assert len(rows) == 1 and rows[0].streak_len == 10


class TestRegisteredEntries:
    @pytest.mark.parametrize(
        "name",
        ["stats_mannwhitney_price", "stats_theilsen_revenue_trend",
         "events_activity_streaks"],
    )
    def test_smoke_shapes(self, spark, sf_dir, name):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        rows = df.collect()
        assert sql is not None
        assert len(rows) >= 1
        if name == "stats_mannwhitney_price":
            r = rows[0]
            assert r.u2_a + r.u2_b == 2 * r.n_a * r.n_b
            assert 0 <= r.auc_ppm <= 1_000_000
        if name == "events_activity_streaks":
            assert all(r.longest_streak >= 1 for r in rows)
            # sorted by longest desc then user_id
            keys = [(-r.longest_streak, r.user_id) for r in rows]
            assert keys == sorted(keys)


class TestPoissonBootstrap:
    def test_weights_are_poisson_one_ish(self, spark):
        # mean weight over many (b, id) draws must sit near 1 and the
        # zero-fraction near e^-1 (deterministic given the fixed hash)
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            poisson_weight_expr,
        )
        from pyspark.sql import functions as F

        df = spark.range(2000).select(
            F.col("id"), F.lit(0).alias("b")
        ).withColumn("w", F.expr(poisson_weight_expr("b", "id")))
        agg = df.agg(
            F.avg("w").alias("m"),
            F.avg((F.col("w") == 0).cast("double")).alias("z"),
        ).collect()[0]
        assert 0.93 < agg.m < 1.07
        assert 0.33 < agg.z < 0.41

    def test_replicate_means_bracket_truth(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            poisson_bootstrap_means,
        )
        from pyspark.sql import functions as F

        df = spark.range(3000).select(
            F.col("id"), (F.col("id") % 100).alias("x")
        )
        means = poisson_bootstrap_means(df, "id", "x", 12).collect()
        assert len(means) == 12
        vals = [r.mean_micro / 1e6 for r in means]
        # true mean 49.5; every replicate mean of 3000 rows stays close
        assert all(45 < v < 54 for v in vals)
        assert min(vals) < 49.5 < max(vals)

    def test_deterministic_across_runs(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            poisson_bootstrap_means,
        )
        from pyspark.sql import functions as F

        df = spark.range(500).select(F.col("id"), (F.col("id") * 3 % 7).alias("x"))
        a = sorted((r.b, r.mean_micro) for r in poisson_bootstrap_means(df, "id", "x", 5).collect())
        b = sorted((r.b, r.mean_micro) for r in poisson_bootstrap_means(df.repartition(7), "id", "x", 5).collect())
        assert a == b  # partitioning-independent (exact integer path)

    def test_rejects_degenerate_b(self, spark):
        import pytest as _pt

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            poisson_bootstrap_means,
        )

        with _pt.raises(ValueError):
            poisson_bootstrap_means(spark.range(5), "id", "id", 1)


class TestPoissonBootstrapFastHash:
    def test_xxhash_path_same_weight_law(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            poisson_weight_expr,
        )
        from pyspark.sql import functions as F

        df = spark.range(4000).select(F.col("id"), F.lit(3).alias("b"))
        agg = df.withColumn(
            "w", F.expr(poisson_weight_expr("b", "id", "xxhash64"))
        ).agg(
            F.avg("w").alias("m"),
            F.avg((F.col("w") == 0).cast("double")).alias("z"),
        ).collect()[0]
        assert 0.93 < agg.m < 1.07
        assert 0.33 < agg.z < 0.41

    def test_xxhash_markedly_cheaper_plan(self, spark):
        # the fast path must stay whole-stage-codegen (no python, no
        # conv/md5 string machinery): assert it is pure native exprs
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            poisson_weight_expr,
        )

        e = poisson_weight_expr("b", "id", "xxhash64")
        assert "md5" not in e and "conv" not in e and "xxhash64" in e

    def test_rejects_unknown_hash(self, spark):
        import pytest as _pt

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            poisson_weight_expr,
        )

        with _pt.raises(ValueError):
            poisson_weight_expr("b", "id", "sha1")


class TestAbTestEntry:
    def test_arm_balance_and_identities(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["events_ab_test_analysis"]
        r = fn(spark, sf_dir).collect()[0]
        assert sql is not None
        assert r.n_a > 0 and r.n_b > 0
        assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
        assert r.lift_ppm == r.rate_a_ppm - r.rate_b_ppm
        # hash split is roughly even (binomial, wide tolerance)
        total = r.n_a + r.n_b
        assert abs(r.n_a - total / 2) < total * 0.25


class TestWilcoxonSignedRank:
    def test_hand_computed_with_ties(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            wilcoxon_signed_rank,
        )

        # d = [+1, -1, +2, +2, -3, 0]; zero dropped -> n = 5
        # |d| ranks: 1,1 -> avg 1.5 each; 2,2 -> avg 3.5 each; 3 -> 5
        # W+ = 1.5 + 3.5 + 3.5 = 8.5 -> w2_pos = 17
        # W- = 1.5 + 5 = 6.5 -> w2_neg = 13; sum = n(n+1) = 30
        df = spark.createDataFrame([(1,), (-1,), (2,), (2,), (-3,), (0,)], "d long")
        r = wilcoxon_signed_rank(df, "d").collect()[0]
        assert r.n_pairs == 5
        assert r.w2_pos == 17 and r.w2_neg == 13
        assert r.w2_pos + r.w2_neg == 5 * 6
        assert r.pos_rank_ppm == 17 * 1_000_000 // 30

    def test_all_positive(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            wilcoxon_signed_rank,
        )

        df = spark.createDataFrame([(5,), (9,), (2,)], "d long")
        r = wilcoxon_signed_rank(df, "d").collect()[0]
        assert r.w2_neg == 0 and r.pos_rank_ppm == 1_000_000

    def test_symmetric_is_half(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.nonparam import (
            wilcoxon_signed_rank,
        )

        df = spark.createDataFrame([(4,), (-4,), (7,), (-7,)], "d long")
        r = wilcoxon_signed_rank(df, "d").collect()[0]
        assert r.w2_pos == r.w2_neg and r.pos_rank_ppm == 500_000


class TestCohortLtvEntry:
    def test_monotone_cumulative(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["orders_cohort_ltv"]
        rows = fn(spark, sf_dir).collect()
        assert sql is not None and rows
        by_cohort = {}
        for r in rows:
            by_cohort.setdefault(r.cohort, []).append(r)
        for cohort, rs in by_cohort.items():
            rs.sort(key=lambda r: r.age)
            assert rs[0].age == 0  # the acquisition month is always present
            cums = [r.cum_cents for r in rs]
            assert cums == sorted(cums)  # cumulative never decreases
            assert all(r.ltv_micro >= 0 for r in rs)


class TestSpearmanEntry:
    def test_python_parity_on_synthetic(self, spark):
        # build a small relation in the entry's own shape and compare
        # against scipy-free hand computation with average ties
        from pyspark.sql import Window, functions as F

        rows = [(1, 3, 100), (2, 1, 40), (3, 3, 90), (4, 7, 200), (5, 1, 40)]
        per = spark.createDataFrame(rows, "c long, nord long, spend long")

        def ranked2(df, col, out):
            per_v = df.groupBy(F.col(col).alias("_v")).agg(F.count("*").alias("_c"))
            w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
            r2 = per_v.withColumn(
                "_cb", F.coalesce(F.sum("_c").over(w), F.lit(0))
            ).select(F.col("_v").alias(col), (2 * F.col("_cb") + F.col("_c") + 1).alias(out))
            return df.join(F.broadcast(r2), col)

        got = {r.c: (r.rx2, r.ry2) for r in ranked2(ranked2(per, "nord", "rx2"), "spend", "ry2").collect()}

        def avg_ranks2(vals):
            import collections
            cnt = collections.Counter(vals)
            out, cb = {}, 0
            for v in sorted(cnt):
                out[v] = 2 * cb + cnt[v] + 1
                cb += cnt[v]
            return out

        rx = avg_ranks2([r[1] for r in rows])
        ry = avg_ranks2([r[2] for r in rows])
        for c, nord, spend in rows:
            assert got[c] == (rx[nord], ry[spend])

    def test_registered_entry_bounds(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["stats_spearman_rank_corr"]
        r = fn(spark, sf_dir).collect()[0]
        assert sql is not None
        assert -1.0 <= r.spearman_r4 <= 1.0
        # order count and spend are strongly monotone-associated
        assert r.spearman_r4 > 0.5


class TestHeapsEntry:
    def test_monotone_vocab_growth(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["vocab_heaps_growth"]
        rows = sorted(fn(spark, sf_dir).collect(), key=lambda r: r.k)
        assert sql is not None and [r.k for r in rows] == [100, 250, 500]
        sizes = [r.vocab_size for r in rows]
        assert sizes == sorted(sizes) and sizes[0] > 0
