"""Monitoring operators and the drift/survival/concentration entries:
CUSUM prefix-min identity vs the textbook recurrence, Kaplan-Meier vs a
hand-computed curve, and end-to-end fixture checks for the Gini / KS /
Benford / EWMA entries on tiny hand-built tables."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.monitoring import (
    cusum_scores,
    km_curve,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
    REGISTRY,
)


def _py_cusum(xs):
    n = len(xs)
    mu = sum(xs) // n
    sp = sn = 0
    out = []
    for x in xs:
        sp = max(0, sp + x - mu)
        sn = max(0, sn + mu - x)
        out.append((sp, sn))
    return mu, out


class TestCusum:
    def test_identity_matches_recurrence(self, spark):
        xs = [5, 9, 2, 14, 14, 15, 3, 1, 8, 8, 30, 2, 7]
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "t long, x long"
        )
        got = {
            r["t"]: (r["cusum_pos"], r["cusum_neg"])
            for r in cusum_scores(df, "x", "t").collect()
        }
        _, exp = _py_cusum(xs)
        assert got == dict(enumerate(exp))

    def test_flat_series_scores_zero(self, spark):
        df = spark.createDataFrame([(i, 7) for i in range(10)], "t long, x long")
        rows = cusum_scores(df, "x", "t").collect()
        assert all(r["cusum_pos"] == 0 and r["cusum_neg"] == 0 for r in rows)

    def test_level_shift_is_detected_at_shift(self, spark):
        xs = [10] * 10 + [20] * 10
        df = spark.createDataFrame(list(enumerate(xs)), "t long, x long")
        rows = sorted(cusum_scores(df, "x", "t").collect(), key=lambda r: r["t"])
        # mean = 15: positive score grows only in the shifted regime
        assert rows[9]["cusum_pos"] == 0
        assert rows[19]["cusum_pos"] == 50
        assert rows[9]["cusum_neg"] == 50

    def test_explicit_target(self, spark):
        df = spark.createDataFrame([(1, 10), (2, 12), (3, 9)], "t long, x long")
        rows = sorted(
            cusum_scores(df, "x", "t", target=F.lit(10)).collect(),
            key=lambda r: r["t"],
        )
        assert [r["cusum_pos"] for r in rows] == [0, 2, 1]


def _py_km(durs):
    """(dur, observed) rows -> {event_time: (n_risk, d, survival)}."""
    times = sorted({d for d, o in durs if o})
    out, s = {}, 1.0
    for t in times:
        n = sum(1 for d, _ in durs if d >= t)
        d = sum(1 for dd, o in durs if dd == t and o)
        s *= (n - d) / n
        out[t] = (n, d, round(s, 4))
    return out


class TestKmCurve:
    def test_matches_hand_computation(self, spark):
        # the classic 6-MP arm of Freireich et al. 1963 (public data)
        durs = [
            (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
            (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
            (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0),
        ]
        df = spark.createDataFrame(durs, "dur long, observed long")
        got = {
            r["dur"]: (r["n_risk"], r["d_events"], r["survival"])
            for r in km_curve(df).collect()
        }
        assert got == _py_km(durs)
        # spot-check the published values
        assert got[6] == (21, 3, 0.8571)
        assert got[23][2] == pytest.approx(0.4482, abs=1e-4)

    def test_exhausted_risk_set_is_exact_zero(self, spark):
        durs = [(1, 1), (2, 1), (3, 1)]
        df = spark.createDataFrame(durs, "dur long, observed long")
        got = {r["dur"]: r["survival"] for r in km_curve(df).collect()}
        assert got[3] == 0.0

    def test_censored_only_times_are_not_rows(self, spark):
        durs = [(1, 1), (2, 0), (3, 1)]
        df = spark.createDataFrame(durs, "dur long, observed long")
        assert {r["dur"] for r in km_curve(df).collect()} == {1, 3}

    def test_partitioning_independent(self, spark):
        durs = [(d % 17 + 1, d % 3 != 0) for d in range(200)]
        df = spark.createDataFrame(
            [(d, int(o)) for d, o in durs], "dur long, observed long"
        )
        one = sorted(km_curve(df.repartition(1)).collect())
        many = sorted(km_curve(df.repartition(13)).collect())
        assert one == many


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    """A miniature sf dir with orders/customer/nation shaped like the
    driver fixtures — enough for the drift/concentration entries."""
    root = tmp_path_factory.mktemp("tiny_sf")
    d0 = datetime.datetime(2024, 1, 1)
    orders = [
        (
            i,
            i % 10 + 1,
            "O",
            float(10 + 137 * i % 9000) + 0.25,
            d0 + datetime.timedelta(days=(i * 13) % 400),
            "1-URGENT",
        )
        for i in range(1, 301)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(root / "orders.parquet"))
    cust = [
        (c, f"Customer#{c}", c % 5, 100.0, ["BUILDING", "MACHINERY", "AUTOMOBILE"][c % 3])
        for c in range(1, 11)
    ]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(root / "customer.parquet"))
    spark.createDataFrame(
        [(n, f"NATION_{n}", n % 2) for n in range(5)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.mode("overwrite").parquet(str(root / "nation.parquet"))
    return str(root)


class TestEntriesOnTinyFixture:
    def test_gini_bounds_and_equal_distribution(self, spark, tiny_sf):
        rows = REGISTRY["stats_gini_revenue"][0](spark, tiny_sf).collect()
        assert rows, "gini produced no nations"
        for r in rows:
            assert 0 <= r["gini_ppm"] < 1_000_000

    def test_ks_self_drift_is_zero(self, spark, tiny_sf, tmp_path):
        # duplicate BUILDING as MACHINERY: identical distributions -> D = 0
        import shutil

        root = tmp_path / "sf_ks"
        shutil.copytree(tiny_sf, root)
        cust = spark.read.parquet(f"{tiny_sf}/customer.parquet")
        (
            cust.filter(F.col("c_mktsegment") == "BUILDING")
            .withColumn("c_mktsegment", F.lit("MACHINERY"))
            .withColumn("c_custkey", F.col("c_custkey") + 1000)
            .unionByName(cust.filter(F.col("c_mktsegment") == "BUILDING"))
            .write.mode("overwrite")
            .parquet(str(root / "customer.parquet"))
        )
        # same customers order the same prices under both labels
        orders = spark.read.parquet(f"{tiny_sf}/orders.parquet")
        twin = orders.withColumn("o_custkey", F.col("o_custkey") + 1000).withColumn(
            "o_orderkey", F.col("o_orderkey") + 100000
        )
        orders.unionByName(twin).write.mode("overwrite").parquet(
            str(root / "orders.parquet")
        )
        row = REGISTRY["stats_ks_price_drift"][0](spark, str(root)).collect()[0]
        assert row["d_num"] == 0 and row["ks_ppm"] == 0

    def test_benford_expected_table_is_floor_log10(self, spark, tiny_sf):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries.drift_survival import (
            _BENFORD_PPM,
        )

        for d, ppm in _BENFORD_PPM.items():
            assert ppm == math.floor(1_000_000 * math.log10(1 + 1 / d))
        rows = REGISTRY["stats_benford_price_audit"][0](spark, tiny_sf).collect()
        assert sum(r["n_obs"] for r in rows) == 300
        for r in rows:
            assert 0 <= r["obs_ppm"] <= 1_000_000

    def test_ewma_constant_series_is_identity(self, spark, tmp_path):
        # constant monthly revenue -> EWMA equals the series everywhere
        d0 = datetime.datetime(2024, 1, 1)
        rows = [
            (m * 100 + k, 1, "O", 500.00, d0.replace(month=m), "x")
            for m in range(1, 13)
            for k in range(3)
        ]
        root = tmp_path / "sf_ewma"
        root.mkdir()
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.parquet(str(root / "orders.parquet"))
        out = REGISTRY["orders_ewma_revenue_trend"][0](spark, str(root)).collect()
        assert len(out) == 12
        for r in out:
            assert r["ewma_cents"] == r["revenue_cents"] == 150000


class TestMutualInfo:
    def _run(self, spark, rows, tmp_path, name):
        root = tmp_path / name
        root.mkdir()
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(str(root / "documents.parquet"))
        return REGISTRY["stats_mutual_info_lang_source"][0](spark, str(root)).collect()[0]

    def test_independent_columns_score_zero(self, spark, tmp_path):
        # perfectly balanced grid: lang carries no information about source
        rows = [
            (i, "t", f"L{i % 2}", f"S{(i // 2) % 3}", 1)
            for i in range(60)
        ]
        r = self._run(spark, rows, tmp_path, "mi_indep")
        assert r["n_rows"] == 60 and r["n_cells"] == 6
        assert abs(r["mi_micro_per_row"]) <= 1  # quantization only

    def test_deterministic_mapping_scores_entropy(self, spark, tmp_path):
        import math

        # source is a function of lang, uniform over 4 langs: MI = ln(4)
        rows = [(i, "t", f"L{i % 4}", f"S{i % 4}", 1) for i in range(80)]
        r = self._run(spark, rows, tmp_path, "mi_dep")
        assert r["n_cells"] == 4
        assert abs(r["mi_micro_per_row"] - round(math.log(4) * 1_000_000)) <= 2


class TestSeasonalDecompose:
    def test_identity_and_trend_on_fixture(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["orders_seasonal_decompose"]
        rows = fn(spark, sf_dir).collect()
        assert sql is not None and len(rows) >= 12
        for r in rows:
            # additive identity in x24 units: 24*rev = trend + seasonal + resid
            assert 24 * r.rev == r.trend_x24 + r.seasonal_x24 + r.resid_x24
            assert r.moy == r.mx % 12
        # consecutive month spine (no misaligned windows)
        mxs = [r.mx for r in rows]
        assert mxs == list(range(mxs[0], mxs[0] + len(mxs)))

    def test_pure_seasonal_series_zero_residual(self, spark):
        # rev(m) = 1200 + pattern[m % 12] with sum(pattern) == 0: the
        # centered MA recovers the constant trend and the seasonal
        # means absorb the pattern, leaving zero residuals.
        import postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries as Q

        pattern = [60, -36, 24, -12, 0, 12, -24, 36, -60, 48, -48, 0]
        rows = [(m, 1200 + pattern[m % 12]) for m in range(24000, 24048)]
        df = spark.createDataFrame(rows, "mx long, rev long")
        from pyspark.sql import Window, functions as F

        w = Window.orderBy("mx")
        win11 = Window.orderBy("mx").rowsBetween(-5, 5)
        full = df.withColumn(
            "trend_x24",
            F.lag("rev", 6).over(w) + F.lead("rev", 6).over(w)
            + 2 * F.sum("rev").over(win11),
        ).withColumn("d24", 24 * F.col("rev") - F.col("trend_x24"))
        defined = full.filter(F.col("trend_x24").isNotNull()).collect()
        assert all(r.trend_x24 == 24 * 1200 for r in defined)
        assert all(r.d24 == 24 * pattern[r.mx % 12] for r in defined)


class TestHillTailIndex:
    def test_exact_pareto_tail_recovers_alpha(self, spark):
        # v_i = C * i^(-1/alpha) for i = 1..N is an exact Pareto tail:
        # the Hill estimator over top-k must land near alpha.
        import math

        from pyspark.sql import Window, functions as F

        alpha = 2.0
        vals = [(i, int(1e9 * (i ** (-1.0 / alpha)))) for i in range(1, 2001)]
        df = spark.createDataFrame(vals, "o_orderkey long, v long")
        k = 100
        topk = df.orderBy(F.col("v").desc(), "o_orderkey").limit(k + 1)
        w = Window.orderBy(F.col("v").desc(), "o_orderkey")
        ranked = topk.withColumn("rn", F.row_number().over(w)).withColumn(
            "lnv", F.floor(F.log(F.col("v").cast("double")) * 1e6 + 0.5).cast("long")
        ).collect()
        ref = [r.lnv for r in ranked if r.rn == k + 1][0]
        s = sum(r.lnv - ref for r in ranked if r.rn <= k)
        alpha_hat = 1e12 / (s // k)
        assert abs(alpha_hat / 1e6 - alpha) < 0.05

    def test_registered_entry_positive(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["stats_hill_tail_index"]
        r = fn(spark, sf_dir).collect()[0]
        assert sql is not None
        assert r.k == 100 and r.mean_excess_micro > 0 and r.alpha_ppm > 0


class TestForecastBacktest:
    def test_self_grading_identities(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["orders_seasonal_forecast_backtest"]
        r = fn(spark, sf_dir).collect()[0]
        assert sql is not None
        assert r.n_holdout == 12
        assert r.mae_micro >= 0 and 0 <= r.mape_ppm <= 2_000_000


class TestOovCurve:
    def test_monotone_coverage(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["vocab_oov_rate_curve"]
        rows = sorted(fn(spark, sf_dir).collect(), key=lambda r: r.k)
        assert sql is not None and len(rows) == 3
        # bigger vocab -> more covered tokens, fewer OOV
        for a, b in zip(rows, rows[1:]):
            assert b.vocab_tokens >= a.vocab_tokens
            assert b.oov_ppm <= a.oov_ppm
        for r in rows:
            assert r.vocab_tokens + r.oov_tokens == rows[0].vocab_tokens + rows[0].oov_tokens


class TestHourlyAutocorr:
    def test_periodic_series_peaks_at_its_period(self, spark):
        # synthetic: counts with period 24 -> acf(24) near 1e6, acf(1) low
        from pyspark.sql import functions as F

        rows = [(h, 10 + (7 if h % 24 == 3 else 0)) for h in range(24 * 30)]
        s = spark.createDataFrame(rows, "h long, c long")
        tot = s.agg(F.count("*").alias("n"), F.sum("c").alias("S")).first()
        n, S = tot["n"], tot["S"]
        centered = s.select("h", (F.lit(n) * F.col("c") - F.lit(S)).alias("z"))
        den = centered.agg(F.sum(F.col("z") * F.col("z"))).first()[0]

        def acf(k):
            a = centered.select("h", F.col("z").alias("z0"))
            b = centered.select((F.col("h") - k).alias("h"), F.col("z").alias("zk"))
            num = a.join(b, "h").agg(F.sum(F.col("z0") * F.col("zk"))).first()[0]
            return num / den

        assert acf(24) > 0.9
        assert abs(acf(1)) < 0.1

    def test_registered_entry_shape(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["events_hourly_autocorr"]
        rows = sorted(fn(spark, sf_dir).collect(), key=lambda r: r.lag)
        assert sql is not None
        assert [r.lag for r in rows] == [1, 24, 168]
        assert all(-1_000_000 <= r.acf_ppm <= 1_000_000 for r in rows)
        # longer lags have fewer overlapping pairs
        assert rows[0].n_pairs > rows[1].n_pairs > rows[2].n_pairs


class TestAssortativityEntry:
    def test_bounds_and_symmetric_sums(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY["graph_degree_assortativity"]
        r = fn(spark, sf_dir).collect()[0]
        assert sql is not None
        assert -1.0 <= r.assortativity_r4 <= 1.0
        assert r.n_directed_edges % 2 == 0  # both orientations present
