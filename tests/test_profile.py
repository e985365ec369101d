"""Profiling + constraints (operators/profile.py): hand-computed stats
on a frame with nulls/duplicates, histogram bucket math, constraint
verdicts, single-pass plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
    check_constraints,
    column_profile,
    completeness,
    fraction_in_range,
    fraction_in_set,
    fraction_matching,
    histogram,
    uniqueness,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (2, None, 30.0),
        (3, "a", None),
        (4, "c", 40.0),
    ]
    return spark.createDataFrame(rows, "id int, tag string, x double")


class TestProfile:
    def test_hand_computed(self, messy):
        p = {r["column"]: r for r in column_profile(messy).collect()}
        assert p["id"]["n_rows"] == 5
        assert p["id"]["n_nulls"] == 0
        assert p["id"]["n_distinct"] == 4
        assert p["id"]["min_value"] == "1" and p["id"]["max_value"] == "4"
        assert p["id"]["mean"] == 2.4
        assert p["tag"]["n_nulls"] == 1
        assert p["tag"]["n_distinct"] == 3  # nulls don't count as a value
        assert p["tag"]["mean"] is None  # non-numeric
        assert p["x"]["n_nulls"] == 1
        assert p["x"]["mean"] == 25.0  # avg ignores the null

    def test_single_pass(self, messy):
        """All columns' stats come from ONE aggregation over one scan —
        the plan has exactly one scan of the source."""
        plan = column_profile(messy)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("LocalRelation") + plan.count("LogicalRDD") == 1

    def test_column_subset(self, messy):
        rows = column_profile(messy, ["id"]).collect()
        assert [r["column"] for r in rows] == ["id"]


class TestHistogram:
    def test_bucket_math(self, spark):
        df = spark.createDataFrame([(float(v),) for v in range(0, 100)], "v double")
        h = {r["bucket"]: r for r in histogram(df, "v", n_buckets=10).collect()}
        assert len(h) == 10
        assert all(h[b]["n"] == 10 for b in range(10))
        assert h[0]["bucket_lo"] == 0.0
        # max value (99) clamps into the last bucket
        assert h[9]["n"] == 10 and h[9]["bucket_hi"] == 99.0

    def test_explicit_bounds_filter_outliers(self, spark):
        df = spark.createDataFrame([(1.0,), (2.0,), (999.0,)], "v double")
        h = histogram(df, "v", n_buckets=2, lo=0.0, hi=4.0).collect()
        assert sum(r["n"] for r in h) == 2  # 999 excluded

    def test_rejects_bad_buckets(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            histogram(df, "v", n_buckets=0)


class TestConstraints:
    def test_verdicts(self, messy):
        rep = {
            r["constraint"]: r
            for r in check_constraints(messy, [
                ("id_complete", completeness("id"), 1.0),
                ("id_unique", uniqueness("id"), 1.0),
                ("tag_complete", completeness("tag"), 0.75),
                ("x_in_range", fraction_in_range("x", 0.0, 100.0), 0.75),
                ("tag_in_set", fraction_in_set("tag", ["a", "b", "c"]), 0.9),
                ("tag_format", fraction_matching("tag", "^[a-z]$"), 0.75),
            ]).collect()
        }
        assert rep["id_complete"]["passed"] is True
        assert rep["id_unique"]["observed"] == 0.8
        assert rep["id_unique"]["passed"] is False
        assert rep["tag_complete"]["observed"] == 0.8
        assert rep["tag_complete"]["passed"] is True
        assert rep["tag_in_set"]["observed"] == 0.8
        assert rep["tag_in_set"]["passed"] is False

    def test_rejects_empty_and_dupes(self, messy):
        with pytest.raises(ValueError):
            check_constraints(messy, [])
        with pytest.raises(ValueError):
            check_constraints(messy, [
                ("a", completeness("id"), 1.0),
                ("a", uniqueness("id"), 1.0),
            ])


class TestDrift:
    def test_drift_hand_computed(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            column_profile,
            profile_drift,
        )

        before_df = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0), (4, None)], "id int, x double"
        )
        after_df = spark.createDataFrame(
            [(1, 10.0), (1, 10.0), (2, None), (3, None)], "id int, x double"
        )
        drift = {
            r["column"]: r
            for r in profile_drift(
                column_profile(before_df), column_profile(after_df)
            ).collect()
        }
        # id: distinct ratio 4/4 -> 3/4; x nulls 1/4 -> 2/4; x mean 20 -> 10
        assert drift["id"]["n_rows_before"] == 4 and drift["id"]["n_rows_after"] == 4
        assert drift["id"]["distinct_ratio_delta"] == -0.25
        assert drift["x"]["null_frac_delta"] == 0.25
        assert drift["x"]["mean_delta"] == -10.0

    def test_identical_snapshots_zero_drift(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            column_profile,
            profile_drift,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
        p = column_profile(docs)
        for r in profile_drift(p, p).collect():
            assert r["null_frac_delta"] == 0.0
            assert r["distinct_ratio_delta"] == 0.0
            assert r["mean_delta"] == 0.0


class TestDegenerateInputs:
    """ADVICE r5: ANSI-mode DIVIDE_BY_ZERO guards — constant columns and
    empty snapshots must degrade to sane reports, not crash."""

    def test_constant_column_single_bucket(self, spark):
        df = spark.createDataFrame([(5.0,)] * 7, "v double")
        h = histogram(df, "v", n_buckets=4).collect()
        assert len(h) == 1
        assert h[0]["bucket"] == 0 and h[0]["n"] == 7
        assert h[0]["bucket_lo"] == 5.0 and h[0]["bucket_hi"] == 5.0

    def test_explicit_equal_bounds_single_bucket(self, spark):
        df = spark.createDataFrame([(2.0,), (2.0,), (9.0,)], "v double")
        h = histogram(df, "v", n_buckets=3, lo=2.0, hi=2.0).collect()
        assert len(h) == 1 and h[0]["n"] == 2  # 9.0 outside [2, 2]

    def test_empty_input_constraints_fail_not_crash(self, spark):
        empty = spark.createDataFrame([], "id int, x double")
        rep = {
            r["constraint"]: r
            for r in check_constraints(empty, [
                ("id_unique", uniqueness("id"), 1.0),
                ("id_complete", completeness("id"), 0.5),
            ]).collect()
        }
        assert rep["id_unique"]["observed"] is None
        assert rep["id_unique"]["passed"] is False  # NULL obs = failed gate
        assert rep["id_complete"]["passed"] is False

    def test_empty_snapshot_drift_no_crash(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            column_profile,
            profile_drift,
        )

        full = spark.createDataFrame([(1, 1.0), (2, None)], "id int, x double")
        empty = full.filter("id < 0")
        rows = profile_drift(column_profile(full), column_profile(empty)).collect()
        assert rows  # inner join keeps both columns
        for r in rows:
            assert r["n_rows_after"] == 0
            assert r["null_frac_delta"] is None  # NULL ratios, not a crash


class TestSnapshotDiff:
    """Row-level dataset diff (operators/profile.py::snapshot_diff)."""

    def _frames(self, spark):
        before = spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "en"), (3, "c", "zh"), (4, None, "en")],
            "doc_id long, text string, lang string",
        )
        after = spark.createDataFrame(
            [(1, "a", "en"), (2, "B", "en"), (4, "", "en"), (5, "new", "de")],
            "doc_id long, text string, lang string",
        )
        return before, after

    def test_statuses(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            snapshot_diff,
        )

        before, after = self._frames(spark)
        got = {
            r["doc_id"]: r["status"]
            for r in snapshot_diff(before, after, id_col="doc_id").collect()
        }
        assert got == {
            1: "unchanged",
            2: "changed",
            3: "removed",
            4: "changed",  # null -> '' must count as a change
            5: "added",
        }

    def test_null_vs_empty_distinct(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            snapshot_diff,
        )

        before, after = self._frames(spark)
        r = {
            x["doc_id"]: x
            for x in snapshot_diff(before, after, id_col="doc_id").collect()
        }
        assert r[4]["hash_before"] != r[4]["hash_after"]

    def test_explicit_hash_cols_narrow_the_diff(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            snapshot_diff,
        )

        before, after = self._frames(spark)
        # hashing only lang: row 2's text change becomes invisible
        got = {
            r["doc_id"]: r["status"]
            for r in snapshot_diff(
                before, after, id_col="doc_id", hash_cols=["lang"]
            ).collect()
        }
        assert got[2] == "unchanged"

    def test_requires_hash_columns(self, spark):
        import pytest as _pytest

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            snapshot_diff,
        )

        ids_only = spark.createDataFrame([(1,)], "doc_id long")
        with _pytest.raises(ValueError):
            snapshot_diff(ids_only, ids_only, id_col="doc_id")

    def test_separator_and_sentinel_values_do_not_collide(self, spark):
        """ADVICE r8: rows whose VALUES contain the old separator or the
        null sentinel must not hash equal — per-column digests make the
        row hash injective on the column tuple (up to md5 collisions)."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            snapshot_diff,
        )

        # ('a§', 'b') vs ('a', '§b') concat identically under a '§' join;
        # (None, x) vs ('<NULL>', x) collide under a sentinel coalesce
        before = spark.createDataFrame(
            [(1, "a§", "b"), (2, None, "x")], "doc_id long, c1 string, c2 string"
        )
        after = spark.createDataFrame(
            [(1, "a", "§b"), (2, "<NULL>", "x")], "doc_id long, c1 string, c2 string"
        )
        got = {
            r["doc_id"]: r["status"]
            for r in snapshot_diff(before, after, id_col="doc_id").collect()
        }
        assert got == {1: "changed", 2: "changed"}

    def test_only_id_and_hash_cross_the_exchange(self, spark):
        """The payload must not shuffle: every Exchange input carries
        only the id and the 16-byte hash."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            snapshot_diff,
        )

        before, after = self._frames(spark)
        plan = (
            snapshot_diff(before, after, id_col="doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # every exchange partitions on the id alone, and both join
        # inputs are md5 projections — the payload is hashed before it
        # could ever reach a shuffle
        import re

        exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
        assert exchanges and all(c == "doc_id" for c in exchanges), exchanges
        assert plan.count("md5") >= 2


class TestPsiDrift:
    """Population Stability Index (operators/profile.py::psi_drift, r9)."""

    def test_identical_snapshots_are_stable(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            psi_drift,
        )

        df = spark.createDataFrame(
            [(float(i % 50),) for i in range(1000)], "value double"
        )
        r = psi_drift(df, df, "value").first()
        # identical distributions: only Laplace smoothing noise, well
        # under the 0.1 'stable' bar (psi_micro < 100_000)
        assert r["psi_micro"] < 100_000
        assert r["n_base"] == r["n_current"] == 1000

    def test_shifted_distribution_flags_drift(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            psi_drift,
        )

        base = spark.createDataFrame(
            [(float(i % 50),) for i in range(1000)], "value double"
        )
        shifted = spark.createDataFrame(
            [(float(i % 50) + 40.0,) for i in range(1000)], "value double"
        )
        r = psi_drift(base, shifted, "value").first()
        # mass piles into the top clamp bucket: PSI far above 0.25
        assert r["psi_micro"] > 250_000

    def test_matches_python_reference(self, spark):
        import math

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            psi_drift,
        )

        bvals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
        cvals = [1.0, 1.0, 2.0, 8.0, 8.0, 8.0]
        base = spark.createDataFrame([(v,) for v in bvals], "value double")
        cur = spark.createDataFrame([(v,) for v in cvals], "value double")
        n = 10
        qb = [int(math.floor(v * 100 + 0.5)) for v in bvals]
        qc = [int(math.floor(v * 100 + 0.5)) for v in cvals]
        lo, hi = min(qb), max(qb)
        def bucket(v):
            vc = max(min(v, hi), lo)
            return ((vc - lo) * n) // (hi - lo + 1)
        from collections import Counter
        cb, cc = Counter(map(bucket, qb)), Counter(map(bucket, qc))
        nb, nc = len(qb), len(qc)
        expect = sum(
            math.floor(((cb.get(b, 0) + 1) / (nb + n) - (cc.get(b, 0) + 1) / (nc + n))
                       * math.log(((cb.get(b, 0) + 1) / (nb + n))
                                  / ((cc.get(b, 0) + 1) / (nc + n))) * 1e6 + 0.5)
            for b in range(n)
        )
        r = psi_drift(base, cur, "value").first()
        assert r["psi_micro"] == expect

    def test_rejects_bad_buckets(self, spark):
        import pytest as _pt

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            psi_drift,
        )

        df = spark.createDataFrame([(1.0,)], "value double")
        with _pt.raises(ValueError, match="n_buckets"):
            psi_drift(df, df, "value", n_buckets=1)

    def test_current_only_group_reported(self, spark):
        """ADVICE r9: a group present only in `current` (a brand-new
        population segment) must surface as a drift row with smoothed-
        only base mass, not vanish from the report."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.profile import (
            psi_drift,
        )

        base = spark.createDataFrame(
            [("old", float(i % 20)) for i in range(200)], "g string, value double"
        )
        cur = spark.createDataFrame(
            [("old", float(i % 20)) for i in range(100)]
            + [("new", float(i % 5)) for i in range(100)],
            "g string, value double",
        )
        got = {r["g"]: r for r in
               psi_drift(base, cur, "value", group_col="g").collect()}
        assert set(got) == {"old", "new"}
        new = got["new"]
        assert new["n_base"] == 0 and new["n_current"] == 100
        # all current mass vs a uniform smoothed base: loud drift
        assert new["psi_micro"] > 250_000
        # and the established segment stays in the stable band
        assert got["old"]["psi_micro"] < 100_000
