"""Funnel + cohort retention (operators/funnel.py): hand-computed
semantics on tiny frames — ordered-completion rules, monotone
narrowing, cohort triangle arithmetic."""

from __future__ import annotations

import datetime as dt

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t) for (u, d, h, t) in rows],
        "user_id int, ts timestamp, event_type string",
    )


class TestFunnel:
    def test_order_matters(self, spark):
        # u1 converts all 3 in order; u2 clicked BEFORE viewing (click
        # must not count), then never clicked again -> stops at view;
        # u3 only views.
        ev = _ev(spark, [
            (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "purchase"),
            (2, 1, 1, "click"), (2, 1, 2, "view"), (2, 1, 3, "purchase"),
            (3, 2, 1, "view"),
        ])
        got = {
            r["step"]: r["n_users"]
            for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
        }
        assert got == {"view": 3, "click": 1, "purchase": 1}

    def test_earliest_completion_semantics(self, spark):
        # u1 views twice; the EARLIEST view anchors step 2, so the click
        # between the views counts.
        ev = _ev(spark, [
            (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "view"),
        ])
        got = {
            r["step"]: r["n_users"]
            for r in funnel_counts(ev, ["view", "click"]).collect()
        }
        assert got == {"view": 1, "click": 1}

    def test_strictly_after(self, spark):
        # click at the SAME timestamp as the view does not convert
        ev = _ev(spark, [(1, 1, 1, "view"), (1, 1, 1, "click")])
        got = {
            r["step"]: r["n_users"]
            for r in funnel_counts(ev, ["view", "click"]).collect()
        }
        assert got == {"view": 1, "click": 0}

    def test_monotone_and_idx(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import _events as load_events

        ev = load_events(spark, sf_dir)
        rows = sorted(
            funnel_counts(ev, ["view", "click", "purchase"]).collect(),
            key=lambda r: r["step_idx"],
        )
        assert [r["step_idx"] for r in rows] == [0, 1, 2]
        assert rows[0]["n_users"] >= rows[1]["n_users"] >= rows[2]["n_users"] > 0

    def test_empty_steps_rejected(self, spark):
        ev = _ev(spark, [(1, 1, 1, "view")])
        with pytest.raises(ValueError):
            funnel_counts(ev, [])


class TestRetention:
    def test_triangle_hand_computed(self, spark):
        # Weeks of Jan 2024: Mon Jan 1, Mon Jan 8, Mon Jan 15.
        # u1 first week0, active week0+week1; u2 first week0 only;
        # u3 first week1, active week1+week2.
        ev = _ev(spark, [
            (1, 2, 1, "view"), (1, 10, 1, "click"),
            (2, 3, 1, "view"),
            (3, 9, 1, "view"), (3, 16, 1, "view"),
        ])
        got = {
            (r["cohort"], r["offset"]): r["n_users"]
            for r in cohort_retention(ev, unit="week").collect()
        }
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-08", 0): 1,
            ("2024-01-08", 1): 1,
        }

    def test_offset_zero_is_cohort_size(self, spark, sf_dir):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import _events as load_events

        ev = load_events(spark, sf_dir)
        rows = cohort_retention(ev, unit="week").collect()
        week0 = {(r["cohort"], r["offset"]): r["n_users"] for r in rows}
        n_users = ev.select("user_id").distinct().count()
        assert sum(v for (c, o), v in week0.items() if o == 0) == n_users
        for (c, o), v in week0.items():
            if o > 0:
                assert v <= week0[(c, 0)]


class TestFunnelDeadline:
    def test_deadline_excludes_late_steps(self, spark):
        # u1 clicks 30 min after view (in window), u2 clicks 2 h after
        # view (outside a 1 h deadline).
        ev = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 1, 1, 9, 0), "view"),
                (1, dt.datetime(2024, 1, 1, 9, 30), "click"),
                (2, dt.datetime(2024, 1, 1, 9, 0), "view"),
                (2, dt.datetime(2024, 1, 1, 11, 0), "click"),
            ],
            "user_id int, ts timestamp, event_type string",
        )
        got = {
            r["step"]: r["n_users"]
            for r in funnel_counts(ev, ["view", "click"], within_seconds=3600).collect()
        }
        assert got == {"view": 2, "click": 1}

    def test_deadline_anchors_on_first_step(self, spark):
        # click at +50 min, purchase at +70 min: within 1 h of the CLICK
        # but outside 1 h of the VIEW -> must not convert.
        ev = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 1, 1, 9, 0), "view"),
                (1, dt.datetime(2024, 1, 1, 9, 50), "click"),
                (1, dt.datetime(2024, 1, 1, 10, 10), "purchase"),
            ],
            "user_id int, ts timestamp, event_type string",
        )
        got = {
            r["step"]: r["n_users"]
            for r in funnel_counts(
                ev, ["view", "click", "purchase"], within_seconds=3600
            ).collect()
        }
        assert got == {"view": 1, "click": 1, "purchase": 0}

    def test_no_deadline_unchanged(self, spark):
        ev = _ev(spark, [(1, 1, 1, "view"), (1, 5, 1, "click")])
        got = {
            r["step"]: r["n_users"]
            for r in funnel_counts(ev, ["view", "click"]).collect()
        }
        assert got == {"view": 1, "click": 1}
