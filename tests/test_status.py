"""Status state machine: last-write-wins upsert + the two listings."""

from __future__ import annotations

import datetime as dt

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.status import (
    STATUS_VALUES,
    TERMINAL_STATES,
    completed_listing,
    failed_listing,
    status_upsert,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # chunk a: full happy path
        ("a", "f1.pdf", "PAGE_SEPARATE_FINISHED", 1, _ts(0)),
        ("a", "f1.pdf", "FINISH_OAI_INVOCATION", 1, _ts(1)),
        ("a", "f1.pdf", "FINISH_DB_INSERTION", 1, _ts(2)),
        ("a", "f1.pdf", "COMPLETED", 1, _ts(3)),
        # chunk b: failed at DB insert (terminal failure — the reference's
        # unconditional-COMPLETED bug is deliberately not replicated)
        ("b", "f1.pdf", "PAGE_SEPARATE_FINISHED", 2, _ts(0)),
        ("b", "f1.pdf", "RETRY_OAI_INVOCATION", 2, _ts(1)),
        ("b", "f1.pdf", "FINISH_OAI_INVOCATION", 2, _ts(2)),
        ("b", "f1.pdf", "FAILED_DB_INSERTION", 2, _ts(3)),
        # chunk c: several transitions at the SAME timestamp — ordinal
        # tiebreak must resolve to the furthest state
        ("c", "f2.pdf", "PAGE_SEPARATE_FINISHED", 1, _ts(5)),
        ("c", "f2.pdf", "FINISH_OAI_INVOCATION", 1, _ts(5)),
        ("c", "f2.pdf", "COMPLETED", 1, _ts(5)),
    ]
    return spark.createDataFrame(
        rows, "id string, fileName string, status string, pageNumber int, updated_at timestamp"
    )


def test_upsert_resolves_latest(spark, events):
    cur = {r["id"]: r["status"] for r in status_upsert(events).collect()}
    assert cur == {"a": "COMPLETED", "b": "FAILED_DB_INSERTION", "c": "COMPLETED"}


def test_every_chunk_one_terminal_state(spark, events):
    cur = status_upsert(events).collect()
    assert len(cur) == 3
    assert all(r["status"] in TERMINAL_STATES for r in cur)


def test_listings_partition_and_sort(spark, events):
    cur = status_upsert(events)
    done = completed_listing(cur).collect()
    failed = failed_listing(cur).collect()
    assert [r["id"] for r in done] == ["a", "c"]  # (f1,1) then (f2,1)
    assert [r["id"] for r in failed] == ["b"]
    # L1 ∪ L2 = all, disjoint
    assert len(done) + len(failed) == 3


def test_status_values_cover_reference_enum(spark):
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.status import (
        _TIE_ORDER,
    )

    # STATUS_VALUES pinned to the reference enum ordinal
    # (models/CosmosDBDocumentStatus.java:5-10) — FAILED before COMPLETED
    assert STATUS_VALUES == [
        "PAGE_SEPARATE_FINISHED",
        "RETRY_OAI_INVOCATION",
        "FINISH_OAI_INVOCATION",
        "FINISH_DB_INSERTION",
        "FAILED_DB_INSERTION",
        "COMPLETED",
    ]
    # the tie-break precedence (separate map) ranks terminal failure above
    # terminal success
    assert set(_TIE_ORDER) == set(STATUS_VALUES)
    assert _TIE_ORDER.index("FAILED_DB_INSERTION") > _TIE_ORDER.index("COMPLETED")


def test_failed_outranks_completed_on_same_timestamp(spark):
    # a batch that unions the happy-path COMPLETED leg with a quarantine
    # FAILED_DB_INSERTION event at the same timestamp must resolve FAILED
    rows = [
        ("q", "f3.pdf", "PAGE_SEPARATE_FINISHED", 1, _ts(0)),
        ("q", "f3.pdf", "COMPLETED", 1, _ts(0)),
        ("q", "f3.pdf", "FAILED_DB_INSERTION", 1, _ts(0)),
    ]
    ev = spark.createDataFrame(
        rows, "id string, fileName string, status string, pageNumber int, updated_at timestamp"
    )
    cur = status_upsert(ev).collect()
    assert len(cur) == 1 and cur[0]["status"] == "FAILED_DB_INSERTION"
