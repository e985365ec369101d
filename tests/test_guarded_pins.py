"""r14 (VERDICT r13 item 9): scale-conditional lineage pins.

The pin decision (queries/_base.py::_pin_if_large) only chooses whether
a multi-consumer relation is lazily checkpointed — never what it
computes.  These tests force BOTH branches on the same fixture and
assert identical results for every query that gained a guarded pin,
plus the guard's own size semantics.
"""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
    REGISTRY,
    _base,
)

SF = "/root/testdata/sf0.001"

GUARDED = [
    "text_pmi_collocations",
    "events_attribution_position",
    "events_funnel_conversion",
    "events_funnel_deadline",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", GUARDED)
def test_pin_branch_matches_plain_branch(spark, name, monkeypatch):
    fn, _ = REGISTRY[name]
    monkeypatch.setattr(_base, "_PIN_SRC_BYTES", 1 << 60)  # plain branch
    plain = _rows(fn(spark, SF))
    monkeypatch.setattr(_base, "_PIN_SRC_BYTES", 0)  # pin branch
    pinned = _rows(fn(spark, SF))
    assert plain == pinned
    assert plain  # non-degenerate fixture


def test_guard_reads_source_size():
    b = _base._src_bytes(SF, "events")
    assert b is not None and b > 0
    # a missing table is treated as unknown -> pin (the large default)
    assert _base._src_bytes(SF, "no_such_table") is None
    pin_small = _base._pin_if_large(SF, "events")  # tiny fixture: identity
    sentinel = object()

    class _Df:
        def localCheckpoint(self, eager=False):  # noqa: ARG002
            return sentinel

    assert pin_small(_Df()) is not sentinel or _base._PIN_SRC_BYTES == 0
