"""PII redaction (functions/pii.py): pattern hits, placeholder rewrite,
clean-text passthrough."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.functions.pii import (
    redact_pii,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "reach me at alice.smith+spam@sub.example.co.uk today"),
        (2, "call +1-555-867-5309 or +44-020-7946-0958 now"),
        (3, "server at 192.168.0.1 and 10.0.255.7"),
        (4, "clean text with no sensitive content at all"),
        (5, "bob@corp.io from 172.16.4.2 dialed +1-800-555-0100"),
    ]
    return rows


def test_counts_and_redaction(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}

    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 0 and out[1]["n_ips"] == 0
    assert "<EMAIL>" in out[1]["redacted"] and "@" not in out[1]["redacted"]

    assert out[2]["n_phones"] == 2
    assert out[2]["redacted"].count("<PHONE>") == 2

    assert out[3]["n_ips"] == 2
    assert out[3]["redacted"].count("<IP>") == 2

    r4 = out[4]
    assert (r4["n_emails"], r4["n_phones"], r4["n_ips"]) == (0, 0, 0)
    assert r4["redacted"] == "clean text with no sensitive content at all"

    r5 = out[5]
    assert (r5["n_emails"], r5["n_phones"], r5["n_ips"]) == (1, 1, 1)
    for tok in ("<EMAIL>", "<PHONE>", "<IP>"):
        assert tok in r5["redacted"]
