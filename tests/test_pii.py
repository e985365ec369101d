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


def test_ipv4_anchoring_and_octet_range(spark):
    """ADVICE r4: anchored pattern must NOT redact inside longer dotted
    runs and must reject out-of-range octets."""
    rows = [
        (1, "version 1234.5.6.7890 is not an address"),
        (2, "bad ip 999.999.999.999 stays"),
        (3, "edge ips 0.0.0.0 and 255.255.255.255 are real"),
        (4, "host 10.0.12.84, trailing punctuation"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}

    assert out[1]["n_ips"] == 0 and out[1]["redacted"] == rows[0][1]
    assert out[2]["n_ips"] == 0 and out[2]["redacted"] == rows[1][1]
    assert out[3]["n_ips"] == 2 and out[3]["redacted"].count("<IP>") == 2
    assert out[4]["n_ips"] == 1 and "<IP>," in out[4]["redacted"]


def test_spark_duckdb_pattern_parity(spark):
    """The portable-subset claim, verified: identical counts + redacted
    text from Spark (Java regex) and DuckDB (RE2) on boundary-heavy
    inputs."""
    import duckdb

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.functions.pii import (
        PII_PATTERNS,
    )

    texts = [
        "v 1234.5.6.7890 vs 10.0.12.84 and 999.1.2.3",
        "a@b.io c.d+e@f-g.co.uk not@an@email",
        "+1-555-867-5309x +44-020-7946-0958",
        "0.0.0.0 256.1.1.1 25.6.1.1.1",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}

    con = duckdb.connect()
    for i, t in enumerate(texts):
        red = t
        for pat, tok in PII_PATTERNS.values():
            red = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [red, pat, tok]
            ).fetchone()[0]
        counts = {
            kind: con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, PII_PATTERNS[kind][0]]
            ).fetchone()[0]
            for kind in PII_PATTERNS
        }
        assert got[i]["redacted"] == red, f"doc {i}: redaction differs"
        assert (got[i]["n_emails"], got[i]["n_phones"], got[i]["n_ips"]) == (
            counts["email"], counts["phone"], counts["ipv4"],
        ), f"doc {i}: counts differ"
