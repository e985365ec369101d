"""Streaming composability of the round-4 scrubbing stages: PII
redaction and mixture sampling are stateless narrow transforms, so the
same functions run unchanged under Structured Streaming — stream output
must equal the batch run over identical input (foreachBatch-parity)."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.functions.pii import (
    redact_pii,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
    mixture_sample,
)
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("docs_stream"))
    rows = [
        (i,
         f"doc {i} reach user{i}@example.com at 10.0.0.{i % 256} now",
         f"src{i % 4}")
        for i in range(200)
    ]
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _run_stream(spark, docs_dir, transform, out, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .parquet(docs_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_pii_redaction_equals_batch(spark, docs_dir, tmp_path):
    out, ckpt = str(tmp_path / "red"), str(tmp_path / "ck1")
    _run_stream(spark, docs_dir, lambda df: redact_pii(df), out, ckpt)
    got = {r["doc_id"]: (r["n_emails"], r["n_ips"], r["redacted"])
           for r in spark.read.parquet(out).collect()}
    batch = {r["doc_id"]: (r["n_emails"], r["n_ips"], r["redacted"])
             for r in redact_pii(spark.read.parquet(docs_dir)).collect()}
    assert got == batch and len(got) == 200
    assert all("<EMAIL>" in v[2] and "<IP>" in v[2] for v in got.values())


def test_stream_mixture_sample_equals_batch(spark, docs_dir, tmp_path):
    rates = {"src0": 1.0, "src1": 0.3}
    out, ckpt = str(tmp_path / "mix"), str(tmp_path / "ck2")
    _run_stream(
        spark, docs_dir,
        lambda df: mixture_sample(df, rates, default_rate=0.1).select("doc_id", "source"),
        out, ckpt,
    )
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    batch = sorted(
        r["doc_id"]
        for r in mixture_sample(spark.read.parquet(docs_dir), rates, default_rate=0.1)
        .select("doc_id").collect()
    )
    assert got == batch and len(got) > 0
