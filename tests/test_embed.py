"""Deterministic embedder: UDF == pure function, unit norm, retry hook."""

from __future__ import annotations

import math

import numpy as np
import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.functions.embed import (
    DEFAULT_DIM,
    hash_embed_text,
    make_embedder,
)
from pyspark.sql import functions as F


def test_deterministic_and_dim():
    v1 = hash_embed_text("hello world", 64)
    v2 = hash_embed_text("hello world", 64)
    assert v1 == v2
    assert len(v1) == 64


def test_unit_norm_nonempty():
    v = np.array(hash_embed_text("some text with tokens", 64))
    assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-5)


def test_empty_text_zero_vector():
    assert hash_embed_text("", 64) == [0.0] * 64


def test_udf_matches_pure_function(spark):
    texts = ["alpha beta", "gamma", "", "alpha beta"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    embed = make_embedder(dim=32)
    got = {r["id"]: r["v"] for r in df.select("id", embed(F.col("text")).alias("v")).collect()}
    for i, t in enumerate(texts):
        expect = hash_embed_text(t, 32)
        assert got[i] == pytest.approx(expect), f"text {t!r}"


def test_retry_exhaustion_raises(spark):
    calls = {"n": 0}

    def failing(texts):
        calls["n"] += 1
        raise ValueError("boom")

    embed = make_embedder(dim=8, embed_fn=failing, max_retries=3, backoff_s=0.0)
    df = spark.createDataFrame([(1, "t")], "id int, text string")
    with pytest.raises(Exception, match="embedding failed after 3 attempts"):
        df.select(embed(F.col("text")).alias("v")).collect()
