"""Distance expressions vs a NumPy reference (tolerance-checked)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.functions.vector import (
    DISTANCE_FNS,
)
from pyspark.sql import functions as F


def _rng_vecs(n, dim, seed=7):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, size=(n, dim)).astype(np.float32)


@pytest.fixture(scope="module")
def pairs_df(spark):
    a = _rng_vecs(20, 16, seed=1)
    b = _rng_vecs(20, 16, seed=2)
    rows = [(i, a[i].tolist(), b[i].tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "id int, a array<float>, b array<float>")
    return df, a.astype(np.float64), b.astype(np.float64)


def test_l2_matches_numpy(spark, pairs_df):
    df, a, b = pairs_df
    got = {r["id"]: r["d"] for r in df.select("id", DISTANCE_FNS["l2"]("a", "b").alias("d")).collect()}
    for i in range(len(a)):
        assert math.isclose(got[i], float(np.linalg.norm(a[i] - b[i])), rel_tol=1e-12)


def test_cosine_matches_numpy(spark, pairs_df):
    df, a, b = pairs_df
    got = {r["id"]: r["d"] for r in df.select("id", DISTANCE_FNS["cosine"]("a", "b").alias("d")).collect()}
    for i in range(len(a)):
        expect = 1.0 - float(a[i] @ b[i]) / (np.linalg.norm(a[i]) * np.linalg.norm(b[i]))
        assert math.isclose(got[i], expect, rel_tol=1e-12)


def test_dot_is_negative_inner_product(spark, pairs_df):
    df, a, b = pairs_df
    got = {r["id"]: r["d"] for r in df.select("id", DISTANCE_FNS["dot"]("a", "b").alias("d")).collect()}
    for i in range(len(a)):
        assert math.isclose(got[i], -float(a[i] @ b[i]), rel_tol=1e-12)


def test_self_distance_zero(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "v array<float>")
    row = df.select(
        DISTANCE_FNS["l2"]("v", "v").alias("l2"),
        DISTANCE_FNS["cosine"]("v", "v").alias("cos"),
    ).first()
    assert row["l2"] == 0.0
    assert abs(row["cos"]) < 1e-15
