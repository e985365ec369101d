"""Product quantization: codebook shape, encode argmin semantics, ADC
vs exact distance, compression ratio."""

from __future__ import annotations

import numpy as np
import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.pq import (
    fixed_codebooks,
    pq_encode,
    pq_search,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
M, KSUB = 4, 16


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    return fixed_codebooks(emb, m=M, ksub=KSUB)


def test_codebook_shape(books, emb):
    dim = len(emb.first()["embedding"])
    assert len(books) == M
    assert all(len(b) == KSUB for b in books)
    assert all(len(c) == dim // M for b in books for c in b)


def test_encode_matches_numpy_argmin(spark, emb, books):
    got = {r["vec_id"]: list(r["pq_code"]) for r in pq_encode(emb, books).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    dsub = len(books[0][0])
    for r in rows[:50]:
        v = np.array(r["embedding"], dtype=np.float64)
        expect = []
        for j in range(M):
            sub = v[j * dsub : (j + 1) * dsub]
            d = [float(((sub - np.array(c)) ** 2).sum()) for c in books[j]]
            expect.append(int(np.argmin(d)))
        assert got[r["vec_id"]] == expect, f"vec {r['vec_id']}"


def test_centroid_vectors_encode_to_themselves(spark, emb, books):
    got = {r["vec_id"]: list(r["pq_code"]) for r in pq_encode(emb, books).collect()}
    for c in range(KSUB):
        assert got[c] == [c] * M  # vector c IS centroid c in every subspace


def test_adc_search_and_recall(spark, emb, books):
    encoded = pq_encode(emb, books).select("vec_id", "pq_code")
    probe = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    top = pq_search(encoded, list(probe), books, k=10, payload_cols=["vec_id"]).collect()
    ids = [r["vec_id"] for r in top]
    assert ids[0] == 3  # the probe's own code has ADC distance == quantization error, minimal
    dists = [r["adc_dist_sq"] for r in top]
    assert dists == sorted(dists)
    # ADC distance of the probe to itself == its quantization error (> 0, small)
    assert 0 <= dists[0] < dists[1]


def test_compression_ratio():
    # 64 float32 -> 4 uint8 codes: 64x
    assert (64 * 4) / M == 64
