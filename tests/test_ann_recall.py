"""Recall@k measurement of the ANN paths (operators/ann.py:recall_sweep).

The sweep's claim is that it reports *the* recall of IVF/LSH against
exact brute force — so the tests recompute that recall independently in
numpy (float64, same (distance, id) tie-break) and require equality,
plus the structural invariants: recall is monotone in nprobe and hits
1.0 when every centroid is probed.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.ann import (
    hyperplanes,
    recall_sweep,
)

SF = "/root/testdata/sf0.001"
N_CENTROIDS = 16
K = 5
QMOD, QRES = 53, 11
PLANES = hyperplanes(64, 4, seed=42)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def sweep_inputs(emb):
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    queries = emb.filter(F.col("vec_id") % QMOD == QRES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return centroids, queries


@pytest.fixture(scope="module")
def np_corpus(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _np_topk(dists: np.ndarray, ids: np.ndarray, k: int) -> set:
    # tie-break (distance, id): ids are sorted ascending, stable sort
    order = np.lexsort((ids, dists))
    return set(ids[order[:k]].tolist())


def _np_recall(ids, mat, qids, k=K, nprobes=(1, 2, 4)):
    """Independent float64 recall computation, same declared tie-breaks."""
    cent_mask = ids < N_CENTROIDS
    cent_ids, cent = ids[cent_mask], mat[cent_mask]
    # IVF assignment: nearest centroid, ties (dist, centroid_id)
    a_d = np.linalg.norm(mat[:, None, :] - cent[None, :, :], axis=2)
    assign = np.array(
        [cent_ids[np.lexsort((cent_ids, a_d[i]))[0]] for i in range(len(ids))]
    )

    hits_ivf = {n: 0 for n in nprobes}
    hits_lsh = 0
    planes = np.array(PLANES, dtype=np.float64)
    buckets = ((mat @ planes.T) >= 0) @ (1 << np.arange(planes.shape[0]))
    for qid in qids:
        q = mat[ids == qid][0]
        d_l2 = np.linalg.norm(mat - q, axis=1)
        exact_l2 = _np_topk(d_l2, ids, K)
        norm = np.linalg.norm(mat, axis=1) * np.linalg.norm(q)
        d_cos = 1.0 - (mat @ q) / norm
        exact_cos = _np_topk(d_cos, ids, K)

        cd = np.linalg.norm(cent - q, axis=1)
        cent_rank = cent_ids[np.lexsort((cent_ids, cd))]
        for n in nprobes:
            probed = set(cent_rank[:n].tolist())
            mask = np.isin(assign, list(probed))
            approx = _np_topk(d_l2[mask], ids[mask], K)
            hits_ivf[n] += len(approx & exact_l2)

        qb = buckets[ids == qid][0]
        mask = buckets == qb
        approx = _np_topk(d_cos[mask], ids[mask], K)
        hits_lsh += len(approx & exact_cos)

    denom = K * len(qids)
    out = {("ivf", n): round(hits_ivf[n] / denom, 4) for n in nprobes}
    out[("lsh", 0)] = round(hits_lsh / denom, 4)
    return out


def test_recall_matches_numpy_ground_truth(spark, emb, sweep_inputs, np_corpus):
    centroids, queries = sweep_inputs
    ids, mat = np_corpus
    qids = sorted(int(i) for i in ids if i % QMOD == QRES)
    expected = _np_recall(ids, mat, qids)

    got = {
        (r["method"], r["nprobe"]): r["recall"]
        for r in recall_sweep(emb, queries, centroids, PLANES, k=K).collect()
    }
    assert got == expected


def test_ivf_recall_monotone_in_nprobe_and_total_probe_is_exact(
    spark, emb, sweep_inputs
):
    centroids, queries = sweep_inputs
    rows = recall_sweep(
        emb, queries, centroids, PLANES, k=K, nprobes=(1, 2, N_CENTROIDS)
    ).collect()
    ivf = {r["nprobe"]: r["recall"] for r in rows if r["method"] == "ivf"}
    assert ivf[1] <= ivf[2] <= ivf[N_CENTROIDS]
    # probing every centroid makes IVF exhaustive => exact top-k
    assert ivf[N_CENTROIDS] == 1.0
    lsh = [r["recall"] for r in rows if r["method"] == "lsh"]
    assert len(lsh) == 1 and 0.0 <= lsh[0] <= 1.0
