"""Relational / dataflow operators."""

from .ann import (
    assign_ivf,
    hyperplanes,
    ivf_index_append,
    ivf_index_search,
    ivf_index_write,
    ivf_search,
    lsh_bucket,
    lsh_search,
    recall_sweep,
)
from .cluster import connected_components, duplicate_clusters
from .decontam import benchmark_grams, contamination_flags
from .dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_stage,
    simhash,
    simhash_neardup_pairs,
    simhash_packed,
)
from .groupwise import (
    groupwise_zscore_native,
    groupwise_zscore_pandas,
    hash_sample,
    mixture_sample,
    train_test_split_hash,
)
from .ingest import embed_chunks, ingest_pages, pages_to_chunks, validate_corpus, write_corpus
from .kmeans import kmeans_fit
from .knn import knn, knn_join, knn_join_numpy
from .multimodal import (
    audio_features,
    image_features,
    image_jpeg_roundtrip_check,
    image_resize,
    synth_media_df,
    video_frame_sample,
)
from .nsw import nsw_build, nsw_search
from .quant import (
    binary_encode,
    hamming_knn,
    ivf_sq8_index_search,
    ivf_sq8_index_write,
    matryoshka_knn,
    sq8_encode,
    sq8_index_search,
    sq8_index_write,
    sq8_knn,
)
from .retrieval import bm25_topk, rrf_fuse, with_rank
from .serving import blob_url, build_prompt, llm_extract, sse_escape, sse_events
from .skew import salted_agg, salted_broadcast_join
from .pq import fixed_codebooks, ivfpq_encode, ivfpq_search, pq_encode, pq_search
from .status import STATUS_VALUES, completed_listing, failed_listing, status_upsert
from .textstats import fingerprint, language_id, quality_score, repetition_stats, token_stats
from .upsert import delta_available, merge_status, read_status

__all__ = [
    "STATUS_VALUES",
    "assign_ivf",
    "audio_features",
    "blob_url",
    "build_prompt",
    "completed_listing",
    "connected_components",
    "duplicate_clusters",
    "embed_chunks",
    "embedding_neardup_pairs",
    "exact_dedup",
    "failed_listing",
    "fingerprint",
    "groupwise_zscore_native",
    "groupwise_zscore_pandas",
    "hyperplanes",
    "bm25_topk",
    "image_features",
    "image_jpeg_roundtrip_check",
    "image_resize",
    "ingest_pages",
    "fixed_codebooks",
    "ivf_index_append",
    "ivf_index_search",
    "ivf_index_write",
    "ivf_search",
    "ivfpq_encode",
    "ivfpq_search",
    "kmeans_fit",
    "knn",
    "knn_join",
    "knn_join_numpy",
    "language_id",
    "llm_extract",
    "lsh_bucket",
    "lsh_candidate_pairs",
    "lsh_search",
    "delta_available",
    "merge_status",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "nsw_build",
    "benchmark_grams",
    "binary_encode",
    "contamination_flags",
    "hamming_knn",
    "ivf_sq8_index_search",
    "ivf_sq8_index_write",
    "matryoshka_knn",
    "sq8_encode",
    "sq8_index_search",
    "sq8_index_write",
    "sq8_knn",
    "nsw_search",
    "read_status",
    "recall_sweep",
    "rrf_fuse",
    "with_rank",
    "pages_to_chunks",
    "pq_encode",
    "pq_search",
    "quality_score",
    "repetition_stats",
    "salted_agg",
    "salted_broadcast_join",
    "shingle_stage",
    "simhash",
    "simhash_neardup_pairs",
    "simhash_packed",
    "sse_escape",
    "sse_events",
    "status_upsert",
    "synth_media_df",
    "token_stats",
    "validate_corpus",
    "video_frame_sample",
    "write_corpus",
]
