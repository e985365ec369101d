"""Registry package: per-family query modules composing the shared
REGISTRY (split from the former monolithic queries.py; import order
== original execution order; gate_window runs last and pins the
driver's 50-entry CORRECTNESS window)."""

from . import _base
from . import flagship_knn
from . import relational_core
from . import dedup
from . import textstats
from . import ann_ivf_lsh
from . import ingest_pipeline
from . import multimodal
from . import serving
from . import token_usage
from . import business_analytics
from . import cluster_groupwise_skew
from . import tpch_shapes
from . import pq_quantization
from . import scalar_asof_range
from . import quality_sampling
from . import vocab_subquery
from . import retrieval
from . import quant_search
from . import pii_decontam_mixture
from . import train_export
from . import tpch_q7_q13_ivfsq8
from . import c4_ccnet_linededup
from . import corpus_prep
from . import url_profile_misc
from . import bpe_vocab
from . import unigram_vocab
from . import wordpiece_vocab
from . import lm_perplexity
from . import graph_analytics
from . import sketches
from . import ml_classify
from . import bloom_packing
from . import tpch_partsupp
from . import preference_rank
from . import analytics_breadth
from . import selection_privacy
from . import graph_centrality
from . import drift_survival
from . import gate_window

# Re-export every module-level name (underscored included — tests and
# tooling reach helpers like _events/_eval_* directly), later modules
# winning, mirroring the single-file rebinding order.
for _m in (_base, flagship_knn, relational_core, dedup, textstats, ann_ivf_lsh, ingest_pipeline, multimodal, serving, token_usage, business_analytics, cluster_groupwise_skew, tpch_shapes, pq_quantization, scalar_asof_range, quality_sampling, vocab_subquery, retrieval, quant_search, pii_decontam_mixture, train_export, tpch_q7_q13_ivfsq8, c4_ccnet_linededup, corpus_prep, url_profile_misc, bpe_vocab, graph_analytics, sketches, ml_classify, bloom_packing, tpch_partsupp, preference_rank, analytics_breadth, selection_privacy, graph_centrality, drift_survival, gate_window):
    globals().update(
        {k: v for k, v in vars(_m).items() if not k.startswith('__')}
    )
del _m
