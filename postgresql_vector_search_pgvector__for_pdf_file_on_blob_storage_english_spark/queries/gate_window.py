# Auto-split from the monolithic queries.py (VERDICT r5 #9);
# registration side effects run at import, in package order.
from __future__ import annotations

from ._base import Entry, REGISTRY  # noqa: F401
# Registry ordering — the driver's CORRECTNESS gate window
# ==========================================================================
# CONSTRAINT (VERDICT r4 items 1+2): the driver's per-round CORRECTNESS
# gate checks exactly the FIRST 50 registry entries, in dict insertion
# order.  Registration above is grouped by theme for readability, so the
# insertion order is NOT the priority order; this block rebuilds REGISTRY
# so the window contains
#
#   1. every implemented SURVEY §2 operator (S1-S8, P1-P8, Q1-Q8, L1-L3
#      -> 25 entries; Q9 is excluded by SURVEY §2.3),
#   2. one representative of every LLM-data-pipeline family the engine
#      claims as first-class: exact dedup, MinHash-LSH, SimHash, Jaccard,
#      embedding near-dup, SemDeDup, decontamination, PII (batch AND
#      streaming-replay), language ID / quality / tokens, persisted IVF
#      and LSH indexes, recall measurement, SQ8 quantization, persisted
#      IVF-PQ (round 6), BPE vocabulary training (round 6), fixed-point
#      PageRank (round 6), HyperLogLog sketch (round 6), BM25 + RRF,
#      and image/audio/video multimodal (-> 25 entries).
#
#      Round-6 window rotation: six slots whose family stays covered by
#      a sibling entry (ann_ivf_search ~ ann_ivf_index_search,
#      ann_lsh_search ~ ann_lsh_index_search, quant_sq8_knn_batch ~
#      quant_sq8_knn_top5, text_fingerprint ~ text_token_stats,
#      dedup_ngram_jaccard_pairs ~ dedup_minhash_lsh_candidates — the
#      verification stage of the same banded family —,
#      dedup_embedding_cosine_pairs ~ dedup_semantic_clusters) were
#      swapped for round-6 marquee operators, including the first
#      driver slots for the sampling and classification families, so
#      the driver's own snapshot — not just the committed local gate —
#      evidences them.
#
#      Round-7 rotation (VERDICT r6 item 7): five slots whose family
#      was driver-evidenced in the r6 snapshot and keeps a sibling
#      (ann_ivf_index_search ~ ann_ivfpq_index_search, ann_recall_sweep
#      — recall measurement evidenced r6 —, quant_sq8_knn_top5 — sq8
#      evidenced r6 —, dedup_simhash_neardup_pairs — dedup keeps
#      exact + minhash + semantic —, hybrid_rrf_knn_bm25 ~
#      bm25_topk_docs) rotate out for the five never-driver-evidenced
#      families: SCD2 history, count-min sketch, z-order layout,
#      bloom runtime semi-join, and sequence packing.
#
#      Round-8 rotation (VERDICT r7 item 1): nine slots driver-green in
#      the r7 snapshot rotate out for the nine never-driver-evidenced
#      r7 families the judge named.  Out → in, with the family cover:
#        vocab_bpe_merges        → vocab_unigram_pieces   (vocab family)
#        ann_lsh_index_search    → ann_hnsw_index_search  (ANN keeps
#                                   ivfpq + hnsw + compact)
#        layout_zorder_report    → ann_ivf_index_compact  (index-maint
#                                   family's first slot; layout was
#                                   evidenced r7)
#        dedup_semantic_clusters → dedup_fuzzy_name_pairs (dedup keeps
#                                   exact + minhash + fuzzy)
#        sketch_countmin_terms   → sketch_quantiles_by_nation (sketch
#                                   keeps HLL + quantile; countmin
#                                   evidenced r7)
#        sketch_hll_distinct_terms → sketch_hll_lang_overlap (HLL set
#                                   algebra; plain HLL evidenced r6+r7)
#        events_scd2_state_history → tpch_q21_waiting_suppliers (SCD2
#                                   evidenced r7; Q21 analog's first slot)
#        mm_video_frame_sample   → mm_image_ahash_dupes   (mm keeps
#                                   image + audio + ahash)
#        pack_concat_windows     → stream_ivf_upsert_replay (packing
#                                   evidenced r7; streaming-index
#                                   replay's first slot)
#
#      Round-9 rotation (VERDICT r8 item 2 + 6): eleven slots
#      driver-green in BOTH the r7 and r8 snapshots rotate out for the
#      never-driver-evidenced r8 families the judge named.  Out → in,
#      with the family cover for every out slot:
#        dedup_minhash_lsh_candidates → dedup_edjoin_blocking_quality
#                     (dedup keeps exact; MinHash evidenced r6-r8; the
#                      audit row gates pairs_completeness == 1.0)
#        dedup_fuzzy_name_pairs  → graph_order_episodes    (fuzzy-join
#                      family stays covered by the Ed-Join audit row)
#        text_language_id        → text_lm_perplexity_kn   (text keeps
#                      tokens + PII; langid evidenced r6-r8)
#        text_quality_score      → vocab_wordpiece_merges  (quality
#                      evidenced r6-r8; completes the tokenizer trio's
#                      driver evidence: BPE r7, unigram r8, WP r9)
#        sketch_hll_lang_overlap → sketch_kmv_priority_overlap (sketch
#                      keeps quantiles; HLL evidenced r6-r8; KMV is the
#                      unbiased-intersection theta family)
#        vocab_unigram_pieces    → pref_bt_source_strength (unigram
#                      evidenced r8; Bradley-Terry's first slot)
#        ann_hnsw_index_search   → stream_hnsw_upsert_replay (same
#                      HNSW artifact, now exercised through the
#                      streaming upsert + replay path — VERDICT r8 #6)
#        graph_pagerank_trade    → graph_label_propagation (PageRank
#                      evidenced r6-r8; graph family widens)
#        ml_nb_langid_confusion  → recsys_item_item_cosine (NB
#                      evidenced r6-r8; item-item CF's first slot)
#        sample_weighted_orders  → agg_median_histogram_select
#                      (sampling evidenced r6-r8; histogram-descent
#                      order statistic's first slot)
#        mm_image_features       → train_prune_prototypes  (mm keeps
#                      audio + aHash; D4 SSL-prototypes second stage)
#
# Round-10 rotation (VERDICT r9 item 1 + 4): twelve slots driver-green
# in the r9 snapshot rotate out for the never-driver-evidenced r9
# families the judge named.  Out → in, with the family cover for every
# out slot:
#   dedup_edjoin_blocking_quality → dedup_winnow_shared_fp (fuzzy-join
#                 family evidenced r9; winnowing is the fingerprinting
#                 marquee — VERDICT's #1 pick)
#   agg_median_histogram_select → train_dsir_select (histogram-descent
#                 evidenced r9; DSIR data selection's first slot)
#   recsys_item_item_cosine → linkage_fs_confusion (item-item CF
#                 evidenced r9; Fellegi-Sunter linkage's first slot)
#   sketch_kmv_priority_overlap → stream_heavy_hitters_replay (KMV
#                 evidenced r9; Misra-Gries first slot + widens
#                 streaming evidence — VERDICT r9 #4)
#   sketch_quantiles_by_nation → events_cusum_changepoint (quantile
#                 sketch evidenced r8+r9; monitoring family's first slot)
#   text_lm_perplexity_kn → retrieval_phrase_match (KN perplexity
#                 evidenced r9; positional-postings phrase search)
#   vocab_wordpiece_merges → privacy_k_anonymity_audit (tokenizer trio
#                 fully evidenced r7/r8/r9; privacy family's first slot)
#   pref_bt_source_strength → dedup_incremental_new_batch (Bradley-
#                 Terry evidenced r9; persisted-state admission)
#   graph_order_episodes → graph_kcore_copurchase (star-CC evidenced
#                 r9; k-core peel's first slot)
#   graph_label_propagation → sql_recursive_bfs_depth (label-prop
#                 evidenced r9; cross-engine WITH RECURSIVE first slot)
#   stream_hnsw_upsert_replay → stream_cusum_replay (HNSW replay
#                 evidenced r9; streaming-monitor family's first slot,
#                 second new streaming row — VERDICT r9 #4)
#   train_prune_prototypes → text_textrank_keywords (SSL-prototypes
#                 evidenced r9; TextRank keyword extraction)
#
# Round-11 rotation (VERDICT r10 item 3 — executes the queued list
# verbatim): eleven slots driver-green in the r10 snapshot rotate out
# for the never-driver-evidenced r10 families the judge named, plus
# the two serving-path probe twins.  Out → in, with family cover:
#   dedup_winnow_shared_fp → eval_auc_doclen_trusted (winnowing
#                 evidenced r10; scorer-evaluation family's first slot)
#   train_dsir_select → train_mine_bitext_margin (DSIR evidenced r10;
#                 margin-based bitext mining's first slot)
#   stream_cusum_replay → stream_sessionize_replay (streaming CUSUM
#                 evidenced r10; the applyInPandasWithState stateful
#                 sessionization marquee)
#   mm_image_ahash_dupes → mm_image_phash_dupes (aHash evidenced
#                 r8+r10; pHash DCT variant)
#   events_cusum_changepoint → stats_mannwhitney_price (CUSUM
#                 evidenced r10 twice; nonparametric-stats family's
#                 first driver slot — freshly swapped to global_rank
#                 cumulation this round, so driver evidence matters)
#   linkage_fs_confusion → train_kcenter_coreset (FS linkage evidenced
#                 r10; k-center coreset's first slot, post-ADVICE-fix)
#   graph_kcore_copurchase → orders_cohort_ltv (k-core evidenced r10;
#                 cohort-LTV family's first slot)
#   sql_recursive_bfs_depth → graph_walk_corpus (recursive BFS
#                 evidenced r10; the random-walk corpus — r10's
#                 slowest bench line gets correctness evidence)
#   retrieval_phrase_match → asof_join_forward_tolerance (phrase
#                 search evidenced r10; as-of join family's first
#                 driver slot)
#   privacy_k_anonymity_audit → ann_ivf_probe (k-anonymity evidenced
#                 r10; long-queued serving-path probe twin)
#   text_textrank_keywords → bm25_probe (TextRank evidenced r10;
#                 long-queued serving-path probe twin)
#   text_token_stats → stats_spearman_rank_corr (token stats evidenced
#                 r6-r10; text family keeps pii_redaction +
#                 stream_pii_scrub + readability's local gate.  Spearman
#                 was driver-green r10 but was REWRITTEN onto
#                 global_rank this round — the headline fix re-earns
#                 its evidence on the new code)
#
# Still queued for r12+ (never driver-evidenced): the remaining probe
# twins (ann_lsh_probe, ann_hnsw_probe, ann_ivfpq_probe,
# quant_sq8_probe, retrieval_phrase_probe), dedup_lsh_verified_pairs,
# stream_incremental_dedup_replay, url_canonical_dupes,
# text_unicode_nfc_stats, dedup_edjoin_part_pairs,
# stream_bt_matrix_replay / stream_kmv_replay,
# join_not_in_vs_not_exists (NAAJ), graph_khop_reach,
# events_attribution_last_touch, graph_ppr_copurchase,
# corpus_snapshot_diff, train_shard_hrw_churn, layout_hilbert_report,
# serve_mmr_rerank, serve_context_expansion, ann_ivfpq_recall_trained,
# graph_hits_trade, customer_survival_km, stats_ks_price_drift,
# stats_gini_revenue, stats_benford_price_audit, dedup_cdc_chunk_dupes,
# orders_ewma_revenue_trend, stats_mutual_info_lang_source,
# privacy_l_diversity_audit, dedup_ngram_containment_pairs,
# dedup_cluster_best_quality, train_curriculum_interleave,
# train_dsir_token_budget, plus the r10 additions the r11 rotation
# did NOT cover: the scorer-evaluation family's remaining slots
# (eval_ndcg_doclen_trusted, eval_calibration_doclen_en,
# train_split_leakage_safe, stream_auc_replay /
# stream_calibration_replay), orders_winsorized_price_stats,
# mm_video_scene_cuts, stats_theilsen_revenue_trend,
# events_activity_streaks, ml_target_encode_loo, ml_woe_iv_doclen,
# linkage_jw_name_pairs, stream_reservoir_replay,
# mm_audio_silence_runs, vocab_zipf_slope,
# graph_link_prediction_jaccard, stats_bootstrap_ci_revenue,
# orders_seasonal_decompose, stats_hill_tail_index,
# privacy_t_closeness_audit, events_ab_test_analysis,
# graph_modularity_labelprop, orders_pvm_decomposition,
# orders_seasonal_forecast_backtest, vocab_oov_rate_curve,
# stats_wilcoxon_signed_rank, graph_degree_assortativity,
# events_hourly_autocorr, stats_spearman_rank_corr,
# vocab_heaps_growth, plus the r11 session additions (never
# driver-evidenced; highest-value first for the r12 rotation):
# stats_kendall_tau (rank-trio closer, per-x-bucket prefix sums),
# customer_skyline_spend_recency (the prefix-max sweep's first slot),
# eval_isotonic_calibration (minimax-identity oracle),
# eval_conformal_doclen / stream_conformal_replay (conformal pair —
# batch coverage + the residual-histogram log replay),
# text_readability_scores.  Also strong r12 candidates:
# stats_ks_price_drift and stats_wilcoxon_signed_rank — both were
# REWRITTEN onto global_rank in r11 and their driver evidence predates
# the rewrite (Spearman and Mann-Whitney, the other two rewrites, sit
# in the r11 window already).
#
# Round-12 rotation (VERDICT r11 item 1 — executes the queued list
# verbatim): seventeen slots driver-green in the r11 snapshot rotate
# out for the eleven never-driver-evidenced r11 session additions, the
# scorer-eval family's remaining slots, two more serving-path probe
# twins, and the two rank-stat entries REWRITTEN onto global_rank in
# r11 whose driver evidence predates the rewrite (the Spearman/
# Mann-Whitney precedent: rewritten code re-earns its evidence).
# Out → in, with family cover for every out slot:
#   eval_auc_doclen_trusted → eval_ndcg_doclen_trusted (exact AUC
#                 evidenced r11; nDCG completes the ranking-metric pair)
#   stream_heavy_hitters_replay → stream_auc_replay (Misra-Gries replay
#                 evidenced r11; the score-count-log AUC replay)
#   stats_spearman_rank_corr → stats_kendall_tau (Spearman re-earned
#                 r11 on the global_rank rewrite; Kendall tau-b closes
#                 the rank-correlation trio — per-x-bucket prefix sums)
#   stats_mannwhitney_price → stats_ks_price_drift (MW re-earned r11;
#                 KS was ALSO rewritten onto global_rank in r11 and its
#                 r10 evidence predates the rewrite)
#   decontam_ngram_overlap → stats_wilcoxon_signed_rank (decontam
#                 evidenced r10+r11; Wilcoxon is the fourth r11
#                 global_rank rewrite needing fresh evidence)
#   orders_cohort_ltv → customer_skyline_spend_recency (cohort LTV
#                 evidenced r11; skyline = the prefix-max sweep's
#                 first slot)
#   tpch_q21_waiting_suppliers → window_relative_ranks (Q21 analog
#                 evidenced r8+r11; percent_rank/cume_dist rebuilt from
#                 prefix sums, gated vs DuckDB's NATIVE functions)
#   stream_pii_scrub_replay → stream_conformal_replay (PII scrub
#                 evidenced r9-r11, batch twin text_pii_redaction keeps
#                 the family; conformal residual-histogram log replay)
#   train_mine_bitext_margin → eval_conformal_doclen (bitext mining
#                 evidenced r11; split-conformal batch coverage — the
#                 streaming twin enters alongside)
#   train_kcenter_coreset → eval_isotonic_calibration (k-center
#                 evidenced r11 post-ADVICE-fix; exact integer-rational
#                 PAVA vs the O(D^3) minimax-identity oracle)
#   bm25_probe → retrieval_prf_expansion (BM25 probe twin evidenced
#                 r11; PRF is the two-pass RM3-style expansion built on
#                 the same gated bm25_topk)
#   bloom_semi_join_revenue → hybrid_minmax_knn_bm25 (bloom semi-join
#                 evidenced r7+r11; weighted min-max fusion joins RRF
#                 as the hybrid-retrieval pair)
#   events_cusum_changepoint* → events_markov_transitions (*CUSUM left
#                 in r11 already — slot realized from the r11 window's
#                 stats_mannwhitney_price line; Markov first-order
#                 transition matrix's first slot)
#   dedup_incremental_new_batch → parts_abc_xyz_classes (incremental
#                 admission evidenced r10+r11; dedup keeps
#                 dedup_exact_survivors; ABC-XYZ two-axis classification
#                 — freshly DECIMAL(38,0)-hardened this round (ADVICE
#                 r11), so driver evidence lands on the fixed code)
#   mm_audio_features → text_readability_scores (audio evidenced
#                 r8-r11, mm keeps mm_image_phash_dupes; LIX
#                 readability from r11)
#   ann_ivf_probe → ann_lsh_probe (IVF probe twin evidenced r11; LSH
#                 probe is the next serving-path twin in the queue)
#   ann_ivf_index_compact → ann_hnsw_probe (index maintenance
#                 evidenced r8+r11; HNSW probe twin — ANN keeps
#                 ann_ivfpq_index_search)
#
# Still queued for r13+ (never driver-evidenced): ann_ivfpq_probe,
# quant_sq8_probe, retrieval_phrase_probe, dedup_lsh_verified_pairs,
# stream_incremental_dedup_replay, url_canonical_dupes,
# text_unicode_nfc_stats, dedup_edjoin_part_pairs,
# stream_bt_matrix_replay / stream_kmv_replay,
# join_not_in_vs_not_exists (NAAJ), graph_khop_reach,
# events_attribution_last_touch, graph_ppr_copurchase,
# corpus_snapshot_diff, train_shard_hrw_churn, layout_hilbert_report,
# serve_mmr_rerank, serve_context_expansion, ann_ivfpq_recall_trained,
# graph_hits_trade, customer_survival_km, stats_gini_revenue,
# stats_benford_price_audit, dedup_cdc_chunk_dupes,
# orders_ewma_revenue_trend, stats_mutual_info_lang_source,
# privacy_l_diversity_audit, dedup_ngram_containment_pairs,
# dedup_cluster_best_quality, train_curriculum_interleave,
# train_dsir_token_budget, eval_calibration_doclen_en,
# train_split_leakage_safe, stream_calibration_replay,
# orders_winsorized_price_stats, mm_video_scene_cuts,
# stats_theilsen_revenue_trend, events_activity_streaks,
# ml_target_encode_loo, ml_woe_iv_doclen, linkage_jw_name_pairs,
# stream_reservoir_replay, mm_audio_silence_runs, vocab_zipf_slope,
# graph_link_prediction_jaccard, stats_bootstrap_ci_revenue,
# orders_seasonal_decompose, stats_hill_tail_index,
# privacy_t_closeness_audit, events_ab_test_analysis,
# graph_modularity_labelprop, orders_pvm_decomposition,
# orders_seasonal_forecast_backtest, vocab_oov_rate_curve,
# graph_degree_assortativity, events_hourly_autocorr,
# vocab_heaps_growth — plus the r12 session additions (never
# driver-evidenced; highest-value first for the r13 rotation):
# stats_kruskal_wallis (k-sample rank test — completes the
# nonparametric family with MW/Wilcoxon/KS/Spearman/Kendall),
# eval_brier_decomposition (proper-scoring Murphy decomposition,
# exact per-bin ppm), stream_markov_replay (stateful transition
# counting across batch boundaries), events_attribution_position
# (U-shaped multi-touch credit, bucketed range join),
# graph_adamic_adar (rarity-weighted link prediction),
# events_scd2_pit_join (PIT lookup vs interval-join oracle),
# text_rake_keywords (RAKE phrase extraction),
# eval_pr_auc_doclen (average precision — the imbalance-robust
# scorer metric, score-descending global_rank suffix sums),
# scores_quantile_normalize (cross-source quantile normalization,
# two global_rank passes + position equi-join),
# events_user_entropy_bots (micro-nat behavioral entropy screen),
# stats_cramers_v_lang_source (quantized complete-grid chi2 -> V),
# events_page_hinkley (running-mean drift, CUSUM's sibling),
# text_js_divergence_sources (per-source JSD drift in micro-nats).
#
# Everything NOT in the window is still verified by the full local gate
# (tools/check_oracle.py runs all entries), just not re-recorded in the
# driver's 50-row snapshot.  Since r12 the local gate's --json records
# also carry a per-entry salted result hash (VERDICT r11 item 2), so
# the never-driver-evidenced tail is independently diffable evidence.
#
# Round-13 rotation (VERDICT r12 item 1 — executes the queued list
# verbatim, then goes further per item 4's burn-the-backlog mandate):
# ALL 25 LLM-family slots rotate — every outgoing entry is driver-green
# in the r12 snapshot, every incoming entry has NEVER had a driver row
# (but is green with hashes in both committed r12 local records, and
# the four touched this round — brier/pr-auc/cramers-v/jsd — were
# re-oracled on the fixed code before rotating in).  In = the 13
# never-evidenced r12 session additions + the 3 queued probe twins +
# 9 more from the never-evidenced tail.  Out → in, family cover:
#   dedup_exact_survivors → dedup_lsh_verified_pairs (dedup: the
#                 banded-LSH verified-pair path takes the slot)
#   eval_ndcg_doclen_trusted → eval_brier_decomposition (scorer-eval;
#                 RES term freshly overflow-proofed — evidence lands
#                 on the fixed code, the ABC-XYZ r12 precedent)
#   eval_conformal_doclen → eval_pr_auc_doclen (scorer-eval; wsum
#                 freshly DECIMAL(38,0)-ridden)
#   eval_isotonic_calibration → scores_quantile_normalize (score-map
#                 transforms: PAVA out, quantile normalization in)
#   stats_kendall_tau → stats_kruskal_wallis (rank stats: KW closes
#                 the nonparametric family)
#   stats_ks_price_drift → stats_cramers_v_lang_source (independence
#                 stats; freshly degenerate-guarded, ADVICE r12 #3)
#   stats_wilcoxon_signed_rank → stats_gini_revenue (stats tail)
#   customer_skyline_spend_recency → customer_survival_km (customer
#                 analytics: Kaplan-Meier's first driver slot)
#   window_relative_ranks → join_not_in_vs_not_exists (relational
#                 core: the NAAJ pair's first driver slot)
#   parts_abc_xyz_classes → events_attribution_position (business
#                 analytics: U-shaped multi-touch credit)
#   asof_join_forward_tolerance → events_scd2_pit_join (point-in-time
#                 join family — the direct sibling)
#   stream_auc_replay → stream_markov_replay (streaming replay)
#   stream_conformal_replay → stream_incremental_dedup_replay
#                 (streaming replay + dedup double cover)
#   stream_sessionize_replay → events_user_entropy_bots (per-user
#                 event aggregation: sessionize's bot-screen sibling)
#   events_markov_transitions → events_page_hinkley (events
#                 time-series drift: CUSUM's sibling)
#   ann_ivfpq_index_search → ann_ivfpq_probe (ANN: the index's own
#                 probe twin takes the slot)
#   ann_lsh_probe → quant_sq8_probe (ANN/quantization probe twin)
#   ann_hnsw_probe → privacy_l_diversity_audit (ANN keeps two fresh
#                 slots above; privacy family's first driver slot —
#                 never evidenced since r8)
#   retrieval_prf_expansion → retrieval_phrase_probe (retrieval
#                 probe twin — the last queued probe)
#   bm25_topk_docs → serve_mmr_rerank (retrieval/serving: MMR
#                 diversification over the gated KNN)
#   hybrid_minmax_knn_bm25 → serve_context_expansion (retrieval/
#                 serving: neighbor-chunk context windows)
#   graph_walk_corpus → graph_adamic_adar (graph: rarity-weighted
#                 link prediction, new r12 code)
#   text_readability_scores → text_rake_keywords (text/keywords)
#   text_pii_redaction → text_js_divergence_sources (text/corpus
#                 drift; freshly single-source-guarded, ADVICE r12 #3)
#   mm_image_phash_dupes → mm_video_scene_cuts (multimodal)
#
# Still queued for r14+ (never driver-evidenced after this window):
# url_canonical_dupes, text_unicode_nfc_stats, dedup_edjoin_part_pairs,
# stream_bt_matrix_replay / stream_kmv_replay, graph_khop_reach,
# events_attribution_last_touch, graph_ppr_copurchase,
# corpus_snapshot_diff, train_shard_hrw_churn, layout_hilbert_report,
# ann_ivfpq_recall_trained, graph_hits_trade, stats_benford_price_audit,
# dedup_cdc_chunk_dupes, orders_ewma_revenue_trend,
# stats_mutual_info_lang_source, dedup_ngram_containment_pairs,
# dedup_cluster_best_quality, train_curriculum_interleave,
# train_dsir_token_budget, eval_calibration_doclen_en,
# train_split_leakage_safe, stream_calibration_replay,
# orders_winsorized_price_stats, stats_theilsen_revenue_trend,
# events_activity_streaks, ml_target_encode_loo, ml_woe_iv_doclen,
# linkage_jw_name_pairs, stream_reservoir_replay, mm_audio_silence_runs,
# vocab_zipf_slope, graph_link_prediction_jaccard,
# stats_bootstrap_ci_revenue, orders_seasonal_decompose,
# stats_hill_tail_index, privacy_t_closeness_audit,
# events_ab_test_analysis, graph_modularity_labelprop,
# orders_pvm_decomposition, orders_seasonal_forecast_backtest,
# vocab_oov_rate_curve, graph_degree_assortativity,
# events_hourly_autocorr, vocab_heaps_growth — plus the r13 session
# additions (each landed with its oracle at two scales, an independent
# python-reference test, and a 10x SCALE row; highest-value first for
# the r14 rotation): train_waterfill_token_budget (max-min-fair
# absolute token budget, exact integer pivot), embed_prototype_psi
# (PSI over prototype distances — the embedding-side drift monitor),
# eval_cohens_kappa_doclen (chance-corrected agreement, one exact
# rational of confusion counts), vocab_good_turing_mass (unseen mass +
# Chao1 — the coverage curve's unseen side), embed_silhouette_labels
# (zero-shuffle prototype-array silhouette in exact ppm), and
# embed_davies_bouldin (per-class confusability ratios).
#
# Round-14 rotation (VERDICT r13 item 10 — executes the queued list,
# the 6 r13 session additions first): ALL 25 LLM-family slots rotate
# again.  Every outgoing entry is driver-green in the r13 snapshot
# (CORRECTNESS_r13.json); every incoming entry has NEVER had a driver
# row but is green with result hashes in the committed local gate
# records and in this round's fresh 398/398 sweep.  Out → in, family
# cover:
#   stats_kruskal_wallis → stats_benford_price_audit (stats: Benford
#                 first-digit audit; KW evidenced r13)
#   eval_brier_decomposition → eval_cohens_kappa_doclen (scorer-eval;
#                 r13 session addition, queued-first mandate)
#   eval_pr_auc_doclen → eval_calibration_doclen_en (scorer-eval:
#                 calibration curve twin)
#   events_attribution_position → events_attribution_last_touch
#                 (attribution: the last-touch sibling)
#   events_scd2_pit_join → events_ab_test_analysis (events analytics)
#   events_page_hinkley → events_hourly_autocorr (time-series drift)
#   events_user_entropy_bots → events_activity_streaks (per-user
#                 behavioral aggregation)
#   stats_cramers_v_lang_source → stats_mutual_info_lang_source (the
#                 same lang x source contingency grid, MI form)
#   scores_quantile_normalize → ml_target_encode_loo (score/feature
#                 transforms: leave-one-out target encoding)
#   graph_adamic_adar → graph_link_prediction_jaccard (graph link
#                 prediction: the Jaccard sibling earns its first row)
#   text_rake_keywords → text_unicode_nfc_stats (text normalization)
#   text_js_divergence_sources → vocab_zipf_slope (corpus/vocab stats)
#   stream_markov_replay → stream_bt_matrix_replay (streaming replay)
#   ann_ivfpq_probe → ann_ivfpq_recall_trained (IVF-PQ family: the
#                 trained-recall audit row)
#   quant_sq8_probe → layout_hilbert_report (layout family: Hilbert
#                 clustering's first slot; SQ8 evidenced r13)
#   retrieval_phrase_probe → url_canonical_dupes (URL canonicalization
#                 dedup's first slot; phrase evidenced r13)
#   dedup_lsh_verified_pairs → dedup_cluster_best_quality (dedup
#                 cluster-survivor family)
#   customer_survival_km → embed_silhouette_labels (r13 session
#                 addition, queued-first mandate)
#   stream_incremental_dedup_replay → stream_kmv_replay (streaming
#                 replay + KMV sketch double cover)
#   join_not_in_vs_not_exists → embed_davies_bouldin (r13 session
#                 addition, queued-first mandate)
#   serve_mmr_rerank → train_waterfill_token_budget (r13 session
#                 addition, queued-first mandate)
#   serve_context_expansion → embed_prototype_psi (r13 session
#                 addition, queued-first mandate)
#   stats_gini_revenue → vocab_good_turing_mass (r13 session addition,
#                 queued-first mandate)
#   privacy_l_diversity_audit → privacy_t_closeness_audit (privacy:
#                 the t-closeness sibling)
#   mm_video_scene_cuts → mm_audio_silence_runs (multimodal: audio)
#
# Still queued for r15+ (never driver-evidenced after this window):
# text_pii_redaction-family remainder from earlier rotations plus
# dedup_edjoin_part_pairs, graph_khop_reach, graph_ppr_copurchase,
# corpus_snapshot_diff, train_shard_hrw_churn, graph_hits_trade,
# dedup_cdc_chunk_dupes, orders_ewma_revenue_trend,
# dedup_ngram_containment_pairs, train_curriculum_interleave,
# train_dsir_token_budget, train_split_leakage_safe,
# stream_calibration_replay, orders_winsorized_price_stats,
# stats_theilsen_revenue_trend, ml_woe_iv_doclen, linkage_jw_name_pairs,
# stream_reservoir_replay, graph_modularity_labelprop,
# stats_bootstrap_ci_revenue, orders_seasonal_decompose,
# stats_hill_tail_index, orders_pvm_decomposition,
# orders_seasonal_forecast_backtest, vocab_oov_rate_curve,
# graph_degree_assortativity, vocab_heaps_growth — plus any r14
# session additions.
_WINDOW_50: list[str] = [
    # -- SURVEY §2 operators --------------------------------------------
    "q2_knn_l2_top5",            # Q2/S7 flagship
    "q3_knn_cosine_top5",        # Q3 <=>
    "q3_knn_dot_top5",           # Q3 <#>
    "q4_knn_projection",         # Q4
    "q2_knn_l2_topk_batch",      # Q2 batched generalization
    "q1_query_embedding",        # Q1
    "q5_prompt_construction",    # Q5
    "q7_blob_url",               # Q7
    "serve_llm_extract_top5",    # Q6
    "serve_sse_events",          # S8 + Q8
    "s2_scan_filter_endswith",   # S2
    "s5_status_upsert",          # S4 + S5 + P8
    "l1_status_completed",       # L1
    "l2_status_failed",          # L2
    "l3_status_dump",            # S6 + L3
    "p2_normalize_whitespace",   # P2
    "p3_chunk_rows",             # P3 + P4
    "p3_chunk_long_stats",       # P3 long-page branch
    "p6_chunk_ids",              # P6
    "p7_token_usage",            # P7
    "pipeline_pages_from_binary",    # S1 batch source
    "pipeline_pages_from_real_pdf",  # P1 real %PDF decode
    "pipeline_chunks",           # P2+P3 composed
    "pipeline_embed_stats",      # P5
    "pipeline_e2e_ingest_knn",   # S3 + end-to-end ingest
    # -- LLM-data-pipeline families (r14: all 25 never-driver-evidenced) --
    "train_waterfill_token_budget",  # r14: max-min-fair token budget (r13 addition)
    "embed_prototype_psi",          # r14: prototype-distance PSI drift (r13 addition)
    "eval_cohens_kappa_doclen",     # r14: chance-corrected agreement (r13 addition)
    "vocab_good_turing_mass",       # r14: unseen mass + Chao1 (r13 addition)
    "embed_silhouette_labels",      # r14: prototype-array silhouette (r13 addition)
    "embed_davies_bouldin",         # r14: per-class confusability (r13 addition)
    "stats_benford_price_audit",    # r14: Benford first-digit audit
    "eval_calibration_doclen_en",   # r14: calibration curve by doclen
    "events_attribution_last_touch",  # r14: last-touch attribution
    "events_ab_test_analysis",      # r14: A/B lift + z-score analysis
    "events_hourly_autocorr",       # r14: hourly autocorrelation drift
    "events_activity_streaks",      # r14: gaps-and-islands streaks
    "stats_mutual_info_lang_source",  # r14: lang x source mutual information
    "ml_target_encode_loo",         # r14: leave-one-out target encoding
    "graph_link_prediction_jaccard",  # r14: Jaccard link prediction
    "text_unicode_nfc_stats",       # r14: unicode NFC normalization stats
    "vocab_zipf_slope",             # r14: Zipf rank-frequency slope
    "stream_bt_matrix_replay",      # r14: Bradley-Terry matrix replay
    "ann_ivfpq_recall_trained",     # r14: trained IVF-PQ recall audit
    "layout_hilbert_report",        # r14: Hilbert-curve clustering report
    "url_canonical_dupes",          # r14: URL canonicalization dedup
    "dedup_cluster_best_quality",   # r14: cluster best-quality survivors
    "stream_kmv_replay",            # r14: KMV sketch replay
    "privacy_t_closeness_audit",    # r14: t-closeness audit
    "mm_audio_silence_runs",        # r14: audio silence-run detection
]


def _reorder_registry() -> None:
    assert len(_WINDOW_50) == 50, f"window must be exactly 50, got {len(_WINDOW_50)}"
    assert len(set(_WINDOW_50)) == 50, "window contains duplicates"
    missing = [n for n in _WINDOW_50 if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    ordered: dict[str, Entry] = {n: REGISTRY[n] for n in _WINDOW_50}
    for name, entry in REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
