"""Regenerate PLANS.md from the live physical plans.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.plans.inspect import (  # noqa: E402
    explain_str,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
    REGISTRY,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)

SECTIONS = [
    ("q2_knn_l2_top5", "Flagship exact KNN (single query)",
     "TakeOrderedAndProject directly over the scored scan: each partition keeps a k-row "
     "heap, only k rows reach the driver, the corpus is never shuffled. The probe-vector "
     "lookup is a pushed parquet filter; ReadSchema shows only the columns the query "
     "touches. This is the shape that scales to a 100 TB embedding column: cost = one "
     "narrow scan, zero exchanges."),
    ("q2_knn_l2_topk_batch", "Batched KNN (N queries)",
     "The query relation broadcasts (BroadcastExchange under BroadcastNestedLoopJoin); "
     "distances are computed map-side; the projection entering the single hash exchange "
     "carries (query_id, id, label, distance) — the embedding column is dropped before "
     "any data moves. The one shuffle feeds the per-query window for the global top-k."),
    ("join_revenue_per_nation", "Star join",
     "All three dimension tables broadcast (BroadcastHashJoin chain); the only exchange "
     "is the final groupBy, preceded by a partial HashAggregate — map-side combine means "
     "the shuffle carries one row per (nation, region) per task, not per order."),
    ("dedup_minhash_lsh_candidates", "MinHash + banded LSH",
     "Text is read once, shingled and hashed inside codegen projections; what shuffles "
     "for the self-join is (doc_id, band_id, band_hash) — never text. HashAggregate "
     "handles the final DISTINCT on candidate pairs."),
    ("agg_pricing_summary", "Scan-heavy aggregate",
     "Filter pushed to parquet (PushedFilters on l_shipdate), six-column ReadSchema from "
     "an 11-column table, partial+final HashAggregate around a single exchange."),
    ("ann_ivf_index_search", "Persisted IVF index probe",
     "The probe is PartitionFilters on the hive layout (centroid_id IN (...)): unprobed "
     "inverted lists are eliminated at planning time with zero I/O — the scan's partition "
     "count IS nprobe, independent of corpus size. Inside the probed lists the top-k "
     "keeps the flagship TakeOrderedAndProject shape: no shuffle, k rows to the driver."),
    ("quant_sq8_knn_top5", "Int8-quantized KNN (coarse + exact rerank)",
     "Two nested TakeOrderedAndProject stages, zero exchanges: the coarse stage scores "
     "the int8 codes (asymmetric ADC distance) and keeps k*oversample rows via "
     "partition-local heaps; the rerank computes exact double L2 over those survivors "
     "only. With persisted codes (quant_sq8_index_search) the coarse scan reads a ~4x "
     "smaller table and the rerank re-reads candidates through a pushed In filter."),
    ("quant_sq8_knn_batch", "Batched int8-quantized KNN (N queries, one codes pass)",
     "The broadcast query relation is scored against the codes map-side; the projection "
     "entering the coarse exchange carries only (query_id, id, adist) — no code array, "
     "no embedding. The per-query pool cut (row_number <= k*oversample) yields a "
     "driver-sized candidate list that is BROADCAST back onto the corpus for the exact "
     "rerank (BroadcastHashJoin — the corpus side never shuffles), and the final "
     "per-query window again sits on a narrow projection. Scan cost amortizes across "
     "all N queries: this is how quantized search is actually served at 100 TB."),
    ("dedup_semantic_clusters", "SemDeDup: embedding-cluster near-dup",
     "assign_ivf broadcasts the centroid relation and reduces map-side (min_by partial "
     "aggregate) to one row per vector; the cosine pair join is blocked on centroid_id "
     "— fan-out bounded by the largest cluster, never all-pairs — and vectors are "
     "L2-normalized once per row BEFORE the join, so per-pair work is a single dot "
     "product. The duplicate verdict re-enters via a broadcast left join."),
    ("ann_lsh_index_search", "Persisted LSH index probe",
     "Same layout trick as the IVF index with bucket in place of centroid_id: the "
     "probe's literal bucket equality lands in PartitionFilters, so exactly ONE bucket "
     "directory is opened regardless of corpus size (delete-proof in "
     "tests/test_lsh_index.py). In-bucket top-k is the flagship TakeOrderedAndProject — "
     "zero exchanges end to end, versus ann_lsh_search which re-buckets the whole "
     "corpus per probe."),
    ("bm25_index_search", "Persisted BM25 inverted-index probe",
     "The lexical twin of the IVF/LSH index probes: postings are hive-partitioned by a "
     "stable md5 term bucket, the query's buckets are computed driver-side (no job), and "
     "the literal IN lands in PartitionFilters — at most |Q| bucket directories are "
     "opened regardless of corpus size (delete-proof in tests/test_bm25_index.py). "
     "Scoring then runs over posting rows only: tiny broadcast joins for df/corpus "
     "stats, one partial-agg exchange on doc_id for the score sum, TakeOrderedAndProject "
     "for the top-k. Compare bm25_topk, which re-tokenizes the corpus per query."),
    ("ann_ivf_index_filtered_search", "Filtered probe on the persisted IVF index",
     "The pgvector 'WHERE label ... ORDER BY embedding <-> q' idiom on the index path: "
     "PartitionFilters still prunes to the nprobe probed lists AND the metadata "
     "predicate shows in PushedFilters on the same scan — row groups of non-matching "
     "rows are skipped before any distance math. Top-k stays TakeOrderedAndProject."),
    ("quant_pca_knn_top5", "PCA-projected KNN (learned low-rank coarse stage)",
     "The fitted projection re-enters the plan as literal component arrays inside a "
     "codegen Project — out_dim fused dot products per row, no Python, no join for the "
     "model. Then the same two nested TakeOrderedAndProject stages as every quantized "
     "path: coarse L2 in projected space, exact full-dim rerank, zero shuffle "
     "exchanges. With the projection persisted (pca_index_search) the coarse scan reads "
     "out_dim/dim of the corpus bytes."),
    ("events_funnel_conversion", "Ordered funnel (3 steps)",
     "Each step is one partial+final HashAggregate (min conversion time per user) and "
     "one SortMergeJoin/BroadcastHashJoin back onto the next step's events, all keyed "
     "on user_id — the step relations narrow monotonically, and AQE converts the later "
     "tiny steps to broadcasts at runtime. No window over an unpartitioned frame "
     "anywhere; shuffle volume is per-user rows, not events squared."),
    ("profile_documents", "One-pass column profile (multi-distinct aggregate)",
     "Every column's rows/nulls/exact-distincts/min/max/mean come from a single "
     "aggregation over ONE scan: Spark plans the multi-count_distinct via Expand "
     "(one duplicated stream per distinct column) feeding partial HashAggregates — "
     "N columns profiled for one read of the table, where naive per-column profiling "
     "would scan N times. The long-format explode of the 1-row wide result is free."),
    ("bloom_semi_join_revenue", "Bloom runtime-filtered semi-join",
     "The InjectRuntimeFilter shape made explicit: each of the two hash families "
     "contributes a <= n_buckets-row distinct-bucket relation (partial+final "
     "HashAggregate over the filtered build side) that reaches the fact scan as a "
     "BroadcastHashJoin LeftSemi on the bucket expression — the fact side never "
     "exchanges before the probes, so the bloom stage rides the scan's codegen. The "
     "closing exact LeftSemi sees only pre-filter survivors; its shuffle (or "
     "broadcast, as AQE decides here) is the only data movement that scales with "
     "matches rather than with the fact table."),
    ("pack_concat_windows", "Sequence packing (two-pass prefix sum)",
     "The concat-and-chunk window layout needs a global exclusive prefix sum of "
     "per-document token counts — the classic single-partition-window trap. Here it "
     "is ONE Exchange rangepartitioning followed by a Window partitioned by "
     "spark_partition_id plus a broadcast <= npart-row offset table (the triangular "
     "self-join over the per-partition summary): every window in the plan has a "
     "partition spec, and everything downstream of the range exchange is codegen "
     "integer arithmetic."),
    ("vocab_unigram_segment", "Unigram-LM Viterbi segmentation (final round)",
     "The E-step/inference shape: MapInPandas (the Arrow-batched Viterbi DP) sits "
     "directly over the distinct-word aggregate — the corpus-scale tokenize feeds one "
     "partial+final HashAggregate whose output is the WORKING SET (distinct words), "
     "and only that bounded relation ever crosses into Python. The trained piece "
     "costs ride the UDF closure (vocab-sized, the same movement a broadcast "
     "performs); everything after the DP is codegen string/aggregate work. At 100 TB "
     "the DP cost tracks distinct words x max piece length, never the token stream."),
    ("tpch_q21_waiting_suppliers", "TPC-H Q21 analog (EXISTS / NOT EXISTS)",
     "The two correlated subqueries appear as one SortMergeJoin LeftSemi and one "
     "LeftAnti, both keyed on the order with the supplier inequality as a residual "
     "join condition — each EXISTS costs a single keyed shuffle, never a per-row "
     "probe. The per-(order, supplier) late relation is partial-aggregated once and "
     "localCheckpointed for its three consumers (the CTE materialization a TPC-H "
     "engine performs); the orders filter and the supplier dimension broadcast."),
    ("ann_ivf_index_compact", "IVF index lifecycle (reconcile + compact)",
     "Three probes through the maintenance layer: the pre-compact search reads the "
     "probed lists ONLY (PartitionFilters on centroid_id at every batch_id level), "
     "then reconciles that bounded slice — one hash aggregate keyed on vec_id "
     "(max_by batch_id: last write wins) and a broadcast anti-join against the "
     "tombstone relation — before the usual TakeOrdered top-k. The post-compact "
     "search hits a clean single-batch tree, so the reconcile vanishes from the "
     "plan (the directory listing decides driver-side, no Spark job) and the "
     "zero-exchange flagship probe shape returns. Compaction itself is one "
     "reconciled scan repartitioned by centroid_id — one file set per inverted "
     "list, the small-files payback."),
    ("tpch_q9_product_profit", "TPC-H Q9 analog (5-relation join, synthesized PARTSUPP)",
     "The widest of the r8 partsupp analogs: part/supplier/nation broadcast, the "
     "synthesized partsupp and lineitem hash-join on (partkey, suppkey), and every "
     "money product quantizes to integer cents BEFORE the groupBy's partial "
     "aggregate — the shuffle carries one (nation, year) cell per task."),
    ("graph_triangles_copurchase", "Triangle counting (degree-oriented wedge join)",
     "Degree orientation bounds each vertex's wedge fan-out at O(sqrt(E)) — the "
     "Exchange feeding the wedge self-join is keyed on the apex vertex, the closing "
     "edge check is a LeftSemi hash join on (b, c), and every counter is a long; "
     "no window, no driver-side graph state."),
    ("serve_context_expansion", "Small-to-big retrieval (broadcast neighbor stitch)",
     "The k-hit relation explodes to wanted pages and broadcasts "
     "(BroadcastHashJoin, build side = hits): the corpus side is scanned once with "
     "no shuffle and only matching neighbor rows reach the grouped ordered stitch."),
    ("pref_bt_source_strength", "Bradley-Terry fixed point (bounded pair matrix)",
     "The match log aggregates once into the players^2 pair matrix; each MM "
     "iteration joins the checkpointed strength relation twice and re-aggregates — "
     "every exchange in the loop is bounded by the player count, never the corpus, "
     "and every arithmetic op is an exact integer floor."),
    ("graph_order_episodes", "Connected components (large-star/small-star)",
     "Each contraction round is two groupBy+join stages keyed on the node id — "
     "map-side-partial min aggregates, shuffles linear in |E|, localCheckpointed "
     "between rounds so round r+1's plan never re-derives rounds 1..r. The star "
     "assertion at the end is two bounded aggregates; no driver-side graph state."),
    ("dedup_edjoin_part_pairs", "Ed-Join prefix-filtered edit-distance join (k=2)",
     "Duplicates collapse to multiplicities BEFORE the quadratic stage (one "
     "partial-agg groupBy); prefix grams rank per value under the global "
     "document-frequency order (window keyed on the value id, partitions bounded by "
     "string length); the candidate self-join shuffles (id, gram-hash, pos, len) — "
     "never the strings — and one levenshtein per candidate verifies."),
    ("recsys_item_item_cosine", "Item-item cosine recommender",
     "The co-count self-join is keyed on the order id (fan-out quadratic only in "
     "per-order item count), degree counts are map-side-partial groupBys joined "
     "back by item key, and the top-3 per item is a window keyed on the item — "
     "never a global sort. Cosine is one sqrt + one divide of exact integers."),
    ("sketch_kmv_priority_overlap", "KMV/theta sketch set algebra",
     "Each k-minset compiles to TakeOrderedAndProject (partition-local top-k heaps, "
     "k rows out) over a distinct hash projection; every post-sketch relation is "
     "<= k rows, all joins broadcast, no global window anywhere."),
    ("train_prune_prototypes", "SSL-prototypes data pruning",
     "Prototypes are a labels x dims partial aggregate broadcast back onto the "
     "corpus; the only full-data exchange is the per-label rank window; the "
     "per-class cut is exact integer arithmetic inside the same projection."),
    ("train_dsir_select", "DSIR importance resampling (r9)",
     "The 64-row bucket-weight table is checkpointed (its totals and weight "
     "branches would otherwise each re-run the corpus token pass) and broadcast "
     "into the scoring join; the corpus is tokenized exactly twice end-to-end, "
     "exchanges carry (bucket) partials and (doc, bucket) counts — never text — "
     "and the top-k is TakeOrderedAndProject."),
    ("retrieval_phrase_match", "Positional-postings phrase search (r9)",
     "Each phrase word's postings are filtered at the explode and joined on the "
     "(doc, anchor) key, so join volume is the words' document frequency, not "
     "the token stream; against a persisted postings table the same term "
     "equalities become pushed scan filters (gated in tests/test_bm25.py)."),
    ("ann_ivf_probe", "Probe-only IVF serving path (r9)",
     "The deployed shape the probe twins measure: the artifact exists, so the "
     "plan is a centroid pick plus a scan whose PartitionFilters prune to the "
     "probed list directory — probed volume tracks one list, not the corpus, "
     "which is why the sf1 row is near-flat."),
    ("dedup_incremental_new_batch", "Incremental new-batch dedup (r9)",
     "The base side is reduced to DISTINCT fingerprints before anything moves; "
     "the semi-join and the within-batch window exchange only (16-byte hash, id) "
     "pairs — the corpus text never shuffles (plan-gated in tests/test_dedup.py)."),
    ("graph_hits_trade", "HITS hubs/authorities (r9w3)",
     "Two |E|-keyed join+partial-agg passes per iteration on the checkpointed "
     "edge relation; the L1 normalization totals are 1-row aggregates broadcast "
     "back in-plan (asserted on the unmaterialized form in tests/test_plans.py); "
     "every score is an exact integer, the division exact through DECIMAL(38,0)."),
    ("graph_kcore_copurchase", "k-core peel (r9w3)",
     "Each round is one degree groupBy (map-side partial) plus two semi-joins "
     "against the survivor set, localCheckpointed so the lineage stays one round "
     "deep; the fixpoint-proof pass is one extra bounded aggregate."),
    ("dedup_winnow_shared_fp", "MOSS winnowing fingerprints (r9w3)",
     "The entire per-document selection (gram hashing, packed-key window min, "
     "rightmost tie) runs INSIDE the row as chained array projections — md5 "
     "appears exactly once in the optimized plan (plan-gated) and nothing "
     "shuffles until the (id, fp) longs; the pair join is fingerprint-bucketed "
     "behind a frequency cap with the fingerprint relation checkpointed once."),
    ("dedup_cdc_chunk_dupes", "Content-defined chunk dedup (r9w3)",
     "One hash per character position (codegen), a per-document lag window over "
     "the boundary list, then a partial-agg groupBy on the 16-byte chunk hash — "
     "text never crosses an exchange; the whole operator is two exchanges."),
    ("customer_survival_km", "Kaplan-Meier survival (r9w3)",
     "The orders scan reduces through a per-customer lead window (partitioned, "
     "never global) to a distinct-duration relation bounded by the day span; "
     "risk sets, event counts and the cumulative product all run on that "
     "bounded series."),
    ("graph_link_prediction_jaccard", "Jaccard link prediction (r10)",
     "Wedge generation is keyed on the CENTER vertex after the hub-cap "
     "semi-join (deg <= 64) — the candidate stage is a keyed self-join whose "
     "per-key fan-out is capped, never a cartesian; the anti-join against "
     "existing edges and both degree joins are hash joins; scores are one "
     "codegen projection.  No BroadcastNestedLoop, no CartesianProduct "
     "(plan-asserted in tests).  At 100x the cap is the knob: candidates "
     "are linear in |E| * cap."),
    ("stats_bootstrap_ci_revenue", "Poisson bootstrap CI (r10)",
     "The B=20 replicate explode happens IN-MAP: the groupBy(b) partial-"
     "aggregates inside each task, so the exchange carries B rows per "
     "partition, never B x rows.  The replicate-mean ranking window runs on "
     "the 20-row relation.  The per-row cost is the 20 salted md5s — "
     "measured linear at sf1 (SCALE.md), with the xxhash64 production "
     "path 4x cheaper."),
    ("train_kcenter_coreset", "k-center greedy coreset (r10)",
     "Each of the k rounds is a full scan + TakeOrderedAndProject(1) — a "
     "map-side-reduced argmax, no global sort, no window; the running "
     "min-distance is a least() chain over literal center vectors, and the "
     "only driver transfer is one selected row per round (the audited "
     "model-artifact collect pattern)."),
    ("stats_spearman_rank_corr", "Spearman rank correlation (r11 post-fix)",
     "The r10 scale-killer, repaired: both tie-rank cumulations now run "
     "through global_rank's range repartition + partitioned window + "
     "broadcast partition offsets — the plan contains NO unpartitioned "
     "ordered window and NO broadcast of the row-cardinality distinct-spend "
     "relation (the joins back are plain shuffle joins). Measured flat "
     "(0.98x) at 10x rows."),
    ("stats_kendall_tau", "Kendall tau-b (r11)",
     "No pair enumeration anywhere: two partial-agg groupBys reduce to the "
     "(x, y, cnt) grid and the per-y pivot (one count column per x value — "
     "a tens-wide domain), one global_rank range exchange carries a prefix "
     "sum per x column, and the concordant/discordant masses are per-row "
     "when-chains over those prefixes. The oracle runs the O(n^2) pair "
     "join; the engine never does."),
    ("customer_skyline_spend_recency", "2D skyline via prefix-max sweep (r11)",
     "The sort-sweep identity distributed: per-spend max-recency reduction "
     "(partial-agg groupBy), one global_rank(prefix_op=max) range exchange "
     "giving every spend level the best recency among strictly richer "
     "customers, and a plain join back with two filter predicates. The "
     "O(n^2) NOT EXISTS dominance join exists only on the oracle side."),
    ("stats_kruskal_wallis", "Kruskal-Wallis H (r12)",
     "One partial-agg groupBy reduces the fact table to the distinct-cents "
     "relation with the five priority counts as conditional-agg columns "
     "(the group axis is a 5-literal domain — no pivot, no per-group "
     "scan); ONE global_rank range exchange supplies the tie-averaged "
     "rank mass; the final one-row aggregate carries exact DECIMAL(38,0) "
     "rank sums into a textually-shared double H expression."),
    ("events_attribution_position", "Position-based attribution (r12)",
     "The purchase x touch pairing is an EQUI-join on (user_id, W-bucket) "
     "— the purchase side explodes to 2 probe buckets, bounding fan-out "
     "at x2 — with the exact 7-day/strictly-before predicate as a "
     "post-join filter. Rank/count windows are partitioned per "
     "conversion (one user's 7-day activity), never global; the final "
     "matrix is a 3-row aggregate."),
    ("graph_adamic_adar", "Adamic-Adar link prediction (r12)",
     "Same hub-capped wedge shape as the Jaccard twin — centers above "
     "deg 64 never enter the pair join, so candidates are |E| x cap, not "
     "deg^2 at hubs — but each center carries its pre-quantized integer "
     "1/ln(deg) term, making the wedge aggregation an order-free integer "
     "sum (no float accumulation across partitions)."),
    ("events_scd2_pit_join", "SCD2 point-in-time join (r12)",
     "No interval join anywhere in the plan: state-change rows and "
     "purchase facts union into one relation, ONE hash exchange on "
     "user_id feeds the per-user carry windows (two last-ignorenulls "
     "over the same frame), and purchases leave with their in-effect "
     "state attached. The naive validity-interval join exists only on "
     "the oracle side."),
    ("text_rake_keywords", "RAKE keyword phrases (r12)",
     "Token explode is bytes-linear map work; the islands window is "
     "partitioned per document; phrase and word statistics are two "
     "partial-agg groupBys over vocabulary-bounded relations; word "
     "scores quantize to ppm integers BEFORE the phrase-sum join, so "
     "the top-20 TakeOrdered sees exact integers."),
    ("train_waterfill_token_budget", "Water-filling token budget (r13)",
     "Data rows are touched exactly once, by the per-source partial-agg "
     "groupBy; everything downstream (global_rank's range exchange, the "
     "rank-shift self-join for the predecessor, the pivot filter) runs "
     "on the source-domain relation — a handful of rows regardless of "
     "corpus size. Totals and the pivot enter as broadcast one-row "
     "joins; no windows, no collect."),
    ("embed_prototype_psi", "Prototype-distance PSI drift (r13)",
     "Two corpus passes: the prototype partial agg keyed (label, dim), "
     "then one scoring pass with the |labels| x dim prototype table "
     "broadcast — the d2 fold runs inside a codegen projection. The "
     "bucket split reuses the Brier broadcast-bounds shape; the PSI "
     "grid (labels x 8 buckets, Laplace-completed) and the per-label "
     "totals are domain-bounded relations joined by broadcast."),
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plansdoc")
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        "Captured from `.explain('formatted')` at sf0.01 (plans are scale-independent;",
        "AQE re-plans at runtime). Regenerate with `python tools/dump_plans.py`.",
        "The shapes below are enforced by `tests/test_plans.py` — a regression fails CI.",
        "",
    ]
    for name, title, comment in SECTIONS:
        df = REGISTRY[name][0](spark, sf)
        plan = explain_str(df, "formatted")
        plan = "\n".join(l for l in plan.splitlines() if "Location:" not in l)
        out.append(f"## {name} — {title}\n")
        out.append(comment + "\n")
        out.append("```\n" + plan.strip() + "\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md regenerated")


if __name__ == "__main__":
    main()
