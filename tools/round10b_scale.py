"""Round-10 session-2 SCALE probes: the new operator wave at sf0.1 vs
/tmp/sf1 (10x rows), medians of 3, construct+execute basis, noop sink —
the same protocol as bench.py / round10_scale.py.

Covers every r10 session-2 gated entry whose cost could scale with the
corpus (streaming replays excluded — they re-write their own source
fixtures per call and measure the harness, not the operator):

  stats_mannwhitney_price        bounded distinct-cents window claim
  stats_theilsen_revenue_trend   calendar^2 pair relation claim
  events_activity_streaks        per-user windows
  ml_target_encode_loo           category-domain groupBy + broadcast
  ml_woe_iv_doclen               bucket-domain groupBy
  train_kcenter_coreset          k full-scan argmax rounds
  linkage_jw_name_pairs          distinct-value blocked pandas UDF
  vocab_zipf_slope               word-domain groupBy + top-100 rank
  mm_audio_silence_runs          per-media in-batch numpy
  graph_link_prediction_jaccard  hub-capped wedge join
  stats_bootstrap_ci_revenue     B=20 in-map explode, B partials

Usage: python tools/round10b_scale.py [sf01_dir] [sf1_dir]
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
    REGISTRY,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)

QUERIES = [
    "stats_mannwhitney_price",
    "stats_theilsen_revenue_trend",
    "events_activity_streaks",
    "ml_target_encode_loo",
    "ml_woe_iv_doclen",
    "train_kcenter_coreset",
    "linkage_jw_name_pairs",
    "vocab_zipf_slope",
    "mm_audio_silence_runs",
    "graph_link_prediction_jaccard",
    "stats_bootstrap_ci_revenue",
    # session-2 wave 3
    "asof_join_forward_tolerance",
    "orders_seasonal_decompose",
    "stats_hill_tail_index",
    "privacy_t_closeness_audit",
    "events_ab_test_analysis",
    "graph_modularity_labelprop",
    "mm_image_phash_dupes",
    "orders_pvm_decomposition",
    "orders_seasonal_forecast_backtest",
    "vocab_oov_rate_curve",
    "graph_walk_corpus",
]

# run only the names passed after sf dirs, else all



def run_query(spark, name: str, sf_dir: str) -> float:
    fn, _ = REGISTRY[name]
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        print(f"building {sf1} via make_sf1.py ...", flush=True)
        subprocess.run(
            [sys.executable, "/root/repo/tools/make_sf1.py", sf01, sf1, "10"],
            check=True,
        )
    only = sys.argv[3:]
    names = [n for n in QUERIES if not only or n in only]
    spark = get_spark("round10b_scale")
    print("| query | sf0.1 s | sf1 s | ratio at 10x |")
    print("|---|---|---|---|")
    for name in names:
        s01 = run_query(spark, name, sf01)
        s1 = run_query(spark, name, sf1)
        print(f"| {name} | {s01} | {s1} | {s1 / s01:.2f}x |", flush=True)


if __name__ == "__main__":
    main()
