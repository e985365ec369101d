"""Round-11 SCALE probes: sf0.1 vs /tmp/sf1 (10x rows), medians of 3,
construct+execute basis, noop sink — the same protocol as
round10b_scale.py.

Covers (a) the four rank-stat entries whose cumulations moved from
single-partition windows to global_rank prefix sums this round
(VERDICT r10 #1: the distinct-value relations are row-cardinality, so
these are exactly the entries whose 10x behavior must be measured, not
argued), (b) the two entries VERDICT r10 #4 flagged as missing sf1
rows, and (c) the three new r11 entries.

  stats_spearman_rank_corr   post-fix: two global_rank passes (VERDICT #1)
  vocab_heaps_growth         missing wave-4 row (VERDICT #4)
  stats_ks_price_drift       post-swap: one global_rank, two prefix cols
  stats_mannwhitney_price    post-swap: one global_rank pass
  stats_wilcoxon_signed_rank post-swap: one global_rank pass
  stats_kendall_tau          new r11: pivot + one global_rank pass
  eval_conformal_doclen      new r11: domain-bounded per-source windows
  text_readability_scores    new r11: per-row expressions + one groupBy

Usage: python tools/round11_scale.py [sf01_dir] [sf1_dir] [names...]
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
    "stats_spearman_rank_corr",
    "vocab_heaps_growth",
    "stats_ks_price_drift",
    "stats_mannwhitney_price",
    "stats_wilcoxon_signed_rank",
    "stats_kendall_tau",
    "eval_conformal_doclen",
    "text_readability_scores",
]


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
    spark = get_spark("round11_scale")
    print("| query | sf0.1 s | sf1 s | ratio at 10x |")
    print("|---|---|---|---|")
    for name in names:
        s01 = run_query(spark, name, sf01)
        s1 = run_query(spark, name, sf1)
        print(f"| {name} | {s01} | {s1} | {s1 / s01:.2f}x |", flush=True)


if __name__ == "__main__":
    main()
