"""Round-12 SCALE probes: sf0.1 vs /tmp/sf1 (10x rows), medians of 3,
construct+execute basis, noop sink — the round11_scale.py protocol over
the six new batch entries, plus the kendall |x-domain| reading VERDICT
r11 #6 asked for (the measured boundedness argument behind the 64-column
pivot cap).

  stats_kruskal_wallis        one global_rank pass + 5-way conditional agg
  eval_brier_decomposition    one groupBy to B=10 bins + 2 broadcast joins
  events_attribution_position bucketed range join + per-conversion windows
  graph_adamic_adar           hub-capped wedge join, quantized terms
  events_scd2_pit_join        union-timeline carry (user-partitioned windows)
  text_rake_keywords          per-doc islands + word-stat groupBy

Usage: python tools/round12_scale.py [sf01_dir] [sf1_dir] [names...]
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
    REGISTRY,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)

QUERIES = [
    "stats_kruskal_wallis",
    "eval_brier_decomposition",
    "events_attribution_position",
    "graph_adamic_adar",
    "events_scd2_pit_join",
    "text_rake_keywords",
    # wave 2
    "eval_pr_auc_doclen",
    "scores_quantile_normalize",
    "events_user_entropy_bots",
    "stats_cramers_v_lang_source",
    # wave 3
    "events_page_hinkley",
    "text_js_divergence_sources",
]


def run_query(spark, name: str, sf_dir: str) -> float:
    fn, _ = REGISTRY[name]
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def kendall_xdomain(spark, sf_dir: str) -> int:
    """|distinct orders-per-customer| — the pivot width stats_kendall_tau
    caps at 64; measured so the cap's boundedness argument is a number,
    not prose."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("nord"))
        .select("nord")
        .distinct()
        .count()
    )


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
    spark = get_spark("round12_scale")
    print(
        f"kendall |x-domain|: sf0.1={kendall_xdomain(spark, sf01)}, "
        f"sf1={kendall_xdomain(spark, sf1)} (cap 64)",
        flush=True,
    )
    print("| query | sf0.1 s | sf1 s | ratio at 10x |")
    print("|---|---|---|---|")
    for name in names:
        s01 = run_query(spark, name, sf01)
        s1 = run_query(spark, name, sf1)
        print(f"| {name} | {s01} | {s1} | {s1 / s01:.2f}x |", flush=True)


if __name__ == "__main__":
    main()
