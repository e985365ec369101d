"""Round-14 SCALE probe (VERDICT r13 item 7): measured core-scaling at
sf1 for the top headline lines, converting the 100 TB plan-shape
arguments into a measured parallelism curve.

At sf0.1 every 8-vs-32-core ratio is ~1 (PERF_r13 scaling block): lines
run 0.4-7 s and are dominated by per-job fixed overhead.  This probe
re-runs the heaviest lines at sf1 (10x keyed replication, make_sf1.py)
under 8 and under 32 cores in SEPARATE cold processes (the same way
the driver runs its scaling control), medians of 3 in-process runs per
line, construct+execute basis, noop sink.

Usage:
  python tools/make_sf1.py                      # build /tmp/sf1 once
  python tools/round14_scale.py --cpus 32       # writes JSON to stdout
  python tools/round14_scale.py --cpus 8
  python tools/round14_scale.py --table A.json B.json   # print md table
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "graph_walk_corpus",
    "graph_kcore_copurchase",
    "dedup_winnow_shared_fp",
    "stats_bootstrap_ci_revenue",
    "graph_hits_trade",
    "ann_ivf_index_compact",
    "dedup_fuzzy_name_pairs",
    "graph_adamic_adar",
    "graph_pagerank_dangling",
    "stats_kendall_tau",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--sf", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--table", nargs=2, default=None,
                    help="two JSON outputs (hi lo) -> print markdown table")
    args = ap.parse_args()

    if args.table:
        hi = json.load(open(args.table[0]))
        lo = json.load(open(args.table[1]))
        print(f"| query | {hi['cpus']}c s | {lo['cpus']}c s | ratio |")
        print("|---|---|---|---|")
        for q in hi["queries"]:
            a, b = hi["queries"][q], lo["queries"][q]
            print(f"| {q} | {a} | {b} | {round(b / a, 2)} |")
        return

    if args.cpus:
        os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
        REGISTRY,
    )
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
        get_spark,
    )

    spark = get_spark("scale14")
    out: dict[str, float] = {}
    for name in QUERIES:
        fn, _ = REGISTRY[name]
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"scale14 {name} [rep {i}]")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 3)
        print(f"  {name}: {out[name]} s", file=sys.stderr, flush=True)
    rec = {
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "sf_dir": args.sf,
        "reps": args.reps,
        "queries": out,
    }
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
