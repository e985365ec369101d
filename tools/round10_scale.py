"""Round-10 SCALE measurements (VERDICT r9 items 3 + 5).

1. Bytes-linearity proof for the two char-hashing dedup operators
   (``dedup_winnow_shared_fp``, ``dedup_cdc_chunk_dupes``): the r9
   SCALE rows showed 7.1x / 8.4x wall-clock for 10x ROWS and asserted
   "linear in corpus BYTES" without recording bytes.  This measures
   the bytes each query actually scans (sum(length(documents.text)))
   at both scale factors and reports sec/GB — flat-or-falling sec/GB
   is the proof, a rising one is the diagnosis.

2. Probe-twin scaling: the five probe-only serving rows exist at sf0.1
   only; a 100x user wants probe latency vs corpus scale.  Artifacts
   are prebuilt OUTSIDE the timed region (one untimed warm run), then
   medians-of-3 of the pure probe at both scale factors.

Protocol matches bench.py: construct+execute basis, noop sink,
medians of 3.  The sf1 fixture is /tmp/sf1 (tools/make_sf1.py, built
here if absent).

Usage: python tools/round10_scale.py [sf01_dir] [sf1_dir]
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

BYTES_QUERIES = ["dedup_winnow_shared_fp", "dedup_cdc_chunk_dupes"]
PROBE_QUERIES = [
    "ann_ivf_probe",
    "ann_ivfpq_probe",
    "ann_lsh_probe",
    "bm25_probe",
    "quant_sq8_probe",
]


def median3(fn) -> float:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def run_query(spark, name: str, sf_dir: str) -> float:
    fn, _ = REGISTRY[name]
    return median3(
        lambda: fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
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
    spark = get_spark("round10_scale")

    # -- 1. bytes linearity ------------------------------------------------
    print("\n### Round-10: corpus-bytes linearity (VERDICT r9 #3)\n")
    gb = {}
    for d in (sf01, sf1):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        row = docs.agg(
            F.sum(F.length("text")).alias("b"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        gb[d] = row["b"] / 1e9
        print(f"{d}: {row['n']:,} docs, {row['b']:,} text bytes "
              f"({gb[d]:.4f} GB)", flush=True)
    print()
    print("| query | sf | docs GB | sec | sec/GB |")
    print("|---|---|---|---|---|")
    ratios = {}
    for name in BYTES_QUERIES:
        per_gb = {}
        for d in (sf01, sf1):
            sec = run_query(spark, name, d)
            per_gb[d] = sec / gb[d]
            tag = os.path.basename(d.rstrip("/"))
            print(f"| {name} | {tag} | {gb[d]:.4f} | {sec} | "
                  f"{per_gb[d]:.2f} |", flush=True)
        ratios[name] = per_gb[sf1] / per_gb[sf01]
        print(f"| {name} | sec/GB ratio sf1/sf0.1 | | | "
              f"{ratios[name]:.2f} |", flush=True)

    # -- 2. probe twins at sf1 --------------------------------------------
    print("\n### Round-10: probe-twin scaling (VERDICT r9 #5)\n")
    print("| probe | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for name in PROBE_QUERIES:
        fn, _ = REGISTRY[name]
        secs = {}
        for d in (sf01, sf1):
            # untimed warm run builds the persisted artifact if absent
            fn(spark, d).write.mode("overwrite").format("noop").save()
            secs[d] = run_query(spark, name, d)
        print(f"| {name} | {secs[sf01]} | {secs[sf1]} | "
              f"{secs[sf1] / secs[sf01]:.2f}x |", flush=True)


if __name__ == "__main__":
    main()
