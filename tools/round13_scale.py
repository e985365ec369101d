"""Round-13 SCALE probes (VERDICT r12 item 5): extend the 10x-rows table
to 30x for the two fastest-growing r12 lines — graph_adamic_adar (2.50x
at 10x) and text_rake_keywords (2.07x at 10x) — and MEASURE the driver
each one is actually linear in, separating "sublinear in rows" from
"linear in |E| / token-bytes with a bounded constant":

  graph_adamic_adar   driver = capped wedge count sum_z C(deg(z), 2)
                      over centers with 2 <= deg <= cap (the exact
                      row count of the wedge join) plus |E|
  text_rake_keywords  driver = total whitespace tokens + |vocab|

Protocol: medians of 3, construct+execute basis, noop sink (the
round11_scale.py protocol) at sf0.1, /tmp/sf1 (10x) and /tmp/sf3 (30x);
fixtures built by make_sf1.py keyed replication on demand.

Usage: python tools/round13_scale.py [sf01_dir] [names...]
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

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries.graph_centrality import (  # noqa: E402
    _LP_CAP,
)

QUERIES = ["graph_adamic_adar", "text_rake_keywords"]
# the round's NEW entries: standard 10x-rows probe only
NEW_10X = [
    "train_waterfill_token_budget",
    "embed_prototype_psi",
    "vocab_good_turing_mass",
    "eval_cohens_kappa_doclen",
    "embed_silhouette_labels",
    "embed_davies_bouldin",
]


def run_query(spark, name: str, sf_dir: str) -> float:
    fn, _ = REGISTRY[name]
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def adamic_drivers(spark, sf_dir: str) -> tuple[int, int]:
    """(|E|, capped wedge count) — the adamic-adar work terms."""
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.graph import (
        copurchase_edges,
    )

    e = copurchase_edges(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    n_edges = e.count()
    sym = e.selectExpr("u AS node", "v AS nbr").unionAll(
        e.selectExpr("v AS node", "u AS nbr")
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    wedges = (
        deg.where(f"deg >= 2 AND deg <= {_LP_CAP}")
        .selectExpr("sum(deg * (deg - 1) div 2) AS w")
        .collect()[0][0]
    )
    return n_edges, int(wedges or 0)


def rake_drivers(spark, sf_dir: str) -> tuple[int, int]:
    """(total whitespace tokens, |vocab|) — the RAKE work terms."""
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w")
        )
        .where("w != ''")
    )
    row = toks.agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("w").alias("v")
    ).collect()[0]
    return int(row["n"]), int(row["v"])


def _ensure_fixture(sf01: str, dst: str, replicas: int) -> None:
    if not os.path.exists(os.path.join(dst, "documents.parquet")):
        print(f"building {dst} ({replicas}x) via make_sf1.py ...", flush=True)
        subprocess.run(
            [sys.executable, "/root/repo/tools/make_sf1.py", sf01, dst, str(replicas)],
            check=True,
        )


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]
    names = [n for n in QUERIES if not only or n in only]
    tiers = [("1x", sf01, 1), ("10x", "/tmp/sf1", 10), ("30x", "/tmp/sf3", 30)]
    for _, d, r in tiers[1:]:
        _ensure_fixture(sf01, d, r)
    spark = get_spark("round13_scale")

    if "graph_adamic_adar" in names:
        print("| tier | edges | capped wedges |")
        print("|---|---|---|")
        drv = {}
        for tag, d, _ in tiers:
            ne, nw = adamic_drivers(spark, d)
            drv[tag] = (ne, nw)
            print(f"| {tag} | {ne} | {nw} |", flush=True)

    if "text_rake_keywords" in names:
        print("| tier | tokens | vocab |")
        print("|---|---|---|")
        for tag, d, _ in tiers:
            nt, nv = rake_drivers(spark, d)
            print(f"| {tag} | {nt} | {nv} |", flush=True)

    print("| query | 1x s | 10x s | 30x s | 10x ratio | 30x ratio |")
    print("|---|---|---|---|---|---|")
    for name in names:
        t1 = run_query(spark, name, sf01)
        t10 = run_query(spark, name, "/tmp/sf1")
        t30 = run_query(spark, name, "/tmp/sf3")
        print(
            f"| {name} | {t1} | {t10} | {t30} | {t10 / t1:.2f}x | "
            f"{t30 / t1:.2f}x |",
            flush=True,
        )

    new_names = [n for n in NEW_10X if not only or n in only]
    if new_names:
        print("| query | sf0.1 s | sf1 s | ratio at 10x |")
        print("|---|---|---|---|")
        for name in new_names:
            t1 = run_query(spark, name, sf01)
            t10 = run_query(spark, name, "/tmp/sf1")
            print(f"| {name} | {t1} | {t10} | {t10 / t1:.2f}x |", flush=True)


if __name__ == "__main__":
    main()
