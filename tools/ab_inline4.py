"""In-session A/B round 4 (optimization round 1 continuation): the
join-free window k-core peel and the single-join hash-walk step.  Same
method as ab_inline.py — OLD sources from `git show HEAD:<file>` exec'd
into the live module namespace, OLD/NEW alternated rep-by-rep in ONE
Spark session (order flipped each rep, first rep pair dropped as JVM
warmup).

Usage: python tools/ab_inline4.py [--reps N] [--sf DIR] [exp ...]
  exp in {kcore, walks}; default: all.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.ab_inline import PKG, old_fn  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
    REGISTRY,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("exps", nargs="*", default=None)
    args = ap.parse_args()
    exps = args.exps or ["kcore", "walks"]

    import importlib

    ograph = importlib.import_module(f"{PKG}.operators.graph")

    # experiment -> (op attr on operators.graph, bench entry)
    table = {
        "kcore": ("kcore", "graph_kcore_copurchase"),
        "walks": ("hash_walks", "graph_walk_corpus"),
        "prdang": ("pagerank", "graph_pagerank_dangling"),
        "prtrade": ("pagerank", "graph_pagerank_trade"),
    }

    spark = get_spark("ab4")
    sf = args.sf

    for exp in exps:
        attr, entry = table[exp]
        new = getattr(ograph, attr)
        old = old_fn(f"{PKG}/operators/graph.py", attr, ograph)
        fn, _ = REGISTRY[entry]

        def run(variant) -> float:
            setattr(ograph, attr, variant)
            t0 = time.perf_counter()
            df = fn(spark, sf)
            df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        olds: list[float] = []
        news: list[float] = []
        for i in range(args.reps + 1):
            order = [("old", old), ("new", new)] if i % 2 == 0 else [("new", new), ("old", old)]
            rep: dict[str, float] = {}
            for tag, variant in order:
                spark.sparkContext.setJobDescription(f"{entry} [{tag} rep {i}]")
                rep[tag] = run(variant)
            if i == 0:
                continue  # warmup pair
            olds.append(rep["old"])
            news.append(rep["new"])
            print(
                f"  rep {i}: old {rep['old']:.3f}  new {rep['new']:.3f}", flush=True
            )
        setattr(ograph, attr, new)
        print(
            f"{entry}: OLD med/min {statistics.median(olds):.3f}/{min(olds):.3f}  "
            f"NEW med/min {statistics.median(news):.3f}/{min(news):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
