"""In-session A/B round 2: bpe merge loop, khop edge pin, IVF compact
centroid localization, context-expansion corpus pin.  Same method as
ab_inline.py — OLD sources from HEAD exec'd into the current module
namespace, alternated rep-by-rep in one session."""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.ab_inline import PKG, old_fn  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import importlib

    opbpe = importlib.import_module(f"{PKG}.operators.bpe")
    qbpe = importlib.import_module(f"{PKG}.queries.bpe_vocab")
    qgra = importlib.import_module(f"{PKG}.queries.graph_analytics")
    qann = importlib.import_module(f"{PKG}.queries.ann_ivf_lsh")
    qing = importlib.import_module(f"{PKG}.queries.ingest_pipeline")

    new_bpe = opbpe.bpe_learn_merges
    old_bpe = old_fn(f"{PKG}/operators/bpe.py", "bpe_learn_merges", opbpe)
    direct = {
        "graph_khop_reach": (
            old_fn(f"{PKG}/queries/graph_analytics.py", "_graph_khop", qgra),
            qgra._graph_khop,
        ),
        "ann_ivf_index_compact": (
            old_fn(f"{PKG}/queries/ann_ivf_lsh.py", "_ann_ivf_index_compact", qann),
            qann._ann_ivf_index_compact,
        ),
        "serve_context_expansion": (
            old_fn(f"{PKG}/queries/ingest_pipeline.py", "_serve_context_expansion", qing),
            qing._serve_context_expansion,
        ),
    }

    spark = get_spark("ab_inline2")
    res: dict[tuple[str, str], list[float]] = {}
    for rep in range(args.reps):
        for variant in ("old", "new") if rep % 2 == 0 else ("new", "old"):
            opbpe.bpe_learn_merges = old_bpe if variant == "old" else new_bpe
            spark.sparkContext.setJobDescription(f"vocab_bpe_merges [{variant} rep {rep}]")
            t0 = time.perf_counter()
            qbpe._vocab_bpe_merges(spark, args.sf).write.mode("overwrite").format("noop").save()
            res.setdefault(("vocab_bpe_merges", variant), []).append(time.perf_counter() - t0)
            for name, (ofn, nfn) in direct.items():
                fn = ofn if variant == "old" else nfn
                spark.sparkContext.setJobDescription(f"{name} [{variant} rep {rep}]")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.mode("overwrite").format("noop").save()
                res.setdefault((name, variant), []).append(time.perf_counter() - t0)
    opbpe.bpe_learn_merges = new_bpe
    for name in ["vocab_bpe_merges", *direct]:
        o, n = res[(name, "old")][1:], res[(name, "new")][1:]
        print(
            f"{name:38s} old med {statistics.median(o):6.3f} min {min(o):6.3f}"
            f" | new med {statistics.median(n):6.3f} min {min(n):6.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
