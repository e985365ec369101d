"""In-session A/B: alternate OLD (HEAD) and NEW (working tree) versions
of changed functions rep-by-rep inside ONE Spark session, so multi-
minute host-noise windows hit both variants equally.

OLD function sources are extracted from `git show HEAD:<file>` and
exec'd against the CURRENT module's namespace (all module-level helpers
still exist), so only the function body differs.

Usage: python tools/ab_inline.py [--reps N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
    REGISTRY,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)

PKG = "postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark"


def old_fn(relpath: str, fn_name: str, ns_module) -> object:
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"HEAD:{relpath}"],
        capture_output=True, text=True, check=True,
    ).stdout
    lines = src.split("\n")
    start = next(
        i for i, l in enumerate(lines) if l.startswith(f"def {fn_name}(")
    )
    end = next(
        (
            i
            for i in range(start + 1, len(lines))
            if lines[i] and not lines[i][0].isspace() and not lines[i].startswith(")")
        ),
        len(lines),
    )
    fn_src = "\n".join(lines[start:end])
    ns = dict(ns_module.__dict__)
    exec(compile(fn_src, f"<HEAD:{relpath}>", "exec"), ns)  # noqa: S102
    return ns[fn_name]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import importlib

    opret = importlib.import_module(f"{PKG}.operators.retrieval")
    opsk = importlib.import_module(f"{PKG}.operators.sketch")
    qret = importlib.import_module(f"{PKG}.queries.retrieval")
    qdrift = importlib.import_module(f"{PKG}.queries.drift_survival")
    qprep = importlib.import_module(f"{PKG}.queries.corpus_prep")

    new = {
        "bm25": opret.bm25_topk,
        "qq": opsk.qsketch_quantiles_grouped,
        "spearman": qdrift._stats_spearman,
        "prep": qprep._llm_corpus_prep,
    }
    old = {
        "bm25": old_fn(f"{PKG}/operators/retrieval.py", "bm25_topk", opret),
        "qq": old_fn(f"{PKG}/operators/sketch.py", "qsketch_quantiles_grouped", opsk),
        "spearman": old_fn(f"{PKG}/queries/drift_survival.py", "_stats_spearman", qdrift),
        "prep": old_fn(f"{PKG}/queries/corpus_prep.py", "_llm_corpus_prep", qprep),
    }

    def set_variant(d):
        opret.bm25_topk = d["bm25"]
        qret.bm25_topk = d["bm25"]  # from-import binding in queries.retrieval
        opsk.qsketch_quantiles_grouped = d["qq"]

    queries = [
        "retrieval_prf_expansion",
        "hybrid_minmax_knn_bm25",
        "bm25_topk_docs",
        "sketch_quantiles_by_nation",
    ]
    direct = {"stats_spearman_rank_corr": "spearman", "pipeline_llm_corpus_prep": "prep"}

    spark = get_spark("ab_inline")
    res: dict[tuple[str, str], list[float]] = {}
    for rep in range(args.reps):
        for variant in ("old", "new") if rep % 2 == 0 else ("new", "old"):
            d = old if variant == "old" else new
            set_variant(d)
            for name in queries:
                fn, _ = REGISTRY[name]
                spark.sparkContext.setJobDescription(f"{name} [{variant} rep {rep}]")
                t0 = time.perf_counter()
                df = fn(spark, args.sf)
                df.write.mode("overwrite").format("noop").save()
                res.setdefault((name, variant), []).append(time.perf_counter() - t0)
            for name, key in direct.items():
                spark.sparkContext.setJobDescription(f"{name} [{variant} rep {rep}]")
                t0 = time.perf_counter()
                df = d[key](spark, args.sf)
                df.write.mode("overwrite").format("noop").save()
                res.setdefault((name, variant), []).append(time.perf_counter() - t0)
    set_variant(new)
    for name in queries + list(direct):
        o, n = res[(name, "old")][1:], res[(name, "new")][1:]
        print(
            f"{name:38s} old med {statistics.median(o):6.3f} min {min(o):6.3f}"
            f" | new med {statistics.median(n):6.3f} min {min(n):6.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
