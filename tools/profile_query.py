"""Round-13 optimization profiler: time individual headline queries on
the bench's exact basis (construct + noop execute, median of N) and
capture ``.explain("formatted")`` to ``plans/r13/<name>_<tag>.txt``.

Usage:
    python tools/profile_query.py [--sf DIR] [--reps N] [--tag before] \
        [--no-plan] name [name ...]

Timing basis matches bench.py: the timer starts BEFORE plan
construction and ends after the noop write returns.  Each query is
labeled via setJobDescription so a UI trace maps jobs to queries.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
    REGISTRY,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None, help="plan file suffix, e.g. before/after; omit to skip plan dump")
    ap.add_argument("--round", default="r14", help="plans/<round>/ output dir")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    plan_dir = os.path.join(REPO, "plans", args.round)
    os.makedirs(plan_dir, exist_ok=True)

    for name in args.names:
        fn, _ = REGISTRY[name]
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} [rep {i}]")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(runs)
        print(f"{name}: median {med:.3f}s  runs={[round(r, 3) for r in runs]}", flush=True)
        if args.tag:
            df = fn(spark, args.sf)
            out = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(out)


if __name__ == "__main__":
    main()
