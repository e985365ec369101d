"""Round-13 plan audit: construct every headline query's plan and flag
structural smells — repeated source scans (branch-copy re-derivation),
very large plans (construction overhead), SortMergeJoins, and Python
eval nodes.  Construction-only where possible (entries whose fn() runs
jobs — index builds, driver-side fits — still pay those jobs).

Usage: python tools/plan_audit.py [--sf DIR] [names...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (  # noqa: E402
    REGISTRY,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("plan_audit")
    print(f"{'query':42s} {'ctor_s':>6s} {'scans':>5s} {'exch':>4s} {'smj':>4s} {'win':>4s} {'py':>3s} {'nodes':>6s}")
    for name in names:
        fn, _ = REGISTRY.get(name, (None, None))
        if fn is None:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} ERROR {type(e).__name__}: {e}")
            continue
        ctor = time.perf_counter() - t0
        scans = len(re.findall(r"Scan parquet", plan))
        exch = len(re.findall(r"\bExchange\b", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        win = len(re.findall(r"\bWindow\b", plan))
        py = len(re.findall(r"EvalPython|MapInArrow|MapInPandas", plan))
        nodes = len(re.findall(r"^\(\d+\)", plan, re.M))
        print(
            f"{name:42s} {ctor:6.2f} {scans:5d} {exch:4d} {smj:4d} {win:4d} {py:3d} {nodes:6d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
