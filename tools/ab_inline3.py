"""In-session A/B round 3: single-pass contingency marginals (PMI,
chi2, Cramér's V), funnel/retention step pins, attribution pair pins,
Brier per-bin pin, KM per_t pin, KMV distinct-key reuse, seasonal
month pins, waterfill relation pins.  Same method as ab_inline.py —
OLD sources from HEAD exec'd into the current module namespace,
alternated rep-by-rep in one session."""

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

    qab = importlib.import_module(f"{PKG}.queries.analytics_breadth")
    qml = importlib.import_module(f"{PKG}.queries.ml_classify")
    qsk = importlib.import_module(f"{PKG}.queries.sketches")
    qds = importlib.import_module(f"{PKG}.queries.drift_survival")
    qpm = importlib.import_module(f"{PKG}.queries.pii_decontam_mixture")
    qup = importlib.import_module(f"{PKG}.queries.url_profile_misc")
    ofu = importlib.import_module(f"{PKG}.operators.funnel")
    omo = importlib.import_module(f"{PKG}.operators.monitoring")
    ogw = importlib.import_module(f"{PKG}.operators.groupwise")

    # query-level swaps: (entry name, module, fn attr)
    direct = [
        ("text_pmi_collocations", qab, "_pmi_collocations"),
        ("stats_cramers_v_lang_source", qab, "_cramers_v"),
        ("stats_chi2_lang_source", qab, "_chi2_profile"),
        ("events_attribution_position", qab, "_attribution_position"),
        ("eval_brier_decomposition", qml, "_eval_brier"),
        ("sketch_kmv_priority_overlap", qsk, "_sketch_kmv_overlap"),
        ("orders_seasonal_decompose", qds, "_orders_seasonal"),
    ]
    dpairs = {}
    for name, mod, attr in direct:
        rel = f"{PKG}/queries/{mod.__name__.split('.')[-1]}.py"
        dpairs[name] = (old_fn(rel, attr, mod), getattr(mod, attr), mod, attr)

    # operator-level swaps driving entries through the registry fns
    op_old = {
        "funnel_counts": old_fn(f"{PKG}/operators/funnel.py", "funnel_counts", ofu),
        "cohort_retention": old_fn(f"{PKG}/operators/funnel.py", "cohort_retention", ofu),
        "km_curve": old_fn(f"{PKG}/operators/monitoring.py", "km_curve", omo),
        "waterfill_budget": old_fn(f"{PKG}/operators/groupwise.py", "waterfill_budget", ogw),
    }
    op_new = {k: getattr(ofu if k in ("funnel_counts", "cohort_retention") else omo if k == "km_curve" else ogw, k) for k in op_old}

    def set_ops(d):
        ofu.funnel_counts = d["funnel_counts"]
        ofu.cohort_retention = d["cohort_retention"]
        omo.km_curve = d["km_curve"]
        ogw.waterfill_budget = d["waterfill_budget"]
        qpm.waterfill_budget = d["waterfill_budget"]  # module-level from-import

    op_entries = [
        ("events_funnel_conversion", qup._events_funnel),
        ("events_funnel_deadline", qup._events_funnel_deadline),
        ("events_weekly_retention", qup._events_retention),
        ("customer_survival_km", qds._customer_km),
        ("train_waterfill_token_budget", qpm._waterfill_token_budget),
    ]

    spark = get_spark("ab_inline3")
    res: dict[tuple[str, str], list[float]] = {}
    for rep in range(args.reps):
        for variant in ("old", "new") if rep % 2 == 0 else ("new", "old"):
            set_ops(op_old if variant == "old" else op_new)
            for name, (ofn, nfn, mod, attr) in dpairs.items():
                setattr(mod, attr, ofn if variant == "old" else nfn)
                fn = getattr(mod, attr)
                spark.sparkContext.setJobDescription(f"{name} [{variant} rep {rep}]")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.mode("overwrite").format("noop").save()
                res.setdefault((name, variant), []).append(time.perf_counter() - t0)
            for name, fn in op_entries:
                spark.sparkContext.setJobDescription(f"{name} [{variant} rep {rep}]")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.mode("overwrite").format("noop").save()
                res.setdefault((name, variant), []).append(time.perf_counter() - t0)
    set_ops(op_new)
    for name, (ofn, nfn, mod, attr) in dpairs.items():
        setattr(mod, attr, nfn)
    for name in [*dpairs, *[n for n, _ in op_entries]]:
        o, n = res[(name, "old")][1:], res[(name, "new")][1:]
        print(
            f"{name:34s} old med {statistics.median(o):6.3f} min {min(o):6.3f}"
            f" | new med {statistics.median(n):6.3f} min {min(n):6.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
