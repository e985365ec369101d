"""Bench medians protocol (VERDICT r11 #3, artifact split r12 #2): run
the headline suite N times (default 3) as SEPARATE cold processes — the
same way the driver invokes bench.py — then write the PER-LINE MEDIANS
to ``BENCH_MEDIANS_r{round}.json`` (a filename bench.py never touches,
so a driver bench run can no longer clobber the committed medians) and
keep every raw run in the ``BENCH_RUNS_r{round}.json`` sidecar.
``BENCH_FULL.json`` is bench.py's per-run scratch output and stays
untracked.

Medians are computed over the UNION of query names across all runs and
the tool ASSERTS every name appears in every run (ADVICE r12 #4 — the
old version silently keyed on the last run's names and could median
over fewer samples than ``medians_of`` claimed); per-line sample counts
are therefore uniform by construction and recorded once.

Usage: python tools/bench_medians.py [n_runs] [round_tag]
  round_tag defaults to "dev"; the per-round close-out passes e.g. 13.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FULL = os.path.join(REPO, "BENCH_FULL.json")


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tag = sys.argv[2] if len(sys.argv) > 2 else "dev"
    sidecar = os.path.join(REPO, f"BENCH_RUNS_r{tag}.json")
    medians_path = os.path.join(REPO, f"BENCH_MEDIANS_r{tag}.json")
    runs: list[dict] = []
    for i in range(n_runs):
        print(f"run {i + 1}/{n_runs} ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            check=True,
            cwd=REPO,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(FULL) as fh:
            runs.append(json.load(fh))
        print(f"  total {runs[-1]['value']} s", flush=True)

    names = sorted(set().union(*(r["queries"] for r in runs)))
    missing = {
        n: [i for i, r in enumerate(runs) if n not in r["queries"]]
        for n in names
        if any(n not in r["queries"] for r in runs)
    }
    assert not missing, (
        f"query lines absent from some runs (bench.py completed with "
        f"check=True, so this is a registry nondeterminism bug): {missing}"
    )
    medians = {
        n: round(statistics.median(r["queries"][n] for r in runs), 3)
        for n in names
    }
    meta_keys = [k for k in runs[-1] if k != "queries"]
    disagree = {
        k: [r.get(k) for r in runs]
        for k in meta_keys
        if k != "value" and any(r.get(k) != runs[-1].get(k) for r in runs)
    }
    assert not disagree, f"non-query metadata differs across runs: {disagree}"
    out = {k: runs[-1][k] for k in meta_keys}
    out["queries"] = medians
    out["value"] = round(sum(medians.values()), 3)
    out["medians_of"] = n_runs
    out["samples_per_line"] = n_runs
    out["raw_runs"] = os.path.basename(sidecar)
    with open(medians_path, "w") as fh:
        json.dump(out, fh, indent=1)
    with open(sidecar, "w") as fh:
        json.dump(
            {
                "note": (
                    f"Raw per-run headline maps behind "
                    f"{os.path.basename(medians_path)}'s medians "
                    "(tools/bench_medians.py)."
                ),
                "totals": [r["value"] for r in runs],
                "runs": [r["queries"] for r in runs],
            },
            fh,
            indent=1,
        )
    print(
        f"medians written to {os.path.basename(medians_path)}: total "
        f"{out['value']} s over {len(medians)} lines "
        f"(raw totals: {[r['value'] for r in runs]})",
        flush=True,
    )


if __name__ == "__main__":
    main()
