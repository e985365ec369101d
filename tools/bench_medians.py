"""Bench medians protocol (VERDICT r11 #3): run the headline suite N
times (default 3) as SEPARATE cold processes — the same way the driver
invokes bench.py — then rewrite BENCH_FULL.json with the PER-LINE
MEDIANS and keep every raw run in the BENCH_RUNS sidecar, so the
committed number is reproducible instead of one draw from the host's
noise band (r11 measured a 139-171 s same-tree spread).

Usage: python tools/bench_medians.py [n_runs] [sidecar.json]
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
    sidecar = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_RUNS_r12.json"
    )
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

    names = list(runs[-1]["queries"])
    medians = {
        n: round(statistics.median(r["queries"][n] for r in runs if n in r["queries"]), 3)
        for n in names
    }
    out = dict(runs[-1])
    out["queries"] = medians
    out["value"] = round(sum(medians.values()), 3)
    out["medians_of"] = n_runs
    out["raw_runs"] = os.path.basename(sidecar)
    with open(FULL, "w") as fh:
        json.dump(out, fh, indent=1)
    with open(sidecar, "w") as fh:
        json.dump(
            {
                "note": (
                    "Raw per-run headline maps behind BENCH_FULL.json's "
                    "medians (tools/bench_medians.py)."
                ),
                "totals": [r["value"] for r in runs],
                "runs": [r["queries"] for r in runs],
            },
            fh,
            indent=1,
        )
    print(
        f"medians written: total {out['value']} s over {len(medians)} lines "
        f"(raw totals: {[r['value'] for r in runs]})",
        flush=True,
    )


if __name__ == "__main__":
    main()
