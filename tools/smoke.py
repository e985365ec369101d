#!/usr/bin/env python
"""Pre-commit smoke gate — run before EVERY snapshot/commit (~5 s).

Round 3 was lost to an import-time KeyError that a 2-second
``python -c "import __spark_entry__"`` would have caught (VERDICT r3
item 2).  This script makes that class of failure structurally
impossible: it verifies the registry module imports, the three driver
entry points exist and agree, and pytest can collect every test module.

Usage::

    python tools/smoke.py        # exit 0 = safe to commit
"""
from __future__ import annotations

import subprocess
import sys

REPO = __file__.rsplit("/", 2)[0]


def main() -> int:
    sys.path.insert(0, REPO)
    # 1. The registry module must import (this alone would have saved r3).
    import __spark_entry__  # noqa: F401

    qs = __spark_entry__.queries()
    os_ = __spark_entry__.oracle_sql()
    assert callable(__spark_entry__.entry), "entry() missing"
    assert qs, "queries() is empty"
    stray = set(os_) - set(qs)
    assert not stray, f"oracle_sql keys with no queries() entry: {sorted(stray)}"
    # Oracle SQL strings must be fully composed — a stray brace means a
    # template placeholder survived into the shipped SQL (r3's crash class).
    import re

    marker = re.compile(r"\{[a-z_]+\}")  # {terms}-style; skips {"json"} and {2,}
    for name, sql in os_.items():
        hit = marker.search(sql)
        assert not hit, f"unsubstituted template marker in oracle[{name}]: {hit.group()}"
    print(f"import OK: {len(qs)} queries, {len(os_)} oracles")

    # 2. Every test module must collect (import chain reaches queries.py).
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    tail = (r.stdout or "").strip().splitlines()[-1:]
    print("collect:", *tail)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-2000:])
        return 1
    print("SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
