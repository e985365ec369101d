"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
order-insensitive values (exact after the queries' own rounding).

Usage: python tools/check_oracle.py [--json OUT.json]
           [--sample N --seed R] [sf_dir] [name ...]

``--json`` additionally writes the PER-ENTRY record (pass/rows/sec per
entry plus the failure reason for red rows) — the committed round
artifact CORRECTNESS_LOCAL_r{N}.json (VERDICT r6 #2: a summary note is
not evidence; the row-level record is).

``--sample N --seed R`` (VERDICT r12 item 4) runs a REPRODUCIBLE
pseudo-random sample of N entries drawn from the never-driver-evidenced
tail: entries with no green row in any committed CORRECTNESS_r*.json
(green = rows_match, err null, hash/schema not false).  The draw is
``random.Random(R).sample`` over the sorted tail, so a judge holding
the same snapshot set and seed re-draws the SAME names; the --json
record carries the seed, the tail size, the snapshot list, and the
drawn names, making the committed sample independently re-runnable.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}" if v == v else v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v) if v is not None else "<NULL>"


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# VERDICT r11 #2: per-entry salted result hash in the --json record, so
# CORRECTNESS_LOCAL_r{N}.json carries evidence a judge can diff across
# rounds WITHOUT re-executing 379 queries (when both engines pass, they
# agree on the canonical rows by construction, so one hash certifies
# both).  The salt is a fixed literal — it must be stable across rounds
# or the cross-round diff is meaningless; it exists so the hash is
# specific to this gate's canonicalization, not a generic row hash.
_HASH_SALT = "spark-graft-local-gate-v1"


def _result_hash(canon_rows, cols) -> str:
    import hashlib

    h = hashlib.md5()
    h.update(_HASH_SALT.encode())
    h.update(("|".join(sorted(cols))).encode())
    for row in canon_rows:
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()[:16]


def _never_evidenced_tail(all_names) -> tuple[list[str], list[str]]:
    """Entries with no green row in any committed driver snapshot."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snaps = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    evidenced: set[str] = set()
    for path in snaps:
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match") is True
                and row.get("err") in (None, "")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            ):
                evidenced.add(name)
    tail = [n for n in all_names if n not in evidenced]
    return tail, [os.path.basename(p) for p in snaps]


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sample_n = sample_seed = None
    if "--sample" in argv:
        i = argv.index("--sample")
        sample_n = int(argv[i + 1])
        del argv[i : i + 2]
        i = argv.index("--seed")
        sample_seed = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    record: dict[str, dict] = {}
    sample_meta = None

    import __spark_entry__ as entrymod
    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # Warm up JVM + a Python worker before the first timed query so
    # per-query numbers reflect the query, not session spin-up.
    import gc

    from pyspark.sql import functions as _F
    spark.range(100).select(
        _F.pandas_udf(lambda s: s, "long")(_F.col("id"))
    ).write.mode("overwrite").format("noop").save()

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if sample_n is not None:
        import random

        tail, snaps = _never_evidenced_tail(list(qs))
        drawn = sorted(
            random.Random(sample_seed).sample(tail, min(sample_n, len(tail)))
        )
        only = set(drawn)
        sample_meta = {
            "seed": sample_seed,
            "requested": sample_n,
            "tail_size": len(tail),
            "snapshots": snaps,
            "names": drawn,
        }
        print(
            f"tail sample: {len(drawn)} of {len(tail)} never-driver-"
            f"evidenced entries (seed {sample_seed}, {len(snaps)} snapshots)"
        )
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Release DataFrames/checkpointed RDDs from the previous query so
        # their cleanup doesn't bleed into this query's timing.
        gc.collect()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            record[name] = {"pass": False, "reason": f"spark error: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s) [no oracle]")
            record[name] = {
                "pass": True, "rows": len(s_rows), "rows_only": True,
                "sec": round(time.time() - t0, 1),
                "hash": _result_hash(_canon(s_rows, s_cols), s_cols),
            }
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            record[name] = {"pass": False, "reason": f"duckdb error: {e}"}
            n_fail += 1
            continue
        problems = []
        # Structural gate (round 7): an oracle whose FINAL projection
        # yields HUGEINT/DECIMAL (e.g. uncast DuckDB sum()) passes a
        # fetchall() compare here but reaches an arrow/pandas-fetching
        # driver as decimal/float — the r6 vocab_bpe_merges flake.
        # DESCRIBE binds without executing, so this is ~free.
        try:
            dtypes = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            banned = [
                f"{r[0]}:{r[1]}"
                for r in dtypes
                if "HUGEINT" in r[1].upper() or "DECIMAL" in r[1].upper()
            ]
            if banned:
                problems.append(f"hugeint/decimal-final oracle column (cast it): {banned}")
        except Exception:
            pass  # DESCRIBE unsupported for this statement shape: skip
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        res_hash = None
        if not problems:
            cs, cd = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
            if cs != cd:
                diff = next((i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
                problems.append(f"values differ at sorted row {diff[0]}: spark={diff[1]} duckdb={diff[2]}")
            else:
                res_hash = _result_hash(cs, s_cols)  # both engines agree on it
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            record[name] = {"pass": False, "reason": "; ".join(problems)}
            n_fail += 1
        else:
            print(f"pass {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")
            record[name] = {
                "pass": True, "rows": len(s_rows),
                "sec": round(time.time() - t0, 1),
                "hash": res_hash,
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "note": (
                        "Full local replica of the driver's CORRECTNESS gate "
                        "over the ENTIRE registry (the driver's own snapshot "
                        "records only the first 50 entries). Generated by "
                        "tools/check_oracle.py --json. Each passing entry "
                        "carries a salted md5-prefix hash of the canonical "
                        "(column-sorted, row-sorted, cell-normalized) result "
                        "that BOTH engines agreed on — diffable across "
                        "rounds without re-execution (salt is the fixed "
                        f"literal '{_HASH_SALT}')."
                    ),
                    "sf_dir": sf_dir,
                    "n_entries": n_pass + n_fail,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    **({"tail_sample": sample_meta} if sample_meta else {}),
                    "results": record,
                },
                fh,
                indent=1,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
