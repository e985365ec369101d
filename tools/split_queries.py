"""One-shot splitter: break the monolithic queries.py into the
queries/ package (VERDICT r5 #9) — one module per family, composed
shared REGISTRY, identical execution order and rebinding semantics.

Mechanics: cut at section markers, ast-scan each part for defined and
used top-level names, and import every externally-resolved name from
its MOST RECENT definer among earlier parts (preserving single-file
rebinding semantics, e.g. the two _DD_TOKENS bindings).  The package
__init__ imports parts in order and re-exports all their globals.
"""

from __future__ import annotations

import ast
import builtins
import pathlib
import re
import sys

PKG = pathlib.Path(
    "postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark"
)
SRC = PKG / "queries.py"
OUT = PKG / "queries"

# (module_name, first_line) — each part runs to the next part's start.
PARTS = [
    ("flagship_knn", 137),      # Q2-Q4 KNN, L1-L3 status, P2/P3/P6, Q5/Q7, S2
    ("relational_core", 547),
    ("dedup", 692),
    ("textstats", 1207),
    ("ann_ivf_lsh", 1334),
    ("ingest_pipeline", 1849),
    ("multimodal", 2075),
    ("serving", 2300),
    ("token_usage", 2550),
    ("business_analytics", 2633),
    ("cluster_groupwise_skew", 3691),
    ("tpch_shapes", 3967),
    ("pq_quantization", 4142),
    ("scalar_asof_range", 4594),
    ("quality_sampling", 4805),
    ("vocab_subquery", 5193),
    ("retrieval", 5427),
    ("quant_search", 5892),
    ("pii_decontam_mixture", 6273),
    ("train_export", 6797),
    ("tpch_q7_q13_ivfsq8", 6903),
    ("c4_ccnet_linededup", 7080),
    ("corpus_prep", 7292),
    ("url_profile_misc", 7536),
    ("bpe_vocab", 8674),
    ("gate_window", 8733),
]


def top_level_defs(tree: ast.Module) -> list[str]:
    names: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        names.append(n.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.append(node.target.id)
        elif isinstance(node, ast.Import):
            names.extend(a.asname or a.name.split(".")[0] for a in node.names)
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            names.extend(a.asname or a.name for a in node.names)
        elif isinstance(node, (ast.For, ast.If, ast.While, ast.Try)):
            for n in ast.walk(node):
                if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Store):
                    names.append(n.id)
    return names


def used_names(tree: ast.Module) -> set[str]:
    return {
        n.id for n in ast.walk(tree) if isinstance(n, ast.Name)
    }


def main() -> None:
    lines = SRC.read_text().splitlines(keepends=True)
    n = len(lines)
    bounds = [(name, start - 1) for name, start in PARTS] + [("_end", n)]
    base_src = "".join(lines[: PARTS[0][1] - 1])

    part_srcs: list[tuple[str, str]] = []
    for (name, s), (_, e) in zip(bounds, bounds[1:]):
        part_srcs.append((name, "".join(lines[s:e])))

    def fix_rel(src: str) -> str:
        return re.sub(r"from \.(operators|functions|sources|streaming|plans)",
                      r"from ..\1", src)

    base_src = fix_rel(base_src)
    base_tree = ast.parse(base_src)
    builtin_names = set(dir(builtins)) | {"__name__", "__file__", "__doc__"}

    # definer map: name -> module providing it as of "now"
    definer: dict[str, str] = {d: "_base" for d in top_level_defs(base_tree)}

    OUT.mkdir(exist_ok=True)
    (OUT / "_base.py").write_text(base_src)

    modules: list[str] = []
    for name, src in part_srcs:
        src = fix_rel(src)
        tree = ast.parse(src)
        defs = top_level_defs(tree)
        used = used_names(tree)
        needed = sorted(
            u for u in used
            if u not in defs and u not in builtin_names and u in definer
        )
        unresolved = sorted(
            u for u in used
            if u not in defs and u not in builtin_names and u not in definer
        )
        if unresolved:
            print(f"[{name}] UNRESOLVED (forward refs or locals): {unresolved}")
        # group needed imports by definer module
        by_mod: dict[str, list[str]] = {}
        for u in needed:
            by_mod.setdefault(definer[u], []).append(u)
        header = ["# Auto-split from the monolithic queries.py (VERDICT r5 #9);",
                  "# registration side effects run at import, in package order.",
                  "from __future__ import annotations", ""]
        for mod in sorted(by_mod):
            imports = ", ".join(sorted(by_mod[mod]))
            line = f"from .{mod} import {imports}  # noqa: F401"
            if len(line) > 100:
                line = (f"from .{mod} import (  # noqa: F401\n    "
                        + ",\n    ".join(sorted(by_mod[mod])) + ",\n)")
            header.append(line)
        header.append("")
        (OUT / f"{name}.py").write_text("\n".join(header) + src)
        modules.append(name)
        for d in defs:
            definer[d] = name

    init = [
        '"""Registry package: per-family query modules composing the shared',
        "REGISTRY (split from the former monolithic queries.py; import order",
        '== original execution order; gate_window runs last and pins the',
        'driver\'s 50-entry CORRECTNESS window)."""',
        "",
        "from . import _base",
    ]
    init += [f"from . import {m}" for m in modules]
    init += [
        "",
        "# Re-export every module-level name (underscored included — tests and",
        "# tooling reach helpers like _events/_eval_* directly), later modules",
        "# winning, mirroring the single-file rebinding order.",
        "for _m in (_base, " + ", ".join(modules) + "):",
        "    globals().update(",
        "        {k: v for k, v in vars(_m).items() if not k.startswith('__')}",
        "    )",
        "del _m",
        "",
    ]
    (OUT / "__init__.py").write_text("\n".join(init))
    print("modules:", len(modules) + 1)


if __name__ == "__main__":
    sys.exit(main())
