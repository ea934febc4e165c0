"""One-shot refactoring script: split plans/pipeline_ops.py along the
registry's family seams (round-8 verdict item 7) into per-family modules
plus a shared pipeline_common.py, keeping pipeline_ops.py as a thin
backward-compatibility re-export. Pure text/AST manipulation — run once,
review the diff, delete or keep for the record.
"""

from __future__ import annotations

import ast
from collections import defaultdict
from pathlib import Path

PLANS = Path(__file__).resolve().parent.parent / (
    "nfl_big_data_bowl_2024_spark/plans"
)
SRC_PATH = PLANS / "pipeline_ops.py"

# family-prefix -> target module
ROUTE = {
    "txt": "pipeline_txt",
    "doc": "pipeline_txt",
    "evt": "pipeline_evt",
    "scd2": "pipeline_evt",
    "cdc": "pipeline_evt",
    "cogroup": "pipeline_evt",
    "dq": "pipeline_stats",
    "stat": "pipeline_stats",
    "agg": "pipeline_stats",
    "graph": "pipeline_graph",
    "spatial": "pipeline_graph",
    "dedup": "pipeline_sim",
    "sim": "pipeline_sim",
    "emb": "pipeline_sim",
    "ml": "pipeline_sim",
    "mm": "pipeline_sim",
    "pipeline": "pipeline_sim",
    "arr": "pipeline_sim",
    "json": "pipeline_sim",
}

MODULE_DOC = {
    "pipeline_txt": (
        "Text-analysis and document-curation queries (txt_*, doc_*): "
        "language ID, quality scoring, tokenization/BPE, fingerprinting, "
        "sampling/packing/splits/mixing."
    ),
    "pipeline_evt": (
        "Event-stream analytics queries (evt_*, scd2_*, cdc_*, cogroup_*): "
        "sessionization, attribution, time-series decomposition, "
        "changelog/SCD reconciliation."
    ),
    "pipeline_stats": (
        "Data-quality, statistics and sketch queries (dq_*, stat_*, "
        "agg_*): profiling, drift, hypothesis tests, HLL/CMS/KMV/bitmap "
        "sketches, grouped aggregates."
    ),
    "pipeline_graph": (
        "Graph and spatial queries (graph_*, spatial_*): PageRank/HITS, "
        "label propagation, k-core, reachability, proximity pairs."
    ),
    "pipeline_sim": (
        "Dedup, similarity, embedding, ML-training and multimodal "
        "queries (dedup_*, sim_*, emb_*, ml_*, mm_*, pipeline_*, arr_*, "
        "json_*)."
    ),
}

HEADER_NOTE = (
    '"""{doc}\n\n'
    "Split out of plans/pipeline_ops.py along the registry's family seams\n"
    "(round-9; see pipeline_ops.py for the compatibility re-export and\n"
    "pipeline_common.py for shared helpers/oracle fragments). Original\n"
    "docstrings, oracle SQL and reference citations moved verbatim.\n"
    '"""\n'
)


def main() -> None:
    src = SRC_PATH.read_text()
    lines = src.split("\n")
    tree = ast.parse(src)

    import_block_names: list[str] = []
    blocks: list[tuple[str, str, str]] = []  # (kind, name, text)
    prev_end = 0
    module_doc_node = tree.body[0]
    assert isinstance(module_doc_node, ast.Expr)
    prev_end = module_doc_node.end_lineno

    import_lines: list[str] = []
    for node in tree.body[1:]:
        start = node.lineno
        if isinstance(node, ast.FunctionDef) and node.decorator_list:
            start = min(d.lineno for d in node.decorator_list)
        # attach preceding comments/blanks to this block
        block_text = "\n".join(lines[prev_end:node.end_lineno])
        prev_end = node.end_lineno
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            import_lines.append(block_text)
            continue
        if isinstance(node, ast.FunctionDef):
            kind = "registered" if node.decorator_list else "support"
            blocks.append((kind, node.name, block_text))
        else:
            names = []
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    for n in ast.walk(t):
                        if isinstance(n, ast.Name):
                            names.append(n.id)
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                names.append(node.target.id)
            blocks.append(("support", ",".join(names), block_text))

    # support names (helpers, consts, unpacked tuples)
    support_names: list[str] = []
    for kind, name, _ in blocks:
        if kind == "support" and name:
            support_names.extend(name.split(","))

    # route registered functions; collect per-module referenced support names
    per_module: dict[str, list[str]] = defaultdict(list)
    per_module_names: dict[str, list[str]] = defaultdict(list)
    per_module_refs: dict[str, set] = defaultdict(set)
    support_set = set(support_names)
    for kind, name, text in blocks:
        if kind != "registered":
            continue
        fam = name.split("_")[0]
        mod = ROUTE[fam]
        per_module[mod].append(text)
        per_module_names[mod].append(name)
        fn_tree = ast.parse(text.strip() + "\n")
        for sub in ast.walk(fn_tree):
            if isinstance(sub, ast.Name) and sub.id in support_set:
                per_module_refs[mod].add(sub.id)

    imports_header = "\n".join(import_lines).strip()

    # pipeline_common.py: original imports + every support block in order
    common_parts = [
        '"""Shared helpers, oracle-SQL fragments and constants for the\n'
        "pipeline_* family modules (split out of pipeline_ops.py, round 9).\n"
        "Every definition moved verbatim; see the family modules for the\n"
        'registered queries that use them."""',
        "",
        imports_header,
        "",
    ]
    for kind, name, text in blocks:
        if kind == "support":
            common_parts.append(text)
    (PLANS / "pipeline_common.py").write_text(
        "\n".join(common_parts).rstrip() + "\n"
    )

    # family modules
    for mod, texts in sorted(per_module.items()):
        refs = sorted(per_module_refs[mod])
        ref_import = ""
        if refs:
            joined = ",\n    ".join(refs)
            ref_import = (
                f"from .pipeline_common import (  # noqa: F401\n    {joined},\n)\n"
            )
        parts = [
            HEADER_NOTE.format(doc=MODULE_DOC[mod]),
            imports_header,
            "",
            ref_import,
        ]
        parts.extend(texts)
        (PLANS / f"{mod}.py").write_text("\n".join(parts).rstrip() + "\n")

    # compatibility shim
    orig_doc = ast.get_source_segment(src, module_doc_node)
    shim = [
        orig_doc,
        "",
        "# Round-9 split: the registered queries now live in per-family",
        "# modules (pipeline_txt / pipeline_evt / pipeline_stats /",
        "# pipeline_graph / pipeline_sim) with shared helpers in",
        "# pipeline_common. This module remains as the stable import path:",
        "# every public and private name is re-exported below.",
        "",
        "from .pipeline_common import *  # noqa: F401,F403",
        "from .pipeline_common import (  # noqa: F401",
        "    " + ",\n    ".join(sorted(n for n in support_set)) + ",",
        "    _t,",
        ")",
    ]
    for mod in sorted(per_module):
        names = sorted(per_module_names[mod])
        shim.append(f"from .{mod} import (  # noqa: F401")
        shim.append("    " + ",\n    ".join(names) + ",")
        shim.append(")")
    SRC_PATH.write_text("\n".join(shim).rstrip() + "\n")
    print("wrote", sorted(per_module), "and pipeline_common + shim")
    for mod in sorted(per_module):
        p = PLANS / f"{mod}.py"
        print(mod, len(p.read_text().split("\n")), "lines")
    print(
        "common",
        len((PLANS / "pipeline_common.py").read_text().split("\n")),
        "lines",
    )


if __name__ == "__main__":
    main()
