"""EXAMPLES.md drift gate.

EXAMPLES.md is the migration map a reference user reads first; a renamed
operator or module would silently rot it. This test keeps it honest
WITHOUT executing Spark jobs: every ```python block must compile, every
import in the blocks must resolve, and every `module.attr(...)` call on an
imported module must name a real attribute.
"""

from __future__ import annotations

import ast
import importlib
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# names the snippets use as free variables (documented placeholders)
PLACEHOLDERS = {
    "spark", "SF", "root", "url", "tables", "metadata", "docs", "emb",
    "feats", "tok_counts", "queries", "cents", "cur", "old", "delta_df",
    "watch_dir", "schema", "out_dir", "ckpt", "ckpt2", "counts_dir", "path",
    "df", "res", "all_history", "view",
}


def _python_blocks():
    text = open(os.path.join(REPO, "EXAMPLES.md")).read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_examples_blocks_compile_and_apis_exist():
    blocks = _python_blocks()
    assert len(blocks) >= 10, "EXAMPLES.md lost its code blocks?"
    imported: dict[str, object] = {}
    for i, block in enumerate(blocks):
        tree = compile(block, f"EXAMPLES.md[block {i}]", "exec", ast.PyCF_ONLY_AST)
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module:
                mod = importlib.import_module(node.module)
                for alias in node.names:
                    assert hasattr(mod, alias.name) or importlib.util.find_spec(
                        f"{node.module}.{alias.name}"
                    ), f"block {i}: {node.module}.{alias.name} missing"
                    imported[alias.asname or alias.name] = getattr(
                        mod, alias.name, None
                    ) or importlib.import_module(f"{node.module}.{alias.name}")
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    imported[alias.asname or alias.name.split(".")[0]] = (
                        importlib.import_module(alias.name.split(".")[0])
                    )
        # every module.attr(...) call on something we imported must exist
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            f = node.func
            if (
                isinstance(f, ast.Attribute)
                and isinstance(f.value, ast.Name)
                and f.value.id in imported
                and f.value.id not in PLACEHOLDERS
            ):
                target = imported[f.value.id]
                assert hasattr(target, f.attr), (
                    f"block {i}: {f.value.id}.{f.attr} referenced in "
                    f"EXAMPLES.md does not exist"
                )
