#!/usr/bin/env python
"""Regenerate API.md from source docstrings.

One line per public top-level function/class (first docstring
sentence, truncated), grouped by module. Run from the repo root:

    python tools/gen_api_md.py
"""

from __future__ import annotations

import ast
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "cdc_data_pipeline_spark"
WIDTH = 110

HEADER = """# API.md — public surface quick reference

One line per public function/class (docstring first sentence),
grouped by module. Generated from source docstrings
(`python tools/gen_api_md.py`); see each docstring for semantics,
scale notes, and reference citations.
"""


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.strip().split())
    for i, ch in enumerate(text):
        if ch in ".!?" and (i + 1 == len(text) or text[i + 1] == " "):
            text = text[:i]
            break
    if len(text) > WIDTH:
        text = text[:WIDTH].rstrip() + " ..."
    return text


def module_lines(path: Path) -> list[str]:
    tree = ast.parse(path.read_text())
    rel = path.relative_to(ROOT)
    out = [f"## `{rel}`"]
    moddoc = ast.get_docstring(tree)
    if moddoc:
        out.append(f"*{first_sentence(moddoc)}.*")
    out.append("")
    n = 0
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name.startswith("_"):
                continue
            kind = "class" if isinstance(node, ast.ClassDef) else "def"
            out.append(f"- `{node.name}` ({kind}) — "
                       f"{first_sentence(ast.get_docstring(node))}")
            n += 1
    if n == 0:
        return []
    out.append("")
    return out


def main() -> None:
    lines = [HEADER]
    files = sorted(PKG.rglob("*.py")) + [ROOT / "__spark_entry__.py",
                                         ROOT / "bench.py",
                                         ROOT / "scale_soak.py"]
    for f in files:
        if f.name == "__init__.py" and not ast.get_docstring(
                ast.parse(f.read_text())):
            continue
        lines.extend(module_lines(f))
    (ROOT / "API.md").write_text("\n".join(lines).rstrip() + "\n")
    print(f"wrote API.md ({len(lines)} lines)")


if __name__ == "__main__":
    main()
