#!/usr/bin/env python
"""Static-analysis gate (stdlib-only; no flake8/ruff in this image).

Checks, per source file:
  - syntax (compile)
  - unused imports (module-level and function-level, AST walk)
  - redefined top-level functions/classes
  - bare `except:` clauses
  - mutable default arguments (list/dict/set literals)
  - tabs in indentation

Run: python scripts/lint.py [paths...]   (default: palace_tpu)
Exit 1 on any finding.  Wired into the test suite via tests/test_lint.py
(reference analogue: the clang-tidy/cppcheck gate of
/root/reference/.clang-tidy and CI workflows).
"""

from __future__ import annotations

import ast
import os
import sys


def iter_py(paths):
    for p in paths:
        if os.path.isfile(p):
            yield p
        else:
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def _used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # leftmost name of dotted access
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def check_file(path: str):
    findings = []
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    for i, line in enumerate(src.splitlines(), 1):
        stripped = line.lstrip("\t ")
        indent = line[: len(line) - len(stripped)]
        if "\t" in indent:
            findings.append((i, "tab in indentation"))
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [(e.lineno or 0, f"syntax error: {e.msg}")]

    # Unused module-level imports (strings in __all__ and docstring
    # references don't count; re-export modules are skipped).
    base = os.path.basename(path)
    if base != "__init__.py":
        imported = {}
        for node in tree.body:
            if isinstance(node, ast.Import):
                for a in node.names:
                    name = (a.asname or a.name).split(".")[0]
                    imported[name] = node.lineno
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    if a.name == "*":
                        continue
                    imported[a.asname or a.name] = node.lineno
        used = _used_names(tree)
        for node in ast.walk(tree):
            if isinstance(node, ast.Constant) and isinstance(node.value, str):
                used.update(node.value.split())
        for name, lineno in sorted(imported.items(), key=lambda kv: kv[1]):
            if name not in used and not name.startswith("_"):
                findings.append((lineno, f"unused import '{name}'"))

    # Redefinitions, bare excepts, mutable defaults.
    top = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in top:
                findings.append(
                    (node.lineno, f"redefinition of '{node.name}' "
                                  f"(first at line {top[node.name]})"))
            top[node.name] = node.lineno
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            findings.append((node.lineno, "bare 'except:'"))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        (d.lineno, f"mutable default argument in "
                                   f"'{node.name}'"))
    return findings


def main(argv):
    paths = argv[1:] or ["palace_tpu"]
    n = 0
    for path in iter_py(paths):
        for lineno, msg in check_file(path):
            print(f"{path}:{lineno}: {msg}")
            n += 1
    if n:
        print(f"{n} finding(s)")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
