"""Static-analysis gate (reference CI runs clippy + CodeQL — CI.yml;
no third-party linter ships in this image, so this is a stdlib AST pass).

Checks, per Python source file:
  * syntax (ast.parse — the hard gate),
  * unused module-level imports (heuristic: imported name never referenced
    as a Name/Attribute head anywhere in the module, including __all__),
  * bare `except:` clauses,
  * mutable default arguments (list/dict/set literals).

Usage: python scripts/lint.py [paths...]   (default: crescent_tpu/ tests/
scripts/ sample/ __graft_entry__.py bench.py).  Exit 1 on any finding.
"""

from __future__ import annotations

import ast
import os
import sys


def iter_py(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                dirs[:] = [d for d in dirs if d not in ("__pycache__", ".git")]
                for f in files:
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def used_names(tree: ast.AST) -> set[str]:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # head of a dotted path: walk to the root Name
            cur = node
            while isinstance(cur, ast.Attribute):
                cur = cur.value
            if isinstance(cur, ast.Name):
                used.add(cur.id)
        elif isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)  # __all__ strings, getattr-by-name
    return used


def check_file(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        src = f.read()
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    problems = []
    used = used_names(tree)

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare except")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{path}:{d.lineno}: mutable default argument"
                    )

    # unused module-level imports (top-level statements only; imports inside
    # functions are often lazy/optional by design in this codebase)
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                bound = a.asname or a.name.split(".")[0]
                if bound not in used:
                    problems.append(
                        f"{path}:{node.lineno}: unused import '{bound}'"
                    )
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                bound = a.asname or a.name
                if bound not in used:
                    problems.append(
                        f"{path}:{node.lineno}: unused import '{bound}'"
                    )
    return problems


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sys.argv[1:] or [
        os.path.join(repo, d)
        for d in ("crescent_tpu", "tests", "scripts")
    ] + [os.path.join(repo, "__graft_entry__.py"), os.path.join(repo, "bench.py")]
    all_problems = []
    nfiles = 0
    for f in iter_py(paths):
        nfiles += 1
        all_problems += check_file(f)
    for p in all_problems:
        print(p)
    print(f"lint: {nfiles} files, {len(all_problems)} findings")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
