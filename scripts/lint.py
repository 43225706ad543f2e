#!/usr/bin/env python
# coding: utf-8
"""First-party lint gate (pyflakes is not available in this environment).

Checks, per file: (1) the file parses; (2) every imported name is used
somewhere in the module (unused-import — the most common dead-code
regression); (3) no duplicate top-level definitions (redefinition shadowing).
Exit code is nonzero on any finding, so `make check` / `make ci` actually
fail — mirroring the role of the reference's lint CI
(/root/reference/.github/workflows/main.yml:44-51).
"""
import ast
import sys
from pathlib import Path

# imports that are intentionally "unused": re-exports and side-effect imports
ALLOW_UNUSED = {
    "__init__.py": {"*"},
    "conftest.py": {"*"},
}


def _imported_names(tree):
    """Yield (name_bound_in_module, ast node) for every import."""
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                bound = alias.asname or alias.name.split(".")[0]
                yield bound, node
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name == "*":
                    continue
                bound = alias.asname or alias.name
                yield bound, node


def _used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # a.b.c — record the root name via the Name child (ast.walk covers)
            pass
    # names used only in docstring doctests or __all__ strings
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for el in ast.walk(node.value):
                        if isinstance(el, ast.Constant) and isinstance(
                                el.value, str):
                            used.add(el.value)
    return used


def _duplicate_toplevel(tree):
    seen = {}
    dups = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            if node.name in seen:
                dups.append((node.name, node.lineno, seen[node.name]))
            seen[node.name] = node.lineno
    return dups


def lint_file(path: Path):
    findings = []
    src = path.read_text(encoding="utf-8")
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    allow = ALLOW_UNUSED.get(path.name, set())
    if "*" not in allow:
        used = _used_names(tree)
        for name, node in _imported_names(tree):
            if name not in used and name not in allow:
                findings.append(
                    f"{path}:{node.lineno}: unused import '{name}'")
    for name, lineno, first in _duplicate_toplevel(tree):
        findings.append(
            f"{path}:{lineno}: redefinition of '{name}' (first at {first})")
    return findings


def main(argv):
    roots = argv[1:] or ["joeys2t_tpu", "scripts", "tests", "bench.py",
                         "__graft_entry__.py"]
    files = []
    for r in roots:
        p = Path(r)
        files.extend(sorted(p.rglob("*.py")) if p.is_dir() else [p])
    findings = []
    for f in files:
        findings.extend(lint_file(f))
    for line in findings:
        print(line)
    print(f"lint: {len(files)} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
