#!/usr/bin/env python
"""Static-analysis gate (`make lint`) — the repo's clippy `-D warnings`
parity (/root/reference/Makefile:51-63 runs clippy over 4 configs).

This image ships no ruff/mypy/flake8 and installs are not permitted, so the
gate is a focused AST linter over the checks that matter for this codebase,
run with warnings-as-errors semantics (any finding fails the build):

  * F401 unused imports (per module, `__init__.py` re-exports exempt)
  * F811 redefinition of a top-level def/class by another def/class
  * E722 bare `except:`
  * B006 mutable default arguments
  * B023 `assert` on a tuple literal (always true)
  * W605 invalid escape sequences (via compile() SyntaxWarning)
  * syntax errors anywhere (compileall semantics)

Scope: the package, tests, benches, tools, examples, and the entry file.
"""

from __future__ import annotations

import ast
import sys
import warnings
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SCOPES = ["concrete_ntt_tpu", "tests", "benches", "tools", "examples"]
EXTRA_FILES = ["bench.py", "__graft_entry__.py"]

# names that look unused but are load-bearing (re-export / fixture protocols)
ALLOW_UNUSED_IN = {"__init__.py", "conftest.py"}


def _files():
    for scope in SCOPES:
        base = ROOT / scope
        if base.is_dir():
            yield from sorted(base.rglob("*.py"))
    for f in EXTRA_FILES:
        p = ROOT / f
        if p.exists():
            yield p


class Visitor(ast.NodeVisitor):
    def __init__(self, path: Path):
        self.path = path
        self.problems: list[tuple[int, str, str]] = []
        self.imported: dict[str, int] = {}  # name -> lineno
        self.used: set[str] = set()
        self.toplevel_defs: dict[str, int] = {}

    def err(self, lineno: int, code: str, msg: str):
        self.problems.append((lineno, code, msg))

    # -- imports ------------------------------------------------------------
    def visit_Import(self, node: ast.Import):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported.setdefault(name, node.lineno)

    def visit_ImportFrom(self, node: ast.ImportFrom):
        for a in node.names:
            if a.name == "*":
                continue
            self.imported.setdefault(a.asname or a.name, node.lineno)

    def visit_Name(self, node: ast.Name):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute):
        self.generic_visit(node)

    # -- smells -------------------------------------------------------------
    def visit_ExceptHandler(self, node: ast.ExceptHandler):
        if node.type is None:
            self.err(node.lineno, "E722", "bare `except:`")
        self.generic_visit(node)

    def _check_defaults(self, node):
        for d in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.err(d.lineno, "B006", "mutable default argument")

    def visit_FunctionDef(self, node: ast.FunctionDef):
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef):
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_Assert(self, node: ast.Assert):
        if isinstance(node.test, ast.Tuple) and node.test.elts:
            self.err(node.lineno, "B023", "assert on a tuple is always true")
        self.generic_visit(node)


def _toplevel_redefs(tree: ast.Module, v: Visitor):
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen and not any(
                isinstance(d, ast.Attribute) or isinstance(d, ast.Name)
                for d in getattr(node, "decorator_list", [])
            ):
                v.err(
                    node.lineno,
                    "F811",
                    f"redefinition of `{node.name}` (first at line {seen[node.name]})",
                )
            seen[node.name] = node.lineno


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always", SyntaxWarning)
            compile(src, str(path), "exec")
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    out = []
    for w in caught:
        if issubclass(w.category, SyntaxWarning):
            out.append(f"{path}:{w.lineno or 0}: W605 {w.message}")
    v = Visitor(path)
    v.visit(tree)
    _toplevel_redefs(tree, v)
    if path.name not in ALLOW_UNUSED_IN:
        # string-annotation / __all__ usage counts as used
        for s in ast.walk(tree):
            if isinstance(s, ast.Constant) and isinstance(s.value, str):
                v.used.update(
                    part for part in s.value.replace(",", " ").split() if part.isidentifier()
                )
        for name, lineno in sorted(v.imported.items(), key=lambda kv: kv[1]):
            if name == "annotations":  # `from __future__ import annotations`
                continue
            if name.isupper():  # UPPER_CASE constant re-export (public surface)
                continue
            if name not in v.used and not name.startswith("_"):
                v.err(lineno, "F401", f"`{name}` imported but unused")
    for lineno, code, msg in sorted(v.problems):
        out.append(f"{path}:{lineno}: {code} {msg}")
    return out


def main() -> int:
    problems = []
    n = 0
    for f in _files():
        n += 1
        problems += lint_file(f)
    for p in problems:
        print(p)
    print(f"lint: {n} files checked, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
