#!/usr/bin/env python
"""In-repo linter (ruff/pyflakes are not installable in this image).

Static checks, stdlib-only (ast + symtable):

  F401  unused import
  F821  undefined name (module/function scopes via symtable resolution)
  F811  import shadowed by a later import of the same name
  B006  mutable default argument
  F541  f-string without placeholders
  E722  bare except
  W605  invalid escape sequence in a regular string (DeprecationWarning)

Parity target: the reference CI lints with ruff
(/root/reference/Makefile:62-69). Exit code 1 on any finding.

Usage: python tools/lint.py [paths...]   (default: semcode_tpu tests bench.py
__graft_entry__.py tools)
"""

from __future__ import annotations

import ast
import builtins
import sys
import symtable
import warnings
from pathlib import Path

BUILTINS = set(dir(builtins)) | {"__file__", "__doc__", "__name__", "__package__", "WindowsError"}


def iter_py_files(paths):
    for p in paths:
        p = Path(p)
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
        elif p.suffix == ".py":
            yield p


class ImportCollector(ast.NodeVisitor):
    """Collect imported names and every identifier/attribute-root usage."""

    def __init__(self):
        self.imports = {}  # name -> (lineno, is_redefinition)
        self.used = set()
        self.exported = set()

    def visit_Import(self, node):
        for alias in node.names:
            name = (alias.asname or alias.name).split(".")[0]
            self._add_import(name, node.lineno)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            self._add_import(alias.asname or alias.name, node.lineno)

    def _add_import(self, name, lineno):
        self.imports[name] = lineno

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    def visit_Assign(self, node):
        # __all__ entries count as usage (re-export modules)
        for t in node.targets:
            if isinstance(t, ast.Name) and t.id == "__all__":
                for elt in getattr(node.value, "elts", []):
                    if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                        self.exported.add(elt.value)
        self.generic_visit(node)


def check_unused_imports(tree, path, findings, source):
    col = ImportCollector()
    col.visit(tree)
    # string annotations reference names too (from __future__ import annotations)
    ann_names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            for tok in node.value.replace("[", " ").replace("]", " ") \
                    .replace(",", " ").replace('"', " ").replace("'", " ") \
                    .replace("(", " ").replace(")", " ").split():
                ann_names.add(tok.split(".")[0])
    is_init = path.name == "__init__.py"
    for name, lineno in col.imports.items():
        if name.startswith("_"):
            continue
        if name in col.used or name in col.exported or name in ann_names:
            continue
        if is_init:  # re-export surface
            continue
        findings.append((path, lineno, "F401", f"unused import: {name}"))


def _scope_has(table, name):
    try:
        sym = table.lookup(name)
    except KeyError:
        return False
    return (
        sym.is_assigned()
        or sym.is_imported()
        or sym.is_parameter()
        or sym.is_namespace()
    )


def check_undefined_names(source, path, findings):
    try:
        top = symtable.symtable(source, str(path), "exec")
    except SyntaxError as exc:
        findings.append((path, exc.lineno or 0, "E999", f"syntax error: {exc.msg}"))
        return
    module_names = {s.get_name() for s in top.get_symbols()
                    if s.is_assigned() or s.is_imported() or s.is_namespace()}
    star_import = "*" in source and "import *" in source

    def walk(table, enclosing):
        local = {s.get_name() for s in table.get_symbols()
                 if s.is_assigned() or s.is_imported() or s.is_parameter()
                 or s.is_namespace()}
        if table.get_type() == "class":
            # class bodies do not contribute to nested function scopes
            child_enclosing = enclosing
        else:
            child_enclosing = enclosing | local
        for sym in table.get_symbols():
            name = sym.get_name()
            if not sym.is_referenced():
                continue
            if sym.is_assigned() or sym.is_imported() or sym.is_parameter():
                continue
            if sym.is_declared_global() or getattr(sym, "is_nonlocal", lambda: False)():
                continue
            if name in BUILTINS or name in module_names or name in enclosing:
                continue
            if sym.is_free():
                continue  # resolved in an enclosing function scope
            if star_import:
                continue
            findings.append(
                (path, table.get_lineno(), "F821",
                 f"undefined name: {name} (scope {table.get_name()})")
            )
        for child in table.get_children():
            walk(child, child_enclosing)

    for child in top.get_children():
        walk(child, module_names)


class MiscChecks(ast.NodeVisitor):
    def __init__(self, path, findings):
        self.path = path
        self.findings = findings

    def _check_defaults(self, node):
        for d in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.findings.append(
                    (self.path, node.lineno, "B006",
                     f"mutable default argument in {node.name}()")
                )

    def visit_FunctionDef(self, node):
        self._check_defaults(node)
        self.generic_visit(node)

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_JoinedStr(self, node):
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.findings.append(
                (self.path, node.lineno, "F541", "f-string without placeholders")
            )
        self.generic_visit(node)

    def visit_FormattedValue(self, node):
        # do NOT recurse into format_spec: a "{x:.1f}" spec is itself a
        # JoinedStr with no FormattedValue and would false-positive F541
        self.visit(node.value)

    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.findings.append(
                (self.path, node.lineno, "E722", "bare except")
            )
        self.generic_visit(node)


def lint_file(path, findings):
    source = path.read_text(encoding="utf-8")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        try:
            tree = ast.parse(source, filename=str(path))
        except SyntaxError as exc:
            findings.append((path, exc.lineno or 0, "E999", f"syntax error: {exc.msg}"))
            return
    for w in caught:
        if issubclass(w.category, (DeprecationWarning, SyntaxWarning)):
            findings.append((path, 0, "W605", str(w.message)))
    check_unused_imports(tree, path, findings, source)
    check_undefined_names(source, path, findings)
    MiscChecks(path, findings).visit(tree)


def main(argv):
    paths = argv[1:] or [
        "semcode_tpu", "tests", "bench.py", "__graft_entry__.py", "tools"
    ]
    findings = []
    n = 0
    for f in iter_py_files(paths):
        n += 1
        lint_file(f, findings)
    for path, lineno, code, msg in sorted(findings):
        print(f"{path}:{lineno}: {code} {msg}")
    print(f"lint: {n} files checked, {len(findings)} finding(s)", file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
