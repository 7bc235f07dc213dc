"""Shared AST mechanics for the static call-site audits.

Three audits pin call-site inventories over the package (driver
materialization, broadcast hints, cache lifecycles). They share the
walk-and-attribute machinery so a fix to the mechanics (e.g. how calls
are attributed to their enclosing function) lands once, not three
times; each audit supplies only its matcher.
"""

from __future__ import annotations

import ast
import os
from collections import Counter
from collections.abc import Callable, Iterator

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "xgboost_ray_spark",
)


def _modules() -> Iterator[tuple[str, ast.AST, dict[ast.AST, str]]]:
    """Yield (relative path, parsed tree, node -> enclosing-function map)
    for every package module."""
    for root, _, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            with open(path) as fh:
                tree = ast.parse(fh.read())
            func_of: dict[ast.AST, str] = {}

            def assign(node: ast.AST, fn: str) -> None:
                for child in ast.iter_child_nodes(node):
                    nfn = fn
                    if isinstance(
                        child, (ast.FunctionDef, ast.AsyncFunctionDef)
                    ):
                        nfn = child.name
                    func_of[child] = nfn
                    assign(child, nfn)

            assign(tree, "<module>")
            yield rel, tree, func_of


def call_sites(match: Callable[[ast.Call], str | None]) -> Counter:
    """(file, enclosing function, label) -> count for every Call node the
    matcher labels. The matcher returns a label string (what to count the
    site AS) or None to skip."""
    sites: Counter = Counter()
    for rel, tree, func_of in _modules():
        for node in ast.walk(tree):
            if isinstance(node, ast.Call):
                label = match(node)
                if label is not None:
                    sites[(rel, func_of.get(node, "?"), label)] += 1
    return sites


def call_name(node: ast.Call) -> str | None:
    """The called name: attribute name for x.f(...), bare name for f(...)."""
    f = node.func
    if isinstance(f, ast.Attribute):
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return None


def string_constants(substr_lower: str) -> list[tuple[str, str, str]]:
    """(file, enclosing function, constant) for every string constant in
    the package whose lowercase form contains ``substr_lower`` — the
    escape hatch SQL-text spellings (CACHE TABLE, /*+ BROADCAST */) use
    to dodge a call-site audit."""
    hits = []
    for rel, tree, func_of in _modules():
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Constant)
                and isinstance(node.value, str)
                and substr_lower in node.value.lower()
            ):
                hits.append((rel, func_of.get(node, "?"), node.value))
    return hits
