"""Static tripwire for the r13 quadratic-HOF finding: inside a
Catalyst higher-order-function lambda (the Python lambda passed to
F.transform/filter/zip_with/aggregate/exists/forall/reduce), indexing
an array that is NOT one of the enclosing HOF lambdas' parameters
makes Catalyst inline and re-evaluate the referenced expression PER
ELEMENT — O(n²) per row (measured: 55 s to build bigram pairs for ONE
20k-token doc; >240 s for one 20k-row bucket_agg group).

The audit walks every package source file's AST and flags
``F.get(X, …)`` / ``F.slice(X, …)`` / ``F.element_at(X, …)`` calls
inside HOF lambdas where X's base name is free — i.e. not a parameter
of any enclosing HOF lambda (or of a named function used AS a HOF
lambda, the let-binding shape: ``F.transform(F.array(toks),
_chunks_of)`` binds ``_chunks_of``'s parameter to a materialized
array variable).  Fixes use chained zip_with over shifted slices
built once per row, or that let binding (curation.chunk_documents is
the worked example).
"""

from __future__ import annotations

import ast
import glob
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "pipelinedb_spark")

HOFS = {"transform", "filter", "zip_with", "aggregate", "exists",
        "forall", "reduce"}
ACCESSORS = {"get", "slice", "element_at"}


def _f_call_name(node: ast.AST) -> str | None:
    """'xxx' for a call shaped F.xxx(...), else None."""
    if not isinstance(node, ast.Call):
        return None
    f = node.func
    if isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name) \
            and f.value.id == "F":
        return f.attr
    return None


def _base_name(node: ast.AST) -> str | None:
    """Leftmost data Name of an expression like ws / e.getField(...)
    / F.filter(acc, …) — F.xxx calls resolve through their first
    argument (the data operand), method calls through the receiver."""
    while True:
        if isinstance(node, ast.Name):
            return node.id
        if isinstance(node, ast.Attribute):
            node = node.value
        elif isinstance(node, ast.Call):
            if _f_call_name(node) is not None:
                if not node.args:
                    return None
                node = node.args[0]
            else:
                node = node.func
        elif isinstance(node, ast.Subscript):
            node = node.value
        else:
            return None


def audit_module(src: str, path: str = "<src>") -> list[str]:
    tree = ast.parse(src, filename=path)
    funcdefs: dict[str, ast.AST] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcdefs[node.name] = node

    # function names used AS a HOF's lambda argument: audited via the
    # binding path below, skipped by the plain scan (their params are
    # HOF lambda variables, not outer expressions)
    hof_fn_names: set[str] = set()
    for node in ast.walk(tree):
        if _f_call_name(node) in HOFS:
            for arg in node.args[1:]:
                if isinstance(arg, ast.Name) and arg.id in funcdefs:
                    hof_fn_names.add(arg.id)

    # one level of local derivation: name → base name of its assigned
    # value (``hit = F.filter(acc, …)`` derives from acc, so indexing
    # hit inside the fold rescans a BOUND value — O(accumulator), the
    # documented json-sum bound — not an outer re-evaluation)
    assign_base: dict[str, str | None] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Name):
            assign_base[node.targets[0].id] = _base_name(node.value)

    out: list[str] = []

    def visit(node: ast.AST, bound: set[str], in_hof: bool) -> None:
        """``bound`` = params of enclosing HOF lambdas (or of named
        functions bound as HOF lambdas); ``in_hof`` = inside one."""
        name = _f_call_name(node)
        if in_hof and name in ACCESSORS and node.args:
            base = _base_name(node.args[0])
            if base is not None and base != "F" \
                    and base not in bound \
                    and assign_base.get(base) not in bound:
                msg = (f"{path}:{node.lineno}: F.{name}({base}, …) "
                       f"inside a HOF lambda — {base} is not an "
                       f"enclosing HOF-lambda parameter, so "
                       f"Catalyst re-evaluates it per element")
                if msg not in out:
                    out.append(msg)
        if name in HOFS:
            for arg in node.args:
                if isinstance(arg, ast.Lambda):
                    params = {a.arg for a in arg.args.args}
                    visit(arg.body, bound | params, True)
                elif isinstance(arg, ast.Name) and arg.id in funcdefs:
                    fd = funcdefs[arg.id]
                    params = {a.arg for a in fd.args.args}
                    for stmt in fd.body:
                        visit(stmt, bound | params, True)
                else:
                    visit(arg, bound, in_hof)
            return
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) \
                and node.name in hof_fn_names:
            return            # audited via its HOF binding above
        for child in ast.iter_child_nodes(node):
            visit(child, bound, in_hof)

    visit(tree, set(), False)
    return out


def test_no_free_array_indexing_inside_hof_lambdas():
    findings: list[str] = []
    for path in sorted(glob.glob(os.path.join(PKG, "**", "*.py"),
                                 recursive=True)):
        findings += audit_module(open(path).read(), path)
    assert not findings, "\n".join(findings)


def test_audit_catches_the_original_bug_shape():
    """Self-check: the pre-r13 formulations must trip the audit."""
    out = audit_module(
        "def grams(ws, n):\n"
        "    idx = F.sequence(F.lit(0), F.size(ws) - n)\n"
        "    return F.transform(idx, lambda i: F.get(ws, i + 1))\n")
    assert len(out) == 1 and "F.get(ws" in out[0]
    out = audit_module(
        "def dedup(flat):\n"
        "    srt = F.array_sort(flat)\n"
        "    return F.filter(srt, lambda e, i:\n"
        "        e != F.get(srt, i - 1))\n")
    assert len(out) == 1 and "F.get(srt" in out[0]


def test_audit_accepts_let_binding_and_own_params():
    """The legal shapes: the lambda's own parameter, an enclosing HOF
    lambda's parameter, and a named function bound as the HOF lambda
    (its parameter IS the HOF variable)."""
    out = audit_module(
        "def pairs(a, b):\n"
        "    return F.zip_with(a, b, lambda x, y: F.get(x, 0))\n")
    assert out == [], out
    out = audit_module(
        "def chunks(toks):\n"
        "    return F.get(F.transform(F.array(toks), lambda t:\n"
        "        F.transform(F.sequence(F.lit(0), F.size(t)),\n"
        "                    lambda i: F.slice(t, i + 1, 4))), 0)\n")
    assert out == [], out
    out = audit_module(
        "def outer(toks):\n"
        "    def _of(t):\n"
        "        return F.transform(F.sequence(F.lit(0), F.size(t)),\n"
        "                           lambda i: F.slice(t, i + 1, 4))\n"
        "    return F.get(F.transform(F.array(toks), _of), 0)\n")
    assert out == [], out
