"""Driver-side action discipline: every `.collect()` / `.toPandas()` /
`.first()` / `.take()` call site in the package must carry an in-code
boundedness claim.

The repo's standing rule (VERDICT r11 #4 audited it BY HAND: "the 10
driver-side collect sites are all bounded and documented") is that
driver-side materialization is only legal on metadata-sized inputs —
a per-partition count vector, a ≤top_n profile, a min/max row, a
guarded query matrix. This test turns that audit into code, the same
move `bounded_global_order(bound=...)` made for global windows: an AST
walk finds every driver-action call site, and each must have a comment
containing the token ``bounded`` within the six lines up to and
including the call (or a trailing comment on the line after — the
closing-paren comment style). A new unannotated collect fails CI with
the file:line, forcing the author to either state the bound or
restructure the operator to stay distributed.
"""

from __future__ import annotations

import ast
import os

import pytest

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "oracle_vector_search_spark",
)

DRIVER_ACTIONS = {"collect", "toPandas", "first", "take"}

# Comment window: lines [call_line - 5, call_line + 1], 1-indexed.
LOOKBACK = 5
LOOKAHEAD = 1


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if f.endswith(".py"):
                yield os.path.join(root, f)


def _call_sites(path: str):
    """(line, action) for every DRIVER_ACTIONS method call — real Call
    nodes only, so docstrings/comments/strings never count."""
    with open(path) as fh:
        src = fh.read()
    tree = ast.parse(src, filename=path)
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in DRIVER_ACTIONS
            # F.first()/F.take() are Catalyst AGGREGATE expressions,
            # not driver actions — the functions-module alias is the
            # one receiver that can never be a DataFrame
            and not (
                isinstance(node.func.value, ast.Name)
                and node.func.value.id in ("F", "np", "pd", "T")
            )
        ):
            # the ACTION line is where the attribute is accessed (a
            # multi-line fluent chain ends with `.collect()` on its
            # own line — annotate THERE, not at the chain's head)
            yield node.func.end_lineno or node.func.lineno, node.func.attr


def _has_bound_claim(lines: list[str], call_line: int) -> bool:
    lo = max(0, call_line - 1 - LOOKBACK)
    hi = min(len(lines), call_line + LOOKAHEAD)
    for ln in lines[lo:hi]:
        if "#" in ln and "bounded" in ln.split("#", 1)[1].lower():
            return True
    return False


def test_every_driver_action_states_its_bound():
    offenders = []
    n_sites = 0
    for path in _py_files():
        with open(path) as fh:
            lines = fh.read().splitlines()
        for line, action in _call_sites(path):
            n_sites += 1
            if not _has_bound_claim(lines, line):
                rel = os.path.relpath(path, os.path.dirname(PKG))
                offenders.append(f"{rel}:{line} .{action}()")
    assert not offenders, (
        "driver-side actions without a '# bounded:' claim (state why "
        "the input is metadata-sized, or keep the operator "
        "distributed):\n  " + "\n  ".join(offenders)
    )
    # the audit is only meaningful if it actually sees the known sites;
    # a refactor that breaks the AST walk must fail loudly, not pass
    # vacuously
    assert n_sites >= 10, f"AST walk found only {n_sites} sites"


def test_marker_window_is_what_the_docstring_says():
    """Self-check on synthetic sources: trailing, preceding-comment and
    out-of-window cases."""
    lines_ok_trailing = [
        "x = (",
        "    df.groupBy('p').count()",
        "    .collect()",
        ")  # bounded: one row per partition",
    ]
    assert _has_bound_claim(lines_ok_trailing, 3)

    lines_ok_preceding = [
        "# bounded: <= top_n profile rows",
        "a = 1",
        "b = 2",
        "c = 3",
        "d = 4",
        "rows = profile.collect()",
    ]
    assert _has_bound_claim(lines_ok_preceding, 6)

    lines_too_far = [
        "# bounded: too far away",
        "a = 1",
        "b = 2",
        "c = 3",
        "d = 4",
        "e = 5",
        "rows = profile.collect()",
    ]
    assert not _has_bound_claim(lines_too_far, 7)
