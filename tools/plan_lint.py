#!/usr/bin/env python
"""Registry-wide scale-killer plan lint (VERDICT r8 #4).

The plan-fingerprint tests pin the 55 bench queries exactly; this tool
walks ALL registered queries (338+) and flags the plan shapes that
kill a 100 TB run, making the previously hand-adjudicated VERIFY.log
window warnings executable:

* ``global_window_over_unaggregated`` — a Window with an empty
  partitionSpec whose input subtree contains no GlobalLimit / local
  relation / small Range / grouping-free Aggregate: the whole input
  moves to ONE task.  Since r10 (VERDICT r9 #1) a KEYED Aggregate no
  longer bounds — a groupBy(token) histogram is 10^8+ rows at
  100 TB.  Head slices belong in ``global_topn_ranked``
  (TakeOrderedAndProject); windows over inputs bounded for a
  non-limit reason (distinct integer scores, per-source rows)
  declare it via ``operators.topk.bounded_global_order``'s anchored
  partitionSpec, which this rule reads as the in-code adjudication.
* ``cartesian_product`` — a physical CartesianProduct, or a logical
  cross/condition-free join where NEITHER side is aggregate/limit/
  local/small-range bounded AND no side carries an explicit broadcast
  hint (the kNN expression tier's declared small-side contract):
  O(N·M) at scale.
* ``row_at_a_time_python`` — any BatchEvalPython stage: a non-Arrow
  Python UDF/UDTF in the plan is a 10-100× hot-path regression (the
  engine's rule: Arrow-batched mapInPandas / pandas_udf / Arrow UDTF
  only).
* ``unhinted_tiny_join`` — an equi-join where one side is PROVABLY
  tiny (grouping-free aggregate, LIMIT, literal relation, small
  Range) in a broadcast-legal position but carries no broadcast hint:
  it auto-broadcasts at fixture size via stats, but at 100 TB a
  missing/stale estimate silently degrades it to a corpus shuffle —
  the repo's discipline is an explicit ``F.broadcast`` on every such
  side.

A note on what is deliberately NOT linted: a blanket
"SortMergeJoin at fixture size" rule was tried and produced only
noise — every hit was either a deliberate corpus×corpus join (WCC
rounds, recall audits joining two derived result tables) or a
stats-absent initial plan that AQE converts to broadcast at runtime.
Distinguishing a metadata-sized aggregate from a corpus-sized one
(groupBy nation vs groupBy doc_id) is not statically decidable, so
dim-join coverage beyond the provably-tiny rule lives in the exact
per-query fingerprint snapshots (tests/test_plan_fingerprints.py).

Allowlisted exceptions are per-(query, rule) with a one-line reason —
the adjudication is code, not VERIFY.log prose.  Exit 0 = clean.

Usage:
    python tools/plan_lint.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---- rule ids
GLOBAL_WINDOW = "global_window_over_unaggregated"
CARTESIAN = "cartesian_product"
ROW_PYTHON = "row_at_a_time_python"
UNHINTED_TINY = "unhinted_tiny_join"

#: logical nodes that bound a subtree to aggregate/metadata size —
#: a global window or cross join over one of these is the documented
#: benign pattern (vocab ranks, leaf histograms, scalar broadcasts)
_BOUNDED = {
    "Aggregate",
    "GlobalLimit",
    "LocalRelation",
    "OneRowRelation",
    "LocalLimit",
    "Deduplicate",
}
_SMALL_RANGE_MAX = 100_000

#: leaf/root classes that make a subtree PROVABLY tiny (≤ a few rows /
#: a bounded constant) regardless of input scale — the must-broadcast
#: set for the unhinted_tiny_join rule.  A keyed Aggregate is NOT here
#: (groupBy doc_id is corpus-sized); only grouping-free aggregates
#: qualify, checked separately.
_TINY_ROOTS = {"LocalRelation", "OneRowRelation", "GlobalLimit"}

# ---- allowlist: (query, rule) -> reason.  Every entry is a plan the
# repo has explicitly argued is the one you'd want at 100 TB.
ALLOW: dict[tuple[str, str], str] = {
    ("ntile_distribution", GLOBAL_WINDOW):
        "documented ORACLE TIER; ntile_distribution_scaled is the "
        "two-phase 100 TB twin (relational2_queries.py docstring)",
    ("sprt_ab_sequential_test", GLOBAL_WINDOW):
        "SPRT's ordered LLR walk is inherently sequential; docstring "
        "names the per-shard / streaming-fold 100 TB forms",
    ("hybrid_rrf_retrieval_top10", GLOBAL_WINDOW):
        "leg rankings run over the doc_id<200 candidate slice "
        "(filter-bounded by construction, never corpus-sized)",
}


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _range_small(node) -> bool:
    ne = node.numElements()  # py4j: BigInt object or plain int
    ne = ne if isinstance(ne, int) else int(ne.longValue())
    return ne <= _SMALL_RANGE_MAX


def _subtree_bounded(node, keyed_agg_bounds: bool = True) -> bool:
    """True if every leaf under ``node`` sits below an aggregate/limit
    or is itself a local/small relation — i.e. the subtree is not
    corpus-sized by construction (it MAY still be vocabulary-sized).

    With ``keyed_agg_bounds=False`` (the r10-tightened GLOBAL_WINDOW
    rule, VERDICT r9 #1), a KEYED Aggregate no longer bounds: a
    groupBy(token) histogram is 10^8+ rows at 100 TB, so a global
    window over it is a finding. Grouping-free aggregates (one row)
    still bound. Deliberately-bounded windows declare themselves via
    ``operators.topk.bounded_global_order``'s non-empty anchor spec
    instead of an allowlist entry."""
    for n in _walk(node):
        c = _cls(n)
        if c == "Aggregate" and not keyed_agg_bounds:
            if n.groupingExpressions().isEmpty():
                return True
            continue  # keyed aggregate: may be vocabulary-sized
        if c in _BOUNDED:
            return True
        if c == "Range" and _range_small(n):
            return True
    # no bounding node anywhere: bounded only if there are no file
    # relations at all (pure local plans)
    return not any(
        _cls(n) in ("LogicalRelation", "LogicalRDD",
                    "DataSourceV2Relation",
                    "DataSourceV2ScanRelation", "HiveTableRelation")
        for n in _walk(node)
    )


def _provably_tiny(node) -> bool:
    """True if the subtree's row count is bounded by a CONSTANT
    (limit k, literal rows, grouping-free aggregate, small range) —
    the sides the engine's discipline says must broadcast EXPLICITLY."""
    c = _cls(node)
    if c in _TINY_ROOTS:
        return True
    if c == "Range":
        return _range_small(node)
    if c == "Aggregate" and node.groupingExpressions().isEmpty():
        return True  # global aggregate: exactly one row
    if c == "Generate":
        return False  # explode can fan a tiny input out arbitrarily
    n = node.children().size()
    if n == 0:
        return False  # file relation or other unbounded leaf
    return all(
        _provably_tiny(node.children().apply(i)) for i in range(n)
    )


def _broadcast_legal(join_type: str) -> tuple[bool, bool]:
    """(left_side_may_broadcast, right_side_may_broadcast) — the outer
    (row-preserving) side of an outer join cannot be broadcast."""
    jt = join_type.lower()
    if "full" in jt:
        return (False, False)
    if "right" in jt:
        return (True, False)
    if "left" in jt or "semi" in jt or "anti" in jt:
        return (False, True)
    return (True, True)  # inner / cross


def lint_df(df, name: str = "<df>") -> list[tuple[str, str, str]]:
    """Return [(query, rule, detail)] findings for one DataFrame."""
    findings: list[tuple[str, str, str]] = []
    qe = df._jdf.queryExecution()
    lp = qe.optimizedPlan()

    for node in _walk(lp):
        c = _cls(node)
        if c == "Window" and node.partitionSpec().isEmpty():
            child = node.children().apply(0)
            if not _subtree_bounded(child, keyed_agg_bounds=False):
                findings.append((
                    name, GLOBAL_WINDOW,
                    "Window with empty partitionSpec over an "
                    "unaggregated relation subtree",
                ))
        elif c == "Join":
            jt = node.joinType().toString()
            no_cond = not node.condition().isDefined()
            hinted = "broadcast" in node.hint().toString().lower()
            left, right = (node.children().apply(0),
                           node.children().apply(1))
            if ("cross" in jt.lower() or no_cond) \
                    and "semi" not in jt.lower() \
                    and "anti" not in jt.lower() \
                    and "existence" not in jt.lower():
                if not (hinted or _subtree_bounded(left)
                        or _subtree_bounded(right)):
                    findings.append((
                        name, CARTESIAN,
                        f"{jt} join with neither side bounded "
                        "nor broadcast-hinted",
                    ))
            elif not no_cond and not hinted:
                l_ok, r_ok = _broadcast_legal(jt)
                l_tiny, r_tiny = _provably_tiny(left), _provably_tiny(right)
                if (l_tiny and l_ok and not r_tiny) or (
                        r_tiny and r_ok and not l_tiny):
                    findings.append((
                        name, UNHINTED_TINY,
                        f"{jt} join: provably-tiny side not "
                        "explicitly broadcast (auto-broadcast is "
                        "stats-dependent at scale)",
                    ))

    plan = qe.executedPlan().toString()
    if "BatchEvalPython" in plan:
        findings.append((
            name, ROW_PYTHON,
            "BatchEvalPython stage (row-at-a-time Python UDF/UDTF)",
        ))
    if "CartesianProduct" in plan:
        findings.append((name, CARTESIAN, "physical CartesianProduct"))

    # de-dup repeated findings per rule, drop allowlisted
    out, seen = [], set()
    for q, rule, detail in findings:
        if (q, rule) in ALLOW or (q, rule) in seen:
            continue
        seen.add((q, rule))
        out.append((q, rule, detail))
    return out


def lint_registry(
    spark, sf_dir: str, only: list[str] | None = None
) -> tuple[dict[str, list[tuple[str, str, str]]], dict[str, str]]:
    """Lint every registered query; returns (findings, errors)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = only or sorted(qs)
    all_findings: dict[str, list] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            f = lint_df(df, name)
            if f:
                all_findings[name] = f
        except Exception as e:  # plan build failed — report, keep going
            errors[name] = f"{type(e).__name__}: {e}"
    return all_findings, errors


def main() -> int:
    from oracle_vector_search_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = args[1:] or None
    spark = get_spark()
    findings, errors = lint_registry(spark, sf_dir, only)
    for name in sorted(findings):
        for _, rule, detail in findings[name]:
            print(f"FLAG {name}: {rule} — {detail}")
    for name in sorted(errors):
        print(f"ERR  {name}: {errors[name]}")
    n = sum(len(v) for v in findings.values())
    print(f"\n{n} findings, {len(errors)} errors "
          f"over {'subset' if only else 'full registry'}")
    return 1 if (findings or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
