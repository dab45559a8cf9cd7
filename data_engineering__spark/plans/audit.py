"""Structural plan audits.

The scale contract this repo makes (ARCHITECTURE.md, VERDICT r6 task 2) is
that no query ever moves an unbounded fact stream through a
single-partition window: every unpartitioned ``Window`` /
``WindowGroupLimit`` / ``WindowInPandas`` must consume a *bounded-domain*
frame — the output of an aggregation (group cardinality, not row count),
a literal/local grid, or a limit — never a raw file scan. At sf0.001 a
global window over ``lineitem`` and one over a 24-row hour grid look
identical in wall time; at 100 TB the first is a single-executor OOM. This
module makes the distinction statically checkable so the plan test in
``tests/test_plans.py`` can assert it for the ENTIRE query registry, not a
hand-audited subset.

Works on ``queryExecution().sparkPlan()`` — the physical plan before
exchange insertion — where window operators still expose ``partitionSpec``
and the tree is free of Exchange/Sort noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Nodes that bound the cardinality of everything beneath them: an
# aggregation collapses rows to group-domain size, a limit to k.
_BOUNDING = (
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "GlobalLimit", "CollectLimit", "TakeOrderedAndProject",
)

# Leaves that ARE bounded: literal/local data (driver-built grids,
# createDataFrame fixtures, streaming memory-sink results). Range is
# handled separately — bounded only up to _RANGE_CAP elements, so a
# spark.range(10**12) grid cannot masquerade as a bounded domain.
_BOUNDED_LEAVES = (
    "LocalTableScan", "Scan OneRowRelation", "Scan ExistingRDD",
    "LocalRelation", "EmptyRelation",
)

_RANGE_CAP = 10_000_000


def _range_is_bounded(node) -> bool:
    try:
        return int(str(node.numElements())) <= _RANGE_CAP
    except Exception:  # pragma: no cover - accessor drift
        return False

_WINDOW_NODES = ("Window", "WindowInPandas", "WindowGroupLimit")


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.length()):
        yield from _walk(ch.apply(i))


def _is_bounded(node) -> bool:
    name = node.nodeName()
    if any(name.startswith(b) for b in _BOUNDING):
        return True
    ch = node.children()
    n = ch.length()
    if n == 0:
        if name.startswith("Range"):
            return _range_is_bounded(node)
        return any(name.startswith(l) for l in _BOUNDED_LEAVES)
    # Pass-through / combining nodes (Project, Filter, Generate, joins,
    # unions, other windows...): bounded iff every input is bounded. A
    # join or explode of bounded domains stays domain-bounded.
    return all(_is_bounded(ch.apply(i)) for i in range(n))


_QUADRATIC_JOINS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def cartesian_violations(df: DataFrame) -> list[str]:
    """Return one description per cartesian-product / nested-loop join in
    ``df``'s physical plan where BOTH inputs are unbounded fact frames.
    A nested-loop join with one bounded-domain side is a constant-factor
    map (grid probes, threshold sweeps, scalar cross joins); with two
    unbounded sides it is the |L|x|R| scale killer no cluster survives.
    Empty list == the plan keeps the contract."""
    plan = df._jdf.queryExecution().sparkPlan()
    out = []
    for node in _walk(plan):
        name = node.nodeName()
        if not any(name.startswith(j) for j in _QUADRATIC_JOINS):
            continue
        ch = node.children()
        sides = [_is_bounded(ch.apply(i)) for i in range(ch.length())]
        if not any(sides):
            leaves = [n.nodeName() for n in _walk(node)
                      if n.children().length() == 0]
            out.append(f"{name} with two unbounded inputs "
                       f"(leaves: {leaves})")
    return out


def global_window_violations(df: DataFrame) -> list[str]:
    """Return one description per unpartitioned window operator in ``df``'s
    physical plan whose input is NOT a bounded-domain frame. Empty list ==
    the plan keeps the no-global-window-over-facts contract."""
    plan = df._jdf.queryExecution().sparkPlan()
    out = []
    for node in _walk(plan):
        name = node.nodeName()
        if name not in _WINDOW_NODES:
            continue
        try:
            if not node.partitionSpec().isEmpty():
                continue
        except Exception:  # pragma: no cover - future node-API drift
            pass
        child = node.children().apply(0)
        if not _is_bounded(child):
            leaves = [n.nodeName() for n in _walk(child)
                      if n.children().length() == 0]
            out.append(f"{name} with empty partitionSpec over unbounded "
                       f"input (leaves: {leaves})")
    return out
