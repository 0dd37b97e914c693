"""Physical-plan linter: the repo's scale rules, executable.

Every design rule this engine enforces by convention (README "Design
rules", SCALE.md lessons, tests/test_plan_shapes.py) is a predicate on
the PHYSICAL plan — so expose them as one: ``lint(df)`` inspects the
executed/spark plan strings and returns findings for the anti-patterns
that turn a correct query into a 100-TB incident:

* ``cartesian-product``      — CartesianProduct / BroadcastNestedLoopJoin
  with no join condition: O(n·m) pair explosion.
* ``python-row-udf``         — BatchEvalPython (row-at-a-time Python) in
  the plan: 10–100× slower than Arrow paths; fine on a dimension,
  fatal on a fact table.
* ``no-pushed-filters``      — a parquet scan carrying data filters
  that did NOT reach ``PushedFilters`` (reads then discards).
* ``unbounded-window``       — a Window with no PARTITION BY: the whole
  input sorts into one task's window state.
* ``single-partition-sort``  — a Sort directly over an
  ``Exchange SinglePartition``: all rows funnel through one task. (A
  plain ``orderBy`` is fine — Spark range-partitions it; a bounded
  sort+limit plans as TakeOrderedAndProject, which never produces this
  Sort/Exchange pair in the first place.)

The linter is advisory (findings, not exceptions) and deliberately
string-based: plan nodes are stable, public ``explain`` vocabulary, so
the checks run against any DataFrame with no private APIs beyond
``queryExecution`` access. A finding is a (rule, detail) pair.
"""

from __future__ import annotations

import bisect
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    rule: str
    detail: str


def _plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint(df: DataFrame) -> list[Finding]:
    """Lint a DataFrame's physical plan; returns findings (empty =
    clean). Triggers AQE finalization only if the caller already ran
    the frame; otherwise lints the initial physical plan."""
    plan = _plan_str(df)
    out: list[Finding] = []

    if "CartesianProduct" in plan:
        out.append(Finding("cartesian-product", "CartesianProduct node present"))
    # BNLJ with a real condition is a bounded theta-join; the pattern
    # without one is a disguised cartesian
    if re.search(
        r"BroadcastNestedLoopJoin [^,\n]+,"
        r" (Inner|Cross|LeftOuter|RightOuter|FullOuter)\s*$",
        plan,
        re.M,
    ):
        out.append(
            Finding(
                "cartesian-product",
                "BroadcastNestedLoopJoin with no join condition",
            )
        )

    if "BatchEvalPython" in plan:
        out.append(
            Finding(
                "python-row-udf",
                "row-at-a-time Python UDF (BatchEvalPython) in the plan — "
                "prefer pandas UDF / mapInPandas (ArrowEvalPython)",
            )
        )

    # data filters present but nothing pushed to the parquet scan
    for scan in re.finditer(
        r"FileScan parquet [^\n]*DataFilters: \[([^\]]*)\][^\n]*"
        r"PushedFilters: \[([^\]]*)\]",
        plan,
    ):
        data_f, pushed = scan.group(1).strip(), scan.group(2).strip()
        if data_f and not pushed:
            out.append(
                Finding(
                    "no-pushed-filters",
                    f"scan filters [{data_f[:80]}] reached no PushedFilters",
                )
            )

    # Sort feeding off a single-partition exchange: every row through
    # one task. (A full orderBy is FINE — Spark range-partitions it;
    # Range-backed sorts are even eliminated. The single-task shape
    # appears exactly two ways: a Window with no PARTITION BY, or an
    # explicit repartition(1)/coalesce(1) under a sort.) Classification
    # is anchored to each matched Sort/Exchange SUBTREE — the Sort's
    # parent is the first line ABOVE it at a strictly shallower tree
    # depth (in a multi-child plan the immediately preceding line can
    # be the last leaf of a SIBLING subtree, so "one line up" would
    # misattribute), and a partitioned window's sort sits over
    # `Exchange hashpartitioning`, never SinglePartition, so
    # parent-is-Window here implies an empty partition spec. A node
    # name merely appearing ELSEWHERE in the plan neither suppresses
    # nor re-labels a finding.
    out.extend(_single_partition_findings(plan))

    return out


def _tree_depth(line: str) -> int:
    # Tree-string children carry a `+- `/`:- ` marker whose offset
    # is the nesting depth; the root line has none (depth -1).
    dm = re.match(r"^([\s:|]*)[+:]-", line)
    return len(dm.group(1)) if dm else -1


def _single_partition_findings(plan: str) -> list[Finding]:
    """Classify each Sort-over-Exchange-SinglePartition subtree by its
    TRUE parent: the first line above the Sort at a strictly shallower
    tree depth. (In a multi-child plan — Union, Join — the line
    immediately above a non-first child is the last leaf of a SIBLING
    subtree, so "one line up" would misattribute.) Module-level so the
    classifier is unit-testable on synthetic plan strings."""
    out: list[Finding] = []
    lines = plan.split("\n")
    line_starts: list[int] = []
    pos = 0
    for ln in lines:
        line_starts.append(pos)
        pos += len(ln) + 1

    def _parent_line(li: int) -> str:
        d = _tree_depth(lines[li])
        for j in range(li - 1, -1, -1):
            if _tree_depth(lines[j]) < d:
                return lines[j]
        return ""

    for m in re.finditer(
        r"Sort \[[^\n]*\n[\s:]*[+-]- Exchange SinglePartition", plan
    ):
        li = bisect.bisect_right(line_starts, m.start()) - 1
        parent = _parent_line(li) if li > 0 else ""
        if re.search(r"\bWindow \[", parent):
            out.append(
                Finding(
                    "unbounded-window",
                    "Window with no PARTITION BY — whole input sorted into "
                    "one task's window state",
                )
            )
        else:
            out.append(
                Finding(
                    "single-partition-sort",
                    "Sort over Exchange SinglePartition — all rows through one task",
                )
            )
    return out


def assert_clean(df: DataFrame, allow: set[str] = frozenset()) -> None:
    """Raise AssertionError listing findings not in ``allow`` — the CI
    form of :func:`lint`, used by tests to pin catalog queries clean."""
    findings = [f for f in lint(df) if f.rule not in allow]
    assert not findings, "; ".join(f"{f.rule}: {f.detail}" for f in findings)
