"""Physical-plan linting: the 100 TB red-flag checklist as a reusable
audit instead of ad-hoc string asserts scattered through tests.

``audit_plan(df)`` inspects the executed plan for the failure modes
that are invisible at test scale but fatal at warehouse scale:

- a cartesian product or non-broadcast nested-loop join (per-key O(n·m));
- row-at-a-time Python in the plan (``BatchEvalPython`` — the 10-100×
  slow path; Arrow kernels ``ArrowEvalPython``/``FlatMapGroupsInPandas``
  are allowed only when declared);
- a parquet scan with no column pruning (reading every column to
  project a few);
- a sort-merge join where a declared-small side should broadcast.

Each finding is a human-readable string; an empty list is a clean
plan. Tests call ``assert not audit_plan(df, ...)`` so failures print
the exact red flags; pipeline authors can call it interactively the
same way. This is advisory lint on plan STRUCTURE — it cannot see
cardinalities, so size-dependent judgments (skew, spill) stay with
AQE and the bench.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: Python-execution operators that are legitimate when declared.
_ARROW_OPS = (
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "FlatMapGroupsInPandasWithState",
)


def plan_string(df: DataFrame) -> str:
    """The final (post-AQE if already executed) physical plan text."""
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(
    df: DataFrame,
    allow_python_kernels: bool = False,
    allow_broadcast_nlj: bool | int = False,
    allow_cartesian: bool = False,
    expect_broadcast_only: bool = False,
    max_scan_columns: int | None = None,
) -> list[str]:
    """Return scale red-flags found in ``df``'s physical plan (empty =
    clean). ``allow_python_kernels`` permits the declared Arrow ops
    (never row-at-a-time ``BatchEvalPython``). ``allow_broadcast_nlj``
    takes True (every BNLJ declared tiny) or an int CAP on the number
    of BNLJ nodes — for multi-leg suites where only specific legs
    (e.g. 1-row scalar-subquery broadcasts) justify the exemption, so
    a new data-sized BNLJ in any other leg still fails the audit.
    ``expect_broadcast_only``
    additionally flags any shuffle-side join — for plans whose joins
    should all be dimension broadcasts. ``max_scan_columns`` flags any
    parquet scan reading more than that many columns — a proxy for
    "projection never reached the scan"."""
    plan = plan_string(df)
    findings: list[str] = []

    if "CartesianProduct" in plan and not allow_cartesian:
        findings.append(
            "CartesianProduct: unconditioned cross join materializes |L|x|R| "
            "rows — add a join key or broadcast a bounded side (or declare a "
            "literal 1-row side with allow_cartesian=True)"
        )
    bnlj = re.findall(r"BroadcastNestedLoopJoin (\w+)", plan)
    if allow_broadcast_nlj is True:
        pass  # blanket declaration: every BNLJ side is provably tiny
    elif allow_broadcast_nlj:  # an int CAP: at most N declared BNLJs
        if len(bnlj) > int(allow_broadcast_nlj):
            findings.append(
                f"{len(bnlj)} BroadcastNestedLoopJoin nodes exceed the "
                f"declared cap of {int(allow_broadcast_nlj)} — a new "
                "non-equi join crept in beyond the audited tiny-side "
                "set; bin/bucket it into an equi-join or (only if its "
                "broadcast side is provably tiny) raise the cap"
            )
    else:
        for side in bnlj:
            findings.append(
                f"BroadcastNestedLoopJoin ({side}): non-equi join "
                "condition — fine only if the broadcast side is provably "
                "tiny and declared (allow_broadcast_nlj=True, e.g. a "
                "centroid/query-vector set); at scale prefer binning/"
                "bucketing the condition into an equi-join"
            )

    if "BatchEvalPython" in plan:
        findings.append(
            "BatchEvalPython: row-at-a-time Python UDF in the plan — use "
            "built-in expressions or an Arrow kernel (pandas_udf/mapInPandas)"
        )
    if not allow_python_kernels:
        # longest names first, consuming matches — otherwise
        # FlatMapGroupsInPandasWithState would ALSO fire the plain
        # FlatMapGroupsInPandas finding for the same operator
        remaining = plan
        for op in sorted(_ARROW_OPS, key=len, reverse=True):
            if op in remaining:
                remaining = remaining.replace(op, "")
                findings.append(
                    f"{op}: Python kernel in a plan declared JVM-only — "
                    "either expected (pass allow_python_kernels=True) or a "
                    "regression out of whole-stage codegen"
                )

    if expect_broadcast_only:
        for op in ("SortMergeJoin", "ShuffledHashJoin"):
            if op in plan:
                findings.append(
                    f"{op}: shuffle-side join in a plan expected to broadcast "
                    "all dimensions — check autoBroadcastJoinThreshold or an "
                    "unexpected fact-fact join"
                )

    if max_scan_columns is not None:
        # the plan text truncates long schemas ("struct<a:bigint,...")
        # with no closing bracket — capture to end of line and count
        # TOP-LEVEL fields only (depth-0 commas; a nested
        # struct<x:int,y:int> is one column, not two). A truncated
        # schema already shows more than any sane max_scan_columns.
        for m in re.finditer(r"ReadSchema: struct<([^\n]*)", plan):
            body, depth, n_cols = m.group(1), 0, 0
            for i, ch in enumerate(body):
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                elif ch == ":" and depth == 0 and n_cols == 0:
                    n_cols = 1
                elif ch == "," and depth == 0:
                    n_cols += 1
            if n_cols > max_scan_columns:
                findings.append(
                    f"scan reads {n_cols} columns (> {max_scan_columns}): "
                    "projection did not prune the scan — check for a "
                    "select(*) or a UDF blocking column pruning"
                )

    return findings
