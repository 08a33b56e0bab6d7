"""Physical-plan quality audit — the test_plans.py gates as a
reusable engine API.

At 100 TB a plan regression (a lost pushdown, a join silently
degrading to nested-loop, an extra exchange) costs more than most
logic bugs, and it does not fail correctness tests. ``audit_plan``
extracts the scale-relevant facts from a DataFrame's executed plan;
``assert_scale_clean`` turns the red-flag subset into an exception
so pipelines can gate publishes on plan quality the way this repo's
test suite does.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: operators that are quadratic (or worse) in row count — never
#: acceptable in an unbounded-input plan
RED_FLAG_JOINS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def audit_plan(df: DataFrame) -> dict:
    """Scale-relevant facts from the executed (pre-AQE-final) plan.

    Keys: ``shuffle_exchanges`` (data-movement barriers, reuse
    excluded), ``broadcast_joins`` / ``sort_merge_joins`` /
    ``nested_loop_joins``, ``scans`` (one entry per FileScan with its
    pushed-filter and read-schema strings), ``codegen_spans``
    (whole-stage codegen regions — wider is better), and
    ``warnings`` (human-readable red flags).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = []
    for m in re.finditer(r"FileScan (\w+) [^\n]*", plan):
        line = m.group(0)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        schema = re.search(r"ReadSchema: ([^,\n]*)", line)
        scans.append(
            {
                "format": m.group(1),
                "pushed_filters": (pushed.group(1) if pushed else ""),
                "read_schema": (schema.group(1) if schema else ""),
            }
        )
    shuffles = len(
        re.findall(r"(?<!Reused)Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan)
    )
    nested = sum(plan.count(op) for op in RED_FLAG_JOINS)
    warnings = []
    for op in RED_FLAG_JOINS:
        if op in plan:
            warnings.append(f"{op} present — quadratic in input size")
    if re.search(r"Exchange SinglePartition", plan):
        warnings.append(
            "SinglePartition exchange — a global sort/window funnels "
            "all data through one task"
        )
    return {
        "shuffle_exchanges": shuffles,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": nested,
        "scans": scans,
        # executedPlan toString marks codegen regions as "*(N)" node
        # prefixes (the WholeStageCodegen (N) spelling appears only in
        # formatted explain output)
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "warnings": warnings,
        "plan": plan,
    }


def assert_scale_clean(
    df: DataFrame,
    max_shuffles: int | None = None,
    allow_nested_loop: bool = False,
    allow_single_partition: bool = False,
) -> dict:
    """Raise AssertionError (with the offending plan attached) when
    the plan carries a scale red flag; returns the audit otherwise.
    ``allow_nested_loop`` is for plans where one side is bounded BY
    CONSTRUCTION (a broadcast query batch, a k-row codebook)."""
    audit = audit_plan(df)
    problems = []
    if not allow_nested_loop and audit["nested_loop_joins"]:
        problems.append(f"{audit['nested_loop_joins']} nested-loop/cartesian join(s)")
    if not allow_single_partition and any(
        "SinglePartition" in w for w in audit["warnings"]
    ):
        problems.append("single-partition exchange")
    if max_shuffles is not None and audit["shuffle_exchanges"] > max_shuffles:
        problems.append(
            f"{audit['shuffle_exchanges']} shuffles > allowed {max_shuffles}"
        )
    if problems:
        raise AssertionError(
            "plan fails scale audit: " + "; ".join(problems) + "\n" + audit["plan"]
        )
    return audit
