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

_TREE_ART = re.compile(r"^([ :+|-]*)(.*)$")
_GLOBAL_AGG = re.compile(r"(Hash|Sort|ObjectHash)Aggregate(?:\w*)?\(keys=\[\]")
#: operators that cannot increase their child's row count — safe to
#: look through when proving a broadcast build side is <= 1 row
_ROW_PRESERVING = re.compile(
    r"\*?\(?\d*\)?\s*(Filter|Project|Sort|Exchange|ReusedExchange|"
    r"AQEShuffleRead|ColumnarToRow|InputAdapter|Coalesce)\b"
)


def _node(line: str) -> tuple[int, str]:
    """(tree depth in characters, node text) for one plan line."""
    m = _TREE_ART.match(line)
    return len(m.group(1)), m.group(2)


def classify_single_partitions(plan: str) -> list[dict]:
    """Classify every ``Exchange SinglePartition`` in a plan string.

    A single-partition exchange is BENIGN when it implements the
    final step of a GLOBAL aggregate: the parent node is an
    Aggregate with ``keys=[]`` and the exchange's input is the
    matching partial Aggregate — then the exchanged data is one
    partial-state row PER UPSTREAM PARTITION (a few KB at any data
    size), not the relation. Anything else — a global Sort, an
    unpartitioned Window, a GlobalLimit over raw rows — funnels the
    actual data through one task and is a REAL red flag at 100 TB.
    Requiring BOTH sides prevents a real funnel from hiding behind a
    waived warning: a global sort/window parent fails the parent
    check, and a global agg fed by raw (non-partial) rows fails the
    child check.
    """
    lines = plan.splitlines()
    found: list[dict] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        depth, _ = _node(ln)
        parent = next(
            (
                text
                for d, text in (
                    _node(lines[j]) for j in range(i - 1, -1, -1)
                )
                if d < depth and text
            ),
            "",
        )
        child = _node(lines[i + 1])[1] if i + 1 < len(lines) else ""
        benign = bool(_GLOBAL_AGG.search(parent)) and bool(
            _GLOBAL_AGG.search(child)
        )
        found.append({"benign": benign, "parent": parent, "child": child})
    return found


def classify_nested_loops(plan: str) -> list[dict]:
    """Classify every nested-loop/cartesian join in a plan string.

    A ``BroadcastNestedLoopJoin`` is BENIGN when its broadcast build
    side is a GLOBAL aggregate (``keys=[]``) — one row by
    construction, so the "nested loop" is a constant-append of
    scalars to every row (the decorrelated-scalar-subquery shape:
    TPC-H Q22's avg-balance, the KL/bigram normalizer joins), never
    quadratic. Detection requires the provable case: the first
    non-exchange node under the join's ``BroadcastExchange`` must be
    the global Aggregate. Joins whose bounded side is only bounded by
    CONSTRUCTION (a k-row codebook literal, a broadcast query batch)
    do NOT classify benign here — callers waive those explicitly via
    ``assert_scale_clean(allow_nested_loop=True)``, keeping the
    auto-waiver narrow enough that a real quadratic join can't hide
    behind it. ``CartesianProduct`` never classifies benign.
    """
    lines = plan.splitlines()
    found: list[dict] = []
    for i, ln in enumerate(lines):
        depth, text = _node(ln)
        if not any(op in text for op in RED_FLAG_JOINS):
            continue
        benign = False
        if "BroadcastNestedLoopJoin" in text:
            # find the join's DIRECT build-side child (the
            # BroadcastExchange at direct-child depth — a nested
            # exchange inside the probe branch must not match), then
            # descend past cardinality-non-increasing nodes (Filter /
            # Project / Sort / exchanges / codegen adapters) to the
            # first operator that determines the build side's row count
            j = i + 1
            child_depth: int | None = None
            in_bcast_depth: int | None = None
            while j < len(lines):
                d, t = _node(lines[j])
                if t and d <= depth:
                    break
                if t and child_depth is None:
                    child_depth = d
                if in_bcast_depth is not None and t and d > in_bcast_depth:
                    if _GLOBAL_AGG.search(t):
                        benign = True
                        break
                    if not _ROW_PRESERVING.match(t):
                        break
                elif t and d == child_depth and "BroadcastExchange" in t:
                    in_bcast_depth = d
                j += 1
        found.append({"benign": benign, "node": text})
    return found


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
    nested_loops = classify_nested_loops(plan)
    nested = len(nested_loops)
    warnings = []
    for nl in nested_loops:
        if not nl["benign"]:
            warnings.append(
                f"{nl['node'].split(' ')[0]} present — quadratic in input "
                "size (build side is not a 1-row global aggregate)"
            )
    single_partitions = classify_single_partitions(plan)
    for sp in single_partitions:
        if not sp["benign"]:
            warnings.append(
                "SinglePartition exchange feeding "
                f"{sp['parent'].split('(')[0] or '<root>'} — funnels the "
                "relation through one task (not a 1-row global-aggregate "
                "hand-off)"
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
        "single_partition_exchanges": single_partitions,
        "nested_loop_classification": nested_loops,
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
    Nested-loop joins whose broadcast side is a provable 1-row global
    aggregate (see :func:`classify_nested_loops`) never trip the
    gate; ``allow_nested_loop`` waives the rest — for plans where one
    side is bounded BY CONSTRUCTION (a broadcast query batch, a k-row
    codebook) in a way the plan text can't prove.

    Benign single-partition exchanges (1-row global-aggregate
    hand-offs, see :func:`classify_single_partitions`) never trip the
    gate; ``allow_single_partition`` waives only the REAL funnels —
    for plans whose input is bounded by construction."""
    audit = audit_plan(df)
    problems = []
    real_nested = sum(
        1 for nl in audit["nested_loop_classification"] if not nl["benign"]
    )
    if not allow_nested_loop and real_nested:
        problems.append(f"{real_nested} nested-loop/cartesian join(s)")
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
