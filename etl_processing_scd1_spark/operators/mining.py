"""Data-mining operators (skyline; companions to the registry's
miningq tier). Kept as reusable DataFrame->DataFrame functions so
property tests can drive them on arbitrary frames, not just the
testdata tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_skyline_2d(
    df: DataFrame,
    group_col: str,
    min_col: str,
    max_col: str,
) -> DataFrame:
    """Per-group 2-D Pareto skyline: rows not strictly dominated
    within their group, where row b dominates row a iff
    ``b.min_col <= a.min_col AND b.max_col >= a.max_col`` with at
    least one strict. Ties on both dimensions survive together (no
    strict edge), matching the NOT-EXISTS spec.

    O(n log n) instead of the quadratic dominance join: group rows
    into (group, min_col) LEVELS with each level's max of
    ``max_col``; a row is dominated iff a strictly smaller level
    reaches its value (prefix running max over the ordered levels)
    or its own level holds a strictly larger value.

    Plan: one fine-grained groupBy on (group, min_col); the prefix
    window then runs over the LEVELS relation — orders of magnitude
    smaller than the input — and broadcasts back. At extreme level
    cardinality the broadcast degrades to a shuffle join on
    (group, min_col) and the window to a two-phase distributed
    prefix max (sorted_neighborhood_pairs' pattern); semantics are
    unchanged. Returns the input columns unchanged, filtered.
    """
    levels = df.groupBy(group_col, min_col).agg(
        F.max(max_col).alias("__lvl_max__")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(min_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    levels = levels.withColumn("__cheaper_max__", F.max("__lvl_max__").over(w))
    out = df.join(F.broadcast(levels), [group_col, min_col])
    dominated = (
        F.col("__cheaper_max__").isNotNull()
        & (F.col("__cheaper_max__") >= F.col(max_col))
    ) | (F.col("__lvl_max__") > F.col(max_col))
    return out.filter(~dominated).drop("__lvl_max__", "__cheaper_max__")
