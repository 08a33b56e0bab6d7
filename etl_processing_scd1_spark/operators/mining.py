"""Data-mining operators (skyline; companions to the registry's
miningq tier). Kept as reusable DataFrame->DataFrame functions so
property tests can drive them on arbitrary frames, not just the
testdata tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cooccurrence_pairs(
    baskets: DataFrame,
    basket_col: str = "o",
    item_col: str = "br",
) -> DataFrame:
    """Per-basket unordered item pairs with support counts:
    (item_a < item_b, support). ``baskets`` must hold each
    (basket, item) membership ONCE (pre-deduped).

    Plan: the self-join co-partitions on the basket key; fan-out per
    basket is bounded by C(|items-in-basket|, 2); the pair count
    partial-aggregates map-side into at most |items|^2 groups."""
    a, b2 = baskets.alias("a"), baskets.alias("b2")
    return (
        a.join(
            b2,
            (F.col(f"a.{basket_col}") == F.col(f"b2.{basket_col}"))
            & (F.col(f"a.{item_col}") < F.col(f"b2.{item_col}")),
        )
        .groupBy(
            F.col(f"a.{item_col}").alias("item_a"),
            F.col(f"b2.{item_col}").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )


def incremental_cooccurrence_counts(
    new: DataFrame,
    seen: DataFrame,
    basket_col: str = "o",
    item_col: str = "br",
) -> DataFrame:
    """Pair-count DELTA contributed by the NEW basket rows: pairs
    within ``new`` plus pairs between ``new`` and the already-``seen``
    rows of the same basket. Caller contract: both inputs are deduped
    (basket, item) memberships and ``new`` ∩ ``seen`` = ∅.

    Exactness: each unordered pair of distinct memberships is counted
    exactly once — in the increment where the LATER of its two rows
    arrives (within-new if both arrive together, cross otherwise) —
    so summing deltas over any batch split equals
    :func:`cooccurrence_pairs` over the union. Sufficient statistics
    are sums; incremental and batch counting are exactly equal, the
    same associativity argument as the Naive Bayes sink.

    Per-increment cost: O(new²-within-basket) + O(new × seen rows of
    the touched baskets) — the join keys on the basket id, so only
    baskets present in the increment are rescanned, never the whole
    history."""
    within = cooccurrence_pairs(new, basket_col, item_col)
    n, s = new.alias("n"), seen.alias("s")
    cross = (
        n.join(
            s,
            (F.col(f"n.{basket_col}") == F.col(f"s.{basket_col}"))
            & (F.col(f"n.{item_col}") != F.col(f"s.{item_col}")),
        )
        .groupBy(
            F.least(F.col(f"n.{item_col}"), F.col(f"s.{item_col}")).alias("item_a"),
            F.greatest(F.col(f"n.{item_col}"), F.col(f"s.{item_col}")).alias("item_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    return (
        within.unionByName(cross)
        .groupBy("item_a", "item_b")
        .agg(F.sum("support").cast("long").alias("support"))
    )


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
