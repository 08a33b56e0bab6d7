"""Reusable sketch state builders (the DataFrame twins of the
oracle-checked sketch queries in ``registry/advancedq``).

The register relation (bucket, M) is the SKETCH STATE: tiny (m rows),
mergeable (per-bucket max), storable as an ordinary warehouse table —
which is what makes it maintainable incrementally from batches or
micro-batches without rescanning history (`hll_merge_proof` checks
the merge identity cell-by-cell against a DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HLL_RHO_EXPR = (
    "least(4 * length(regexp_extract(substr(h, 3, 16), '^0*', 0))"
    " + CASE WHEN substr(h, 3 + length(regexp_extract(substr(h, 3, 16), '^0*', 0)), 1) = '1' THEN 3"
    "        WHEN substr(h, 3 + length(regexp_extract(substr(h, 3, 16), '^0*', 0)), 1) IN ('2', '3') THEN 2"
    "        WHEN substr(h, 3 + length(regexp_extract(substr(h, 3, 16), '^0*', 0)), 1) IN ('4', '5', '6', '7') THEN 1"
    "        ELSE 0 END + 1, 40)"
)


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(bucket, M) HLL register state (m=256) for ``key_col`` —
    one partially-aggregated groupBy; ≤256 output rows regardless of
    input size. Same hash derivation as `hll_cardinality`."""
    return (
        df.select(F.md5(F.col(key_col).cast("string")).alias("h"))
        .select(
            F.expr("CAST(conv(substr(h, 1, 2), 16, 10) AS BIGINT)").alias("bucket"),
            F.expr(_HLL_RHO_EXPR).cast("long").alias("r"),
        )
        .groupBy("bucket")
        .agg(F.max("r").alias("M"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two register relations: per-bucket max (associative,
    commutative, idempotent — replay-safe under at-least-once
    delivery)."""
    return a.unionByName(b).groupBy("bucket").agg(F.max("M").alias("M"))


def hll_estimate(registers: DataFrame, m: int = 256) -> float:
    """Point estimate from stored register state (the only collect is
    ≤ m rows). Same constants/corrections as the oracle query."""
    import math

    rows = {r["bucket"]: r["M"] for r in registers.collect()}
    present = len(rows)
    s = float(m - present) + sum(1.0 / (1 << v) for v in rows.values())
    alpha_m2 = (0.7213 / (1 + 1.079 / m)) * m * m
    raw = alpha_m2 / s
    if raw <= 2.5 * m and present < m:
        return m * math.log(m / float(m - present))
    return raw


def kmv_sketches(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values sketch per group: the k smallest md5 hashes of
    the group's DISTINCT keys (Beyer et al. 2007). Like the HLL
    registers above, the (group, sketch) relation is tiny SKETCH
    STATE — k strings per group — and mergeable: the min-k of a union
    is the min-k of the concatenated sketches, so per-batch sketches
    roll up without rescanning history, and set-overlap between any
    two groups is estimable from their sketches alone (see
    :func:`kmv_overlap`).

    Scale shape: one distinct on (group, key), one hash map, one
    shuffle on group for the per-group min-k (row_number window).
    The windowed rows are the group's DISTINCT keys — linear — and
    only k rows per group survive into the collected array.
    """
    hashed = (
        df.select(F.col(group_col), F.col(key_col))
        .distinct()
        .select(F.col(group_col), F.md5(F.col(key_col).cast("string")).alias("__h__"))
    )
    w = Window.partitionBy(group_col).orderBy("__h__")
    return (
        hashed.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("__h__")).alias("sketch"))
    )


def kmv_overlap(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise set-overlap estimates from KMV sketches alone: for
    groups A, B the k smallest of S_A ∪ S_B is a uniform sample of
    A ∪ B, and the fraction of that sample present in BOTH sketches
    estimates the Jaccard similarity — |S_k(A∪B) ∩ S_A ∩ S_B| / k.

    The pair join carries only the k-element sketch arrays (groups ×
    k strings — corpus size never appears), so estimating overlap
    between every pair of corpus slices is O(groups² · k log k),
    independent of the data. Output: (group_a, group_b, sample_hits,
    est_jaccard_pct) with integer evidence columns.
    """
    a = sketches.select(
        F.col(group_col).alias("group_a"), F.col("sketch").alias("__sa__")
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"), F.col("sketch").alias("__sb__")
    )
    paired = a.join(b, F.col("group_a") < F.col("group_b"))
    union_k = F.slice(
        F.array_sort(F.array_distinct(F.concat("__sa__", "__sb__"))), 1, k
    )
    hits = F.size(
        F.array_intersect(union_k, F.array_intersect("__sa__", "__sb__"))
    )
    return paired.select(
        "group_a",
        "group_b",
        hits.alias("sample_hits"),
        (100 * hits / F.lit(k)).cast("long").alias("est_jaccard_pct"),
    )
