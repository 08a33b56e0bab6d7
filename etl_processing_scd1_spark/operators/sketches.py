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

    Scale shape (r7 verdict #4 — was: global distinct + full-domain
    row_number window, one shuffle of the whole distinct key domain):
    bottom-k is a mergeable statistic, and a hash in the global
    distinct-min-k is necessarily in the distinct-min-k of every
    partition that contains it — so the min-k partial is computed
    PER PARTITION in one narrow Arrow pass (no shuffle of the key
    domain at all, duplicates collapse locally), and the only
    shuffle carries ≤ partitions × groups × k rows into the final
    per-group merge (distinct → sort → slice k). Past the narrow
    scan, work is O(slices · k) exactly as a mergeable sketch
    should be; no distinct pre-pass is needed because local dedup
    plus the merge's array_distinct reproduce it.
    """
    import pandas as pd

    hashed = df.select(
        F.col(group_col), F.md5(F.col(key_col).cast("string")).alias("__h__")
    )
    schema = hashed.schema

    def partition_bottom_k(batches):
        best: dict = {}  # group -> set of candidate hashes (trimmed)
        trim_at = 8 * k
        for pdf in batches:
            for g, s in pdf.groupby(group_col, sort=False)["__h__"]:
                cur = best.setdefault(g, set())
                cur.update(s.dropna().unique())
                if len(cur) > trim_at:
                    best[g] = set(sorted(cur)[:k])
        rows = [
            (g, h) for g, cur in best.items() for h in sorted(cur)[:k]
        ]
        yield pd.DataFrame(rows, columns=[group_col, "__h__"])

    partial = hashed.mapInPandas(partition_bottom_k, schema=schema)
    return partial.groupBy(group_col).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.collect_list("__h__"))), 1, k
        ).alias("sketch")
    )


def kmv_sketches_from_sets(
    df: DataFrame,
    group_col: str,
    keys_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV sketch per group when each row already carries a key SET
    (an array column, e.g. a document's shingle set) — same result as
    exploding ``keys_col`` into :func:`kmv_sketches`, cheaper by one
    whole tier: the per-ROW bottom-k (hash → sort → slice k) runs
    JVM-side inside whole-stage codegen, so the Arrow boundary moves
    bounded k-element arrays (rows × k), never the exploded key
    domain. Correct for the same reason the partition merge is: a
    hash in the global distinct-min-k is in the min-k of every row's
    set that contains it. The Python pass then merges per partition
    and the final shuffle is ≤ partitions × groups × k rows.
    """
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    per_row = df.select(
        F.col(group_col),
        F.slice(
            F.array_sort(
                F.transform(
                    F.col(keys_col), lambda g: F.md5(g.cast("string"))
                )
            ),
            1,
            k,
        ).alias("__hs__"),
    )
    out_schema = StructType(
        [df.schema[group_col], StructField("__h__", StringType())]
    )

    def partition_merge(batches):
        best: dict = {}
        trim_at = 8 * k
        for pdf in batches:
            for g, arrs in pdf.groupby(group_col, sort=False)["__hs__"]:
                cur = best.setdefault(g, set())
                for a in arrs:
                    cur.update(a)
                if len(cur) > trim_at:
                    best[g] = set(sorted(cur)[:k])
        rows = [
            (g, h) for g, cur in best.items() for h in sorted(cur)[:k]
        ]
        yield pd.DataFrame(rows, columns=[group_col, "__h__"])

    partial = per_row.mapInPandas(partition_merge, schema=out_schema)
    return partial.groupBy(group_col).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.collect_list("__h__"))), 1, k
        ).alias("sketch")
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
