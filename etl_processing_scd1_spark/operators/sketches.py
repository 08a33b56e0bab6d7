"""Reusable sketch state builders (the DataFrame twins of the
oracle-checked sketch queries in ``registry/advancedq``).

The register relation (bucket, M) is the SKETCH STATE: tiny (m rows),
mergeable (per-bucket max), storable as an ordinary warehouse table —
which is what makes it maintainable incrementally from batches or
micro-batches without rescanning history (`hll_merge_proof` checks
the merge identity cell-by-cell against a DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
