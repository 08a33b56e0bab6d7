"""Product-analytics tier: exact distributed order statistics and
guaranteed-exact heavy hitters.

Beyond-reference analytics shapes (the reference's only aggregate is
the watermark max, ``main.py:362``). These complete the existing
quantile/frequency families with their EXACT-at-scale members:
[[median_agg]] / [[group_quantiles]] are sort-based exact percentile
aggregates (fine per group, costly globally), [[histogram_quantiles]]
is the mergeable approximate sketch — ``exact_quantiles_price`` is
the exact global order statistic with NO sort anywhere; and
[[cms_heavy_hitters]] is the approximate count-min screen —
``heavy_hitters_exact`` is the provably exact top-k. Every output
column is an exact BIGINT, so engine/oracle parity is structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._base import make_registry, table
from ..operators.stats import exact_quantiles, heavy_hitters_topk

QUERIES, ORACLES, register = make_registry()


# --------------------------------------------------------------------------
# Exact quantiles via histogram refinement (no global sort)
# --------------------------------------------------------------------------

_QUANT_PROBS = [2500, 5000, 7500, 9900]


def _quantiles_oracle(probs_bp: list[int]) -> str:
    # one static SELECT per prob (DuckDB's quantile_disc requires a
    # constant fraction); rank k = floor((n-1)*bp/10000) + 1 is the
    # quantile_disc convention, emitted as evidence.
    parts = [
        f"""
        SELECT CAST({bp} AS BIGINT) AS prob_bp,
               CAST((SELECT (count(*) - 1) * {bp} // 10000 + 1 FROM v) AS BIGINT) AS rank,
               CAST((SELECT quantile_disc(x, {bp / 10000.0}) FROM v) AS BIGINT) AS value
        """
        for bp in probs_bp
    ]
    return (
        "WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x"
        " FROM lineitem)\n" + "\nUNION ALL\n".join(parts)
    )


@register("exact_quantiles_price", oracle=_quantiles_oracle(_QUANT_PROBS))
def exact_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75/p99 of line-item price cents WITHOUT a
    global sort: histogram refinement — one (n, min) aggregate, one
    bucket histogram, one per-value count over only the buckets that
    contain a requested rank. Driver memory is O(domain/W + W),
    independent of row count; all counts exact BIGINTs
    (:func:`operators.stats.exact_quantiles`; rank convention =
    DuckDB ``quantile_disc``)."""
    li = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    return exact_quantiles(li, "cents", _QUANT_PROBS, bucket_width=4096)


# --------------------------------------------------------------------------
# Heavy hitters: bounded-candidate screen + exact verify (or fallback)
# --------------------------------------------------------------------------

_HH_ORACLE = """
    SELECT CAST(l_suppkey AS BIGINT) AS key, CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY cnt DESC, key
    LIMIT 10
"""


@register("heavy_hitters_exact", oracle=_HH_ORACLE)
def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 suppliers by line-item count through the
    heavy-hitters screen: per-partition bounded candidate sets (one
    Arrow pass), exact recount of the candidate union, and a proved
    bound check (k-th count > Σ per-partition thresholds ⇒ no absent
    key can reach the top-k) with a full-aggregation fallback when
    the proof fails — identical output either way, deterministic
    (count desc, key asc). The screen is the 100 TB path for key
    domains too large to shuffle
    (:func:`operators.stats.heavy_hitters_topk`)."""
    li = table(spark, sf_dir, "lineitem")
    return heavy_hitters_topk(li, "l_suppkey", k=10)
