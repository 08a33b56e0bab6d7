"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship velocity-fraud query (scan → broadcast
star join → window → filter → project: the SURVEY.md §7 minimum
slice), ``queries``/``oracle_sql`` expose the operator registry of
etl_processing_scd1_spark (one entry per SURVEY.md §2 row).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_processing_scd1_spark.registry import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The H3-analog velocity rule (SURVEY §2.E E2): per-user lag window
    over the events stream flags state changes within one hour.
    Resolved from the MERGED catalog — the per-round rotation of the
    driver-checked PRIMARY window moves queries between tiers, and the
    flagship must stay reachable regardless of which tier holds it.
    """
    return {**QUERIES, **EXTRA_QUERIES}["velocity_fraud_rule"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 — the
    50-entry PRIMARY tier first (insertion order is the driver's
    correctness window), then the extras tier (also oracle-paired)."""
    return {**QUERIES, **EXTRA_QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases)."""
    return {**ORACLES, **EXTRA_ORACLES}
