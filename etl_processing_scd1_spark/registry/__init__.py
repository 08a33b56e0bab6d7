"""Query registry — the driver-facing catalog of implemented operators.

Each SURVEY.md §2 operator row registers one named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a
DuckDB oracle string over the same parquet tables. ``__spark_entry__``
re-exports these as ``queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from . import core, scd1q, extensions, streamingq, curationq, advancedq

QUERIES: dict = {}
ORACLES: dict = {}
for _m in (core, scd1q, extensions, streamingq, curationq, advancedq):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

__all__ = ["QUERIES", "ORACLES"]
