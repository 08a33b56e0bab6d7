"""Catalog introspection (SURVEY.md §2.A A5).

The reference discovers its staging tables with
``table_name LIKE 'lapp_stg_%'`` and reads per-table column lists
from information_schema (main.py:33-39, 48-56), then drives SQL
generation off them. The engine exposes the same capability over the
Spark catalog and over Warehouse directories, so pipelines can be
written against discovered (not hard-coded) table sets.
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import SparkSession

from .storage import Warehouse


def list_catalog_tables(spark: SparkSession, like: str = "*") -> list[str]:
    """Registered table/view names matching a glob (the engine's
    spelling of ``LIKE 'lapp_stg_%'``)."""
    return sorted(
        t.name
        for t in spark.catalog.listTables()
        if fnmatch.fnmatch(t.name, like)
    )


def list_columns(spark: SparkSession, table: str) -> list[tuple[str, str]]:
    """(name, dataType) per column — information_schema.columns
    equivalent, used for positional alignment (B1)."""
    return [(c.name, c.dataType) for c in spark.catalog.listColumns(table)]


def list_warehouse_tables(wh: Warehouse, like: str = "*") -> list[str]:
    """Tables present in a Warehouse directory matching a glob."""
    if not os.path.isdir(wh.root):
        return []
    return sorted(
        name
        for name in os.listdir(wh.root)
        if os.path.isdir(os.path.join(wh.root, name))
        and not name.startswith((".", "_"))
        and fnmatch.fnmatch(name, like)
    )
