"""Registry plumbing shared by the query modules."""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with a proper TimestampType ``ts``.

    The testdata stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects outright. Read nanos as long
    (legacy conf) and convert with integer division — ``DIV 1000``,
    never float division: epoch-nanos ≈ 1.7e18 exceeds a double's
    53-bit mantissa, so ``/ 1000`` would silently corrupt timestamps.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = table(spark, sf_dir, "events")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def make_registry():
    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}

    def register(name: str, oracle: str | None = None):
        def deco(fn):
            queries[name] = fn
            if oracle is not None:
                oracles[name] = oracle
            return fn

        return deco

    return queries, oracles, register
