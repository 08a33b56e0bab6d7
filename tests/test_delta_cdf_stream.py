"""Change-data-feed through the ``deltalog`` DataSource
(``option("readChangeFeed", "true")``): streaming — each micro-batch
carries exactly the window's row-level changes (file adds as inserts,
DV deltas as row deletes) through Structured Streaming's checkpointed
offsets; batch — Delta's ``startingVersion``(inclusive)/
``endingVersion`` option pair over the same planner
(``sources/delta.py::_plan_changes``, shared with ``delta_changes``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_processing_scd1_spark.sources.delta import (
    delete_delta_rows,
    delta_changes,
    write_delta_table,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        (F.col("id") % 3).cast("string").alias("part"),
    )


@pytest.fixture()
def registered(spark):
    from etl_processing_scd1_spark.sources.deltalog_datasource import (
        DeltaLogDataSource,
    )

    spark.dataSource.register(DeltaLogDataSource)
    return spark


class TestDeltaCdfStream:
    def _drain(self, spark, path, ck):
        got: list = []
        q = (
            spark.readStream.format("deltalog")
            .option("readChangeFeed", "true")
            .load(path)
            .writeStream.foreachBatch(
                lambda b, bid: got.extend(
                    (r.k, r._change_type, r._commit_version)
                    for r in b.collect()
                )
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination(180)
        return sorted(got)

    def test_stream_cdf_appends_dv_deletes_resume(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        ck = str(tmp_path / "ck")
        write_delta_table(_df(spark, 0, 10), path)                    # v0
        assert self._drain(spark, path, ck) == sorted(
            (k, "insert", 0) for k in range(10)
        )
        write_delta_table(_df(spark, 10, 15), path, mode="append")    # v1
        delete_delta_rows(spark, path, "k < 2")                       # v2
        assert self._drain(spark, path, ck) == sorted(
            [(k, "insert", 1) for k in range(10, 15)]
            + [(0, "delete", 2), (1, "delete", 2)]
        )
        # exactly-once across restart: same checkpoint, no new commits
        assert self._drain(spark, path, ck) == []
        # schema carries the CDF columns on top of the table schema
        sdf = (
            spark.readStream.format("deltalog")
            .option("readChangeFeed", "true").load(path)
        )
        assert sdf.columns == ["k", "v", "part", "_change_type",
                               "_commit_version"]

    def test_stream_cdf_on_column_mapped_table(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "cm")
        ck = str(tmp_path / "ck")
        write_delta_table(_df(spark, 0, 6), path, column_mapping="name")
        delete_delta_rows(spark, path, "k = 3")
        # both commits land in ONE micro-batch -> in-window netting:
        # the insert already subtracts the end snapshot's DV
        assert self._drain(spark, path, ck) == sorted(
            (k, "insert", 0) for k in range(6) if k != 3
        )
        # a later DV commit in its own batch emits the row delete,
        # projected back to logical column names
        delete_delta_rows(spark, path, "k = 0")
        assert self._drain(spark, path, ck) == [(0, "delete", 2)]

    def test_batch_cdf_starting_ending_version(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "b")
        write_delta_table(_df(spark, 0, 10), path)                    # v0
        write_delta_table(_df(spark, 10, 15), path, mode="append")    # v1
        delete_delta_rows(spark, path, "k % 7 = 0")                   # v2
        # startingVersion is INCLUSIVE (Delta's batch-CDF convention)
        got = (
            spark.read.format("deltalog")
            .option("readChangeFeed", "true")
            .option("startingVersion", 1)
            .load(path)
        )
        ref = delta_changes(spark, path, 0, 2)
        assert sorted((r.k, r._change_type, r._commit_version)
                      for r in got.collect()) == \
            sorted((r.k, r._change_type, r._commit_version)
                   for r in ref.collect())
        # endingVersion bounds the window
        got1 = (
            spark.read.format("deltalog")
            .option("readChangeFeed", "true")
            .option("startingVersion", 1)
            .option("endingVersion", 1)
            .load(path)
        )
        assert sorted((r.k, r._change_type) for r in got1.collect()) == \
            sorted((k, "insert") for k in range(10, 15))
        # filters still evaluate on the emitted rows; k=14 (inserted
        # AND DV-deleted inside the window) nets into the insert
        # subtraction, so only k=0 and k=7 emit delete events
        assert got.filter("_change_type = 'delete'").count() == 2
        assert sorted(
            r.k for r in got.filter("_change_type = 'delete'").collect()
        ) == [0, 7]
        assert sorted(
            r.k for r in got.filter("_change_type = 'insert'").collect()
        ) == [10, 11, 12, 13]
