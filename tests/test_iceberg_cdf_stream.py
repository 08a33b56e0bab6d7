"""Change-data-feed through the ``iceberglog`` DataSource
(``option("readChangeFeed", "true")``): streaming — micro-batches of
row-level changes planned from metadata-version diffs (file adds as
inserts, position-delete deltas as row deletes, replace/compaction
snapshots skipped as no logical change); batch —
``startingVersion``(inclusive)/``endingVersion`` over the same
planner. Equality-delete commits gate with a clear raise (emitting
their row images would need a full matching scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_processing_scd1_spark.sources.iceberg import (
    delete_iceberg_rows,
    update_iceberg_rows,
    write_iceberg_table,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        (F.col("id") % 3).cast("string").alias("part"),
    )


@pytest.fixture()
def registered(spark):
    from etl_processing_scd1_spark.sources.iceberglog_datasource import (
        IcebergLogDataSource,
    )

    spark.dataSource.register(IcebergLogDataSource)
    return spark


class TestIcebergCdf:
    def _drain(self, spark, path, ck):
        got: list = []
        q = (
            spark.readStream.format("iceberglog")
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

    def test_stream_cdf_appends_deletes_update_resume(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        ck = str(tmp_path / "ck")
        write_iceberg_table(_df(spark, 0, 10), path)                  # v1
        assert self._drain(spark, path, ck) == sorted(
            (k, "insert", 1) for k in range(10)
        )
        write_iceberg_table(_df(spark, 10, 15), path, mode="append")  # v2
        delete_iceberg_rows(spark, path, "k < 2")                     # v3
        assert self._drain(spark, path, ck) == sorted(
            [(k, "insert", 2) for k in range(10, 15)]
            + [(0, "delete", 3), (1, "delete", 3)]
        )
        # exactly-once on resume
        assert self._drain(spark, path, ck) == []
        # merge-on-read UPDATE: one version emits both halves
        update_iceberg_rows(spark, path, "k = 5", {"v": "999"})       # v4
        assert self._drain(spark, path, ck) == sorted(
            [(5, "delete", 4), (5, "insert", 4)]
        )
        sdf = (
            spark.readStream.format("iceberglog")
            .option("readChangeFeed", "true").load(path)
        )
        assert sdf.columns == ["k", "v", "part", "_change_type",
                               "_commit_version"]

    def test_batch_cdf_netting_and_compaction_skip(
        self, registered, tmp_path
    ):
        from etl_processing_scd1_spark.sources.iceberg import (
            compact_iceberg_table,
        )

        spark = registered
        path = str(tmp_path / "b")
        write_iceberg_table(_df(spark, 0, 10).coalesce(1), path)      # v1
        delete_iceberg_rows(spark, path, "k % 5 = 0")                 # v2
        got = (
            spark.read.format("iceberglog")
            .option("readChangeFeed", "true")
            .option("startingVersion", 2)
            .load(path)
        )
        assert sorted((r.k, r._change_type, r._commit_version)
                      for r in got.collect()) == [
            (0, "delete", 2), (5, "delete", 2),
        ]
        # whole-history window: per-snapshot changelog semantics (the
        # format's own changelog-scan contract — each snapshot's
        # changes, NO cross-version netting): the v1 inserts AND the
        # v2 deletes both emit
        got = (
            spark.read.format("iceberglog")
            .option("readChangeFeed", "true")
            .option("startingVersion", 1)
            .option("endingVersion", 2)
            .load(path)
        )
        ins = sorted(r.k for r in got.collect()
                     if r._change_type == "insert")
        assert ins == list(range(10))
        assert sorted(r.k for r in got.collect()
                      if r._change_type == "delete") == [0, 5]
        # compaction (replace snapshot) is NOT a logical change
        compact_iceberg_table(spark, path, target_files=1)            # v3
        got = (
            spark.read.format("iceberglog")
            .option("readChangeFeed", "true")
            .option("startingVersion", 3)
            .load(path)
        )
        assert got.count() == 0

    def test_equality_delete_window_emits_row_images(
        self, registered, tmp_path
    ):
        """Formerly a gated raise: the eq-delete window now emits the
        matched keys' old row images as deletes plus the upsert batch
        as inserts (TestEqualityDeleteChangelog in test_iceberg.py
        pins the full semantics — this pins the STREAM-facing reader
        path used by the CDF tests)."""
        from etl_processing_scd1_spark.sources.iceberg import (
            upsert_iceberg_table,
        )

        spark = registered
        path = str(tmp_path / "eq")
        write_iceberg_table(_df(spark, 0, 5), path)                   # v1
        upsert_iceberg_table(_df(spark, 3, 7), path, ["k"])           # v2
        ch = sorted(
            (r._change_type, r.k)
            for r in (
                spark.read.format("iceberglog")
                .option("readChangeFeed", "true")
                .option("startingVersion", 2)
                .load(path)
                .collect()
            )
        )
        # keys 3,4 existed -> old images die; 3..6 insert
        assert ch == [
            ("delete", 3), ("delete", 4),
            ("insert", 3), ("insert", 4), ("insert", 5), ("insert", 6),
        ]
        # a window BEFORE the upsert still reads
        got = (
            spark.read.format("iceberglog")
            .option("readChangeFeed", "true")
            .option("startingVersion", 1)
            .option("endingVersion", 1)
            .load(path)
        )
        assert got.count() == 5
