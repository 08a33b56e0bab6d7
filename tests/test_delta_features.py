"""Delta table-feature surface beyond the core log: In-Commit
Timestamps (PROTOCOL.md §In-Commit Timestamps — monotonic
``inCommitTimestamp`` in a first-action commitInfo, enablement
provenance properties, ICT-preferring timestamp travel)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from etl_processing_scd1_spark.sources.delta import (
    delete_delta_rows,
    delta_version_at_timestamp,
    enable_in_commit_timestamps,
    read_delta_table,
    write_delta_table,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def _commit_actions(path, version):
    f = os.path.join(path, "_delta_log", f"{version:020d}.json")
    with open(f) as fh:
        return [json.loads(line) for line in fh if line.strip()]


class TestInCommitTimestamps:
    def test_enable_stamps_and_monotonic(self, spark, tmp_path):
        path = str(tmp_path / "ict")
        write_delta_table(_df(spark, 0, 10), path)          # v0, no ICT
        v = enable_in_commit_timestamps(spark, path)        # v1
        assert v == 1
        # enablement commit: first action is commitInfo with ICT,
        # protocol lists the writer feature, config carries the
        # provenance properties matching the stamped value
        acts = _commit_actions(path, 1)
        assert "commitInfo" in acts[0]
        ict1 = acts[0]["commitInfo"]["inCommitTimestamp"]
        proto = next(a["protocol"] for a in acts if "protocol" in a)
        assert proto["minWriterVersion"] == 7
        assert "inCommitTimestamp" in proto["writerFeatures"]
        # legacy writer version 2 features are listed on upgrade
        assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])
        meta = next(a["metaData"] for a in acts if "metaData" in a)
        cfg = meta["configuration"]
        assert cfg["delta.enableInCommitTimestamps"] == "true"
        assert cfg["delta.inCommitTimestampEnablementVersion"] == "1"
        assert cfg["delta.inCommitTimestampEnablementTimestamp"] == str(ict1)

        # every later commit is stamped, first action, strictly increasing
        write_delta_table(_df(spark, 10, 15), path)         # v2 append
        delete_delta_rows(spark, path, "k = 3")             # v3 DML
        prev = ict1
        for ver in (2, 3):
            acts = _commit_actions(path, ver)
            assert "commitInfo" in acts[0], f"v{ver} commitInfo not first"
            ict = acts[0]["commitInfo"]["inCommitTimestamp"]
            assert ict > prev
            prev = ict
        # idempotent enable
        assert enable_in_commit_timestamps(spark, path) == 3

    def test_timestamp_travel_uses_ict(self, spark, tmp_path):
        path = str(tmp_path / "ict2")
        write_delta_table(_df(spark, 0, 5), path)           # v0
        enable_in_commit_timestamps(spark, path)            # v1
        write_delta_table(_df(spark, 5, 8), path)           # v2
        write_delta_table(_df(spark, 8, 12), path)          # v3
        ict2 = _commit_actions(path, 2)[0]["commitInfo"]["inCommitTimestamp"]
        ict3 = _commit_actions(path, 3)[0]["commitInfo"]["inCommitTimestamp"]
        assert delta_version_at_timestamp(path, ict2) == 2
        assert delta_version_at_timestamp(path, ict3 - 1) == 2
        assert delta_version_at_timestamp(path, ict3) == 3
        df = read_delta_table(spark, path, timestamp_ms=ict2)
        assert df.count() == 8

    def test_monotonic_under_clock_skew(self, spark, tmp_path, monkeypatch):
        path = str(tmp_path / "ict3")
        write_delta_table(_df(spark, 0, 3), path)
        enable_in_commit_timestamps(spark, path)
        ict1 = _commit_actions(path, 1)[0]["commitInfo"]["inCommitTimestamp"]
        # freeze the clock in the past: ICT must still advance
        import etl_processing_scd1_spark.sources.delta as d
        monkeypatch.setattr(d.time, "time", lambda: (ict1 - 60_000) / 1000.0)
        write_delta_table(_df(spark, 3, 6), path)
        ict2 = _commit_actions(path, 2)[0]["commitInfo"]["inCommitTimestamp"]
        assert ict2 == ict1 + 1

    def test_table_created_without_ict_unaffected(self, spark, tmp_path):
        path = str(tmp_path / "plain")
        write_delta_table(_df(spark, 0, 5), path)
        write_delta_table(_df(spark, 5, 9), path)
        for ver in (0, 1):
            for a in _commit_actions(path, ver):
                assert "inCommitTimestamp" not in (a.get("commitInfo") or {})
