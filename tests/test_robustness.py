"""Round-2 robustness gates: cache hygiene (no persisted frames left
behind by SCD1 merges or the MinHash dedup), crash-window recovery of
an interrupted publish, append-file name-collision safety, and as-of
join semantics when state rows contain NULLs — each a defect class
flagged by the round-1 review."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from etl_processing_scd1_spark.operators.asof import asof_join
from etl_processing_scd1_spark.operators.dedup import (
    near_dedup_minhash,
    release_cached,
)
from etl_processing_scd1_spark.operators.scd1 import scd1_merge
from etl_processing_scd1_spark.storage import Warehouse

from .conftest import persistent_rdd_ids


def test_scd1_merge_unpersists_cache(spark):
    dim = spark.createDataFrame(
        [(1, "a", dt.datetime(2021, 3, 1), None, dt.datetime(2021, 3, 1))],
        "k int, v string, create_dt timestamp, update_dt timestamp, processed_dt timestamp",
    )
    stg = spark.createDataFrame(
        [
            (1, "b", dt.datetime(2021, 3, 2), dt.datetime(2021, 3, 2), dt.datetime(2021, 3, 2)),
            (2, "c", dt.datetime(2021, 3, 2), None, dt.datetime(2021, 3, 2)),
        ],
        "k int, v string, create_dt timestamp, update_dt timestamp, processed_dt timestamp",
    )
    before = persistent_rdd_ids(spark)
    res = scd1_merge(dim, stg, key="k", compare_cols=["v"])
    assert res.counts() == {"inserted": 1, "updated": 1, "deleted": 0, "rows": 2}
    assert persistent_rdd_ids(spark) - before  # cache live while legs consumed
    res.unpersist()
    res.unpersist()  # idempotent
    assert persistent_rdd_ids(spark) - before == set()


def test_run_day_leaves_no_persisted_frames(spark, tmp_path):
    from etl_processing_scd1_spark.pipeline import run_day

    clients = spark.createDataFrame(
        [
            (
                1,
                "Ivanov",
                "Ivan",
                "I",
                dt.date(1980, 1, 1),
                "4510 123456",
                dt.date(2031, 1, 1),
                "+7 999 000 11 22",
                dt.datetime(2021, 3, 1),
                None,
            )
        ],
        "client_id int, last_name string, first_name string, patronymic string,"
        " date_of_birth date, passport_num string, passport_valid_to date,"
        " phone string, create_dt timestamp, update_dt timestamp",
    )
    before = persistent_rdd_ids(spark)
    run_day(
        spark,
        Warehouse(spark, str(tmp_path / "wh")),
        bank_sources={"clients": clients},
        run_ts=dt.datetime(2021, 3, 2, 1, 0, 0),
    )
    # id-SET difference, not a count delta: the ContextCleaner may
    # concurrently GC-unpersist unrelated dead RDDs, but it can never
    # introduce NEW ids
    assert persistent_rdd_ids(spark) - before == set()


def test_near_dedup_release_cached(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3) for i in range(6)]
        + [(99, "completely unrelated text with no duplicate partner here")],
        "doc_id int, text string",
    )
    before = persistent_rdd_ids(spark)
    pairs = near_dedup_minhash(docs, "doc_id", "text")
    assert pairs.count() == 15  # 6 identical docs -> C(6,2) pairs
    assert persistent_rdd_ids(spark) - before
    release_cached(pairs)
    release_cached(pairs)  # idempotent
    assert persistent_rdd_ids(spark) - before == set()


def test_interrupted_publish_recovers_old_dir(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.stage("dim", spark.createDataFrame([(1, "a")], "id int, v string"))
    wh.publish(run_id="r1")
    # simulate a crash BETWEEN the two publish renames: live moved to
    # .old, replacement never arrived
    os.rename(os.path.join(root, "dim"), os.path.join(root, "dim.old"))
    wh2 = Warehouse(spark, root)  # reopen heals the window
    assert wh2.read("dim").count() == 1  # history restored, not empty-bootstrap
    assert not os.path.isdir(os.path.join(root, "dim.old"))


def test_completed_publish_old_dir_is_cleaned(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.stage("dim", spark.createDataFrame([(1, "a")], "id int, v string"))
    wh.publish(run_id="r1")
    # crash AFTER the swap but before .old cleanup: both dirs present
    wh.stage("dim", spark.createDataFrame([(2, "b")], "id int, v string"))
    wh.publish(run_id="r2")
    os.makedirs(os.path.join(root, "dim.old"))
    Warehouse(spark, root)
    assert not os.path.isdir(os.path.join(root, "dim.old"))


def test_append_publish_never_overwrites_same_run_id(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.stage_append("fact", spark.createDataFrame([(1,)], "x int").coalesce(1))
    wh.publish(run_id="SAME")
    # a replayed run_ts (same-day re-run) publishes under the same id;
    # the first run's live files must survive
    wh.stage_append("fact", spark.createDataFrame([(2,)], "x int").coalesce(1))
    wh.publish(run_id="SAME")
    assert sorted(r["x"] for r in wh.read("fact").collect()) == [1, 2]


def test_corrupt_populated_table_raises_not_empty(spark, tmp_path):
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.stage("dim", spark.createDataFrame([(1, "a")], "id int, v string"))
    wh.publish(run_id="r1")
    # corrupt the (single) live parquet part: a read must FAIL loudly —
    # returning an empty frame would make scd1_merge destroy history
    live = os.path.join(str(tmp_path / "wh"), "dim")
    part = next(f for f in os.listdir(live) if f.endswith(".parquet"))
    with open(os.path.join(live, part), "wb") as fh:
        fh.write(b"not parquet at all")
    with pytest.raises(Exception):
        wh.read("dim").collect()


def test_asof_join_carries_nulls_from_latest_state(spark):
    probe = spark.createDataFrame(
        [(1, dt.datetime(2021, 3, 1, 12))], "k int, ts timestamp"
    )
    state = spark.createDataFrame(
        [
            (1, dt.datetime(2021, 3, 1, 10), "old", 100),
            # latest state row: v genuinely NULL, w updated
            (1, dt.datetime(2021, 3, 1, 11), None, 200),
        ],
        "k int, sts timestamp, v string, w int",
    )
    out = asof_join(
        probe, state, key="k", left_ts="ts", right_ts="sts", value_cols=["v", "w"]
    ).collect()
    assert len(out) == 1
    # BOTH columns come from the 11:00 row — v is NULL (not the
    # resurrected 'old'), w is 200; per-column carry would mix rows
    assert out[0]["v"] is None
    assert out[0]["w"] == 200
