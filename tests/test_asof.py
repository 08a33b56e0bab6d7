"""As-of join operator tests: boundary ties (strict vs non-strict),
missing prior state, interleaved multi-key histories."""

from __future__ import annotations

import datetime as dt

from etl_processing_scd1_spark.operators.asof import asof_join

D = dt.datetime


def _frames(spark):
    probes = spark.createDataFrame(
        [
            (1, "K1", D(2021, 3, 1, 10, 0)),
            (2, "K1", D(2021, 3, 1, 12, 0)),
            (3, "K1", D(2021, 3, 1, 9, 0)),   # before any state
            (4, "K2", D(2021, 3, 1, 11, 0)),
        ],
        "event_id long, key string, ts timestamp",
    )
    state = spark.createDataFrame(
        [
            ("K1", D(2021, 3, 1, 10, 0), 100.0),  # exactly at probe 1
            ("K1", D(2021, 3, 1, 11, 0), 110.0),
            ("K2", D(2021, 3, 1, 8, 0), 200.0),
        ],
        "key string, ts_s timestamp, quote double",
    )
    return probes, state


def test_asof_non_strict_includes_same_instant(spark):
    probes, state = _frames(spark)
    out = {
        r["event_id"]: r["quote"]
        for r in asof_join(
            probes, state, key="key", left_ts="ts", right_ts="ts_s",
            value_cols=["quote"],
        ).collect()
    }
    assert out[1] == 100.0   # ts == state ts → visible (<=)
    assert out[2] == 110.0   # latest prior state wins
    assert out[3] is None    # no prior state → NULL (left outer)
    assert out[4] == 200.0   # keys never bleed into each other


def test_asof_strict_excludes_same_instant(spark):
    probes, state = _frames(spark)
    out = {
        r["event_id"]: r["quote"]
        for r in asof_join(
            probes, state, key="key", left_ts="ts", right_ts="ts_s",
            value_cols=["quote"], strict=True,
        ).collect()
    }
    assert out[1] is None    # strict: same-instant state invisible
    assert out[2] == 110.0
