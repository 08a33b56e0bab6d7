"""Interval-join operator tests: boundary semantics (start inclusive,
end exclusive), grain-straddling intervals, key isolation."""

from __future__ import annotations

import datetime as dt

from etl_processing_scd1_spark.operators.rangejoin import interval_join

D = dt.datetime


def test_interval_join_boundaries_and_grain_straddle(spark):
    points = spark.createDataFrame(
        [
            (1, "K", D(2021, 3, 1, 10, 0, 0)),   # == start → included
            (2, "K", D(2021, 3, 1, 11, 59, 59)), # inside, next grain bucket
            (3, "K", D(2021, 3, 1, 12, 0, 0)),   # == end → excluded
            (4, "K", D(2021, 3, 1, 9, 59, 59)),  # before start
            (5, "X", D(2021, 3, 1, 10, 30, 0)),  # wrong key
        ],
        "pid long, key string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, "K", D(2021, 3, 1, 10, 0, 0), D(2021, 3, 1, 12, 0, 0))],
        "iid long, ikey string, start_ts timestamp, end_ts timestamp",
    )
    out = interval_join(
        points, intervals, "ts", "start_ts", "end_ts",
        grain_seconds=3600, extra_key=("key", "ikey"),
    )
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]
