"""Interval-join operator tests: boundary semantics (start inclusive,
end exclusive), grain-straddling intervals, key isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

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


def test_band_join_matches_bruteforce_including_boundaries(spark):
    """band_join must equal the brute-force inequality join on a frame
    engineered to hit the edge cases: diff exactly == tolerance (kept),
    tolerance+1 (dropped), partners straddling a bucket boundary, and
    an extra_key that separates otherwise-matching rows."""
    from etl_processing_scd1_spark.operators.rangejoin import band_join

    # tolerance 5 → buckets of width 5; values straddle bucket edges
    rows = [
        (1, 10, "x"), (2, 15, "x"),   # diff 5 == tolerance, kept
        (3, 21, "x"),                  # 15→21 diff 6, dropped; 21 vs 19...
        (4, 19, "x"),                  # 19 vs 21 diff 2 across bucket edge (3 vs 4)
        (5, 100, "x"), (6, 106, "x"),  # diff 6, dropped
        (7, 15, "y"),                  # same value as id 2, different key
    ]
    df = spark.createDataFrame(rows, "id long, v long, k string")
    right = df.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("k").alias("kb")
    )
    got = {
        (r["id"], r["id_b"])
        for r in band_join(df, right, "v", "vb", tolerance=5, extra_key=("k", "kb"))
        .filter(F.col("id") < F.col("id_b"))
        .collect()
    }
    brute = {
        (a, b)
        for a, va, ka in rows
        for b, vb, kb in rows
        if a < b and ka == kb and abs(va - vb) <= 5
    }
    assert got == brute and (1, 2) in got and (3, 4) in got


def test_band_join_property_matches_bruteforce(spark):
    """Property: on randomized integer values and tolerances the
    bucketed band join equals the brute-force quadratic join —
    including negative values (floor division must bucket them
    consistently) and values sitting exactly on bucket edges."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from etl_processing_scd1_spark.operators.rangejoin import band_join

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(
            st.integers(min_value=-50, max_value=50), min_size=2, max_size=14
        ),
        tol=st.integers(min_value=1, max_value=12),
    )
    def run(vals, tol):
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "id long, v long")
        right = df.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        got = {
            (r["id"], r["id_b"])
            for r in band_join(df, right, "v", "vb", tolerance=tol)
            .filter(F.col("id") < F.col("id_b"))
            .collect()
        }
        brute = {
            (a, b)
            for a, va in rows
            for b, vb in rows
            if a < b and abs(va - vb) <= tol
        }
        assert got == brute

    run()
