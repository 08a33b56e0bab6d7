"""Windowed-aggregation queries (SURVEY.md §2.I): tumbling and
session windows over the events stream table. These run here in
batch mode — the identical expressions run under readStream (the
streaming module wires them); the oracles pin the window semantics
(session = gaps-and-islands with end = last event + gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._base import events_table, make_registry

QUERIES, ORACLES, register = make_registry()


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.I: tumbling event-time window (F.window) — the streaming
    aggregation primitive, here batch-checked. The sum is exact
    integer cents emitted as DOUBLE (order-independent under any
    partitioning; no DECIMAL in the output)."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / F.lit(100.0)
            ).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_window_agg",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    hits AS (
      -- each event belongs to the 2 sliding windows (1d length, 12h
      -- slide) whose start s satisfies s <= ts < s + 1 day
      SELECT event_type, ts,
             CAST(to_timestamp(
               (CAST(floor(epoch(ts) / 43200) AS BIGINT) - k) * 43200
             ) AS TIMESTAMP) AS window_start
      FROM e, unnest([0, 1]) AS t(k)
      WHERE epoch(ts) - (CAST(floor(epoch(ts) / 43200) AS BIGINT) - k) * 43200 < 86400
    )
    SELECT window_start,
           window_start + INTERVAL 1 DAY AS window_end,
           event_type,
           count(*) AS n_events
    FROM hits GROUP BY 1, 2, 3
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.I: sliding event-time window (1-day length, 12-hour slide) —
    each event contributes to two overlapping windows; completes the
    window triad (tumbling/sliding/session). The oracle derives the
    member windows arithmetically from the epoch."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


@register(
    "session_window_agg",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.I: session window (30-min inactivity gap) per user — the
    sessionization primitive behind the streaming velocity rule. The
    oracle is the classic gaps-and-islands formulation, pinning
    Spark's merge rule (end-exclusive: a gap of exactly 30 min starts
    a new session; session end = last event + gap)."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
