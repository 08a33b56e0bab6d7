"""Advanced relational surface: interval join, skew-salted
aggregation, exact medians, JSON extraction — capabilities a
general-purpose engine needs beyond the reference's fixed DAG
(SURVEY.md §2.F note / §2.C 'not present in reference' list)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rangejoin import interval_join
from ._base import events_table, make_registry, table

QUERIES, ORACLES, register = make_registry()


@register(
    "interval_join",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    i AS (
      SELECT event_id AS signup_id, user_id AS usr,
             CAST(ts AS TIMESTAMP) AS start_ts,
             CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS end_ts
      FROM events WHERE event_type = 'signup'
    )
    SELECT p.event_id, p.user_id, p.ts, i.signup_id, i.start_ts
    FROM p JOIN i
      ON p.user_id = i.usr AND p.ts >= i.start_ts AND p.ts < i.end_ts
    """,
)
def interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join ('events within 2h after a signup') via
    grain-bucketed equi-join + exact filter (operators.rangejoin) —
    never the cartesian/nested-loop plan a bare BETWEEN produces.
    Oracle: the naive BETWEEN join, correct at oracle scale."""
    ev = events_table(spark, sf_dir)
    points = ev.select("event_id", "user_id", "ts")
    intervals = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("usr"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    return interval_join(
        points,
        intervals,
        point_ts="ts",
        start_ts="start_ts",
        end_ts="end_ts",
        grain_seconds=3600,
        extra_key=("user_id", "usr"),
    ).select("event_id", "user_id", "ts", "signup_id", "start_ts")


@register(
    "skew_salted_agg",
    oracle="SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: pre-aggregate on (key, salt) so a
    pathologically hot key spreads over 16 reducers, then combine.
    Result is exactly the plain groupBy (the oracle); the shape is
    the manual fallback when AQE skew handling isn't available —
    e.g. for skewed window/collect operations."""
    ev = events_table(spark, sf_dir)
    salted = ev.withColumn("__salt__", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "__salt__").agg(F.count("*").alias("__c__"))
    return partial.groupBy("event_type").agg(F.sum("__c__").alias("n_events"))


@register(
    "median_agg",
    oracle="""
    SELECT event_type,
           quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS median_cents,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def median_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median via percentile over integer cents — linear
    interpolation on ints is exact in double, so Spark's percentile
    and DuckDB's quantile_cont agree bit-for-bit (raw-double medians
    would not)."""
    ev = events_table(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.expr("percentile(CAST(round(value * 100) AS LONG), 0.5)").alias("median_cents"),
        F.count("*").alias("n"),
    )


@register(
    "cardinality_sketch",
    oracle="""
    WITH toks AS (
      SELECT lang,
             unnest(list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                              x -> x <> ''))) AS tok
      FROM documents
    ),
    buckets AS (
      SELECT DISTINCT lang,
             CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) AS BIGINT) AS bucket
      FROM toks
    )
    SELECT lang, count(*) AS occupied_buckets, 4096 AS sketch_size
    FROM buckets GROUP BY lang
    """,
)
def cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting cardinality sketch per language: tokens hash
    into 4096 buckets; the OCCUPIED-BUCKET COUNT is the sketch state
    (estimate = -m·ln(empty/m), computed by the consumer). Unlike
    approx_count_distinct, the state here is integer-exact and
    engine-portable — and like any sketch it merges by OR, so
    per-partition states combine without re-scanning (the 100 TB
    cardinality pattern when exact distinct is too expensive)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
            )
        ).alias("tok"),
    )
    h = F.md5(F.col("tok"))
    digit = lambda j: F.instr(F.lit("0123456789abcdef"), F.substring(h, j, 1)) - 1  # noqa: E731
    bucket = (digit(1) * 256 + digit(2) * 16 + digit(3)).cast("long")
    return (
        toks.select("lang", bucket.alias("bucket"))
        .distinct()
        .groupBy("lang")
        .agg(F.count("*").alias("occupied_buckets"), F.lit(4096).alias("sketch_size"))
    )


@register(
    "pivot_agg",
    oracle="""
    SELECT user_id % 10 AS decile,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id % 10
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General surface: PIVOT — long-to-wide aggregation with an
    explicit value list (never the implicit distinct-scan variant,
    which adds a full extra pass at scale)."""
    ev = events_table(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.withColumn("decile", F.col("user_id") % 10)
        .groupBy("decile")
        .pivot("event_type", types)
        .count()
    )
    return wide.select(
        "decile", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@register(
    "grouped_custom_agg",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           count(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
)
def grouped_custom_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.J surface: custom per-group logic via applyInPandas (Arrow
    grouped-map). The aggregation itself is deliberately expressible
    in SQL so the oracle can verify the UDF path end-to-end — the
    point is the plumbing (group shuffle → Arrow batch per group →
    pandas function → typed result), which is what a genuinely
    non-SQL per-group algorithm (fitting, resampling) would ride."""
    import pandas as pd

    ev = events_table(spark, sf_dir)

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "sum_cents": [int((pdf["value"] * 100).round().astype("int64").sum())],
                "n_types": [pdf["event_type"].nunique()],
            }
        )

    return ev.select("user_id", "value", "event_type").groupBy("user_id").applyInPandas(
        per_user, schema="user_id long, n_events long, sum_cents long, n_types long"
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: JSON path extraction from the events
    props column, with the extracted value usable in predicates
    (pushed as far as the JSON parse allows)."""
    ev = events_table(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", "event_type", k.alias("k_val")).filter(
        F.col("k_val") > 50
    )
