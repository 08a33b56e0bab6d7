"""Core relational operator queries (SURVEY.md §2.A-§2.F, §2.H).

Every query exercises one operator row from the survey against the
driver's TPC-H-ish testdata, with a DuckDB oracle producing the same
result. Computed columns are aliased identically on both sides (the
driver's hash compares by sorted column name). Determinism rules:
no ``now()`` (literals instead), explicit tiebreaks under every
window/limit, decimal casts before aggregation so sums are exact and
order-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..functions import (
    comma_decimal,
    excel_serial_to_date,
    filename_business_date,
    hours_between,
    normalize_card_num,
    trim_key,
)
from ..schemas import align_positional
from ._base import events_table, make_registry, table

QUERIES, ORACLES, register = make_registry()

AUDIT_TS = "2026-01-01 00:00:00"


# --------------------------------------------------------------------------
# §2.A scans / sources
# --------------------------------------------------------------------------

@register(
    "parquet_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_returnflag = 'R'
    """,
)
def parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: columnar scan with predicate pushdown + column pruning —
    the filter and the 4-column ReadSchema reach the parquet reader
    (verified via explain in tests)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@register(
    "csv_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) || '.5' AS DOUBLE) AS amt,
           l_returnflag
    FROM lineitem
    """,
)
def csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + D11: semicolon-separated CSV with comma-decimal amounts
    (the reference's transactions_*.txt format, main.py:116), written
    then re-read through the engine's CSV path. The comma-decimal
    parse is a codegen'd regexp_replace+cast, not a UDF.

    Output amt is DOUBLE: the engine parses into DECIMAL(18,5)
    internally (comma_decimal), but final results avoid DECIMAL —
    the driver's value canonicalization renders Spark and DuckDB
    decimals differently (round-1 hash divergence), while x.5 values
    are exact in binary either way."""
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        f"csv_scan_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    src = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.concat(
            F.col("l_quantity").cast("int").cast("string"), F.lit(",5")
        ).alias("amt"),
        "l_returnflag",
    )
    src.write.mode("overwrite").option("sep", ";").option("header", True).csv(scratch)
    raw = spark.read.csv(
        scratch,
        sep=";",
        header=True,
        schema="l_orderkey bigint, l_linenumber int, amt string, l_returnflag string",
    )
    return raw.select(
        "l_orderkey",
        "l_linenumber",
        comma_decimal("amt").cast("double").alias("amt"),
        "l_returnflag",
    )


@register(
    "excel_serial_dates",
    oracle="""
    SELECT event_id,
           date_diff('day', DATE '1899-12-30', CAST(ts AS DATE)) AS excel_serial,
           DATE '1899-12-30' + CAST(date_diff('day', DATE '1899-12-30', CAST(ts AS DATE)) AS INTEGER) AS decoded_date
    FROM events
    """,
)
def excel_serial_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + D12: Excel serial-day round trip (epoch 1899-12-30;
    serial 44256 = 2021-03-01 verified against the reference's real
    blacklist files)."""
    ev = events_table(spark, sf_dir)
    serial = F.datediff(F.col("ts").cast("date"), F.lit("1899-12-30").cast("date"))
    return ev.select(
        "event_id",
        serial.alias("excel_serial"),
        excel_serial_to_date(serial).alias("decoded_date"),
    )


@register("full_table_extract", oracle="SELECT * FROM customer")
def full_table_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: full-table extract (the reference's nightly
    ``SELECT * FROM info.clients``, main.py:76-85; JDBC partitioned
    variant in sources.read_jdbc_table)."""
    return table(spark, sf_dir, "customer")


@register(
    "filename_date_extract",
    oracle="""
    SELECT event_id,
           'transactions_' || strftime(ts, '%d%m%Y') || '.txt' AS file_name,
           CAST(strptime(strftime(ts, '%d%m%Y'), '%d%m%Y') AS DATE) AS business_date
    FROM events
    """,
)
def filename_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 + D10: ddMMyyyy business-date parse from drop-dir file
    names (main.py:110-111); at scan time this pairs with
    ``input_file_name()``."""
    ev = events_table(spark, sf_dir)
    fname = F.concat(
        F.lit("transactions_"), F.date_format("ts", "ddMMyyyy"), F.lit(".txt")
    )
    return ev.select(
        "event_id",
        fname.alias("file_name"),
        filename_business_date(fname).alias("business_date"),
    )


# --------------------------------------------------------------------------
# §2.B projections / filters
# --------------------------------------------------------------------------

@register(
    "project_rename",
    oracle="""
    SELECT r_regionkey AS region_id, r_name AS region_name FROM region
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: positional rename-and-reorder (the reference's
    ``df.columns = catalog_cols``, main.py:61-62) via align_positional."""
    return align_positional(
        table(spark, sf_dir, "region"), ["region_id", "region_name"]
    )


@register(
    "add_audit_columns",
    oracle=f"""
    SELECT o_orderkey, o_orderdate AS create_dt,
           CAST(NULL AS TIMESTAMP) AS update_dt,
           TIMESTAMP '{AUDIT_TS}' AS processed_dt
    FROM orders
    """,
)
def add_audit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: audit-column stamping (main.py:88-90,121-125) with a
    run-literal processed_dt — deterministic now() per SURVEY §4.3."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").alias("create_dt"),
        F.lit(None).cast("timestamp").alias("update_dt"),
        F.lit(AUDIT_TS).cast("timestamp").alias("processed_dt"),
    )


@register(
    "project_drop",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
    """,
)
def project_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: drop technical/unneeded columns (main.py:140-144); Catalyst
    prunes the dropped columns out of the scan."""
    return table(spark, sf_dir, "orders").drop("o_orderstatus", "o_orderpriority")


@register(
    "nullsafe_diff",
    oracle="""
    WITH stg AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
             CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
      FROM customer
    )
    SELECT d.c_custkey,
           (s.c_acctbal IS DISTINCT FROM d.c_acctbal) AS acctbal_differs,
           (s.c_mktsegment IS DISTINCT FROM d.c_mktsegment) AS segment_differs
    FROM customer d JOIN stg s USING (c_custkey)
    WHERE s.c_acctbal IS DISTINCT FROM d.c_acctbal
       OR s.c_mktsegment IS DISTINCT FROM d.c_mktsegment
    """,
)
def nullsafe_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: null-safe change predicate. The reference hand-expands
    ``a <> b OR (a IS NULL AND b IS NOT NULL) OR ...`` per column
    (main.py:201-209); here each clause is ``~eqNullSafe`` — including
    the value→NULL transition a naive ``!=`` silently drops."""
    cust = table(spark, sf_dir, "customer")
    stg = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    d, s = cust.alias("d"), stg.alias("s")
    acct = ~F.col("s.c_acctbal").eqNullSafe(F.col("d.c_acctbal"))
    seg = ~F.col("s.c_mktsegment").eqNullSafe(F.col("d.c_mktsegment"))
    return (
        d.join(s, "c_custkey")
        .withColumn("acctbal_differs", acct)
        .withColumn("segment_differs", seg)
        .filter(acct | seg)
        .select("c_custkey", "acctbal_differs", "segment_differs")
    )


@register(
    "theta_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount, l_tax
    FROM lineitem WHERE l_discount < l_tax
    """,
)
def theta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: column-vs-column theta predicate (the reference's
    ``valid_to < trans_date``, main.py:413,433)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") < F.col("l_tax"))
        .select("l_orderkey", "l_linenumber", "l_discount", "l_tax")
    )


@register(
    "semi_join_in",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
    )
    """,
)
def semi_join_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6/C8: IN-subquery as left-semi join (main.py:414,463-466).
    The subquery side is aggregated to keys then broadcast — the big
    side never shuffles."""
    cust = table(spark, sf_dir, "customer")
    keys = (
        table(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(F.broadcast(keys), "c_custkey", "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "anti_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 250000
    )
    """,
)
def anti_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: NOT EXISTS as left-anti join (main.py:354-357)."""
    cust = table(spark, sf_dir, "customer")
    keys = (
        table(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(F.broadcast(keys), "c_custkey", "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "like_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_name LIKE 'small%' OR p_type LIKE 'SMALL%'
    """,
)
def like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: LIKE pattern filter (the reference's staging-table
    discovery ``LIKE 'lapp_stg_%'``, main.py:36). Prefix patterns
    push down to the scan as StringStartsWith."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("small%") | F.col("p_type").like("SMALL%")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "project_reshape",
    oracle="""
    SELECT p_partkey AS part_id, p_name AS part_name, p_type AS part_type
    FROM part
    WHERE p_name LIKE 'small%' OR p_type LIKE 'SMALL%'
    """,
)
def project_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 + B3 + B8 in one reshape: positional rename-and-reorder
    (``df.columns = catalog_cols``, main.py:61-62, via
    align_positional), technical-column drop (main.py:140-144; the
    dropped columns are pruned out of the scan), and a LIKE prefix
    filter (``LIKE 'lapp_stg_%'`` staging discovery, main.py:36)
    that pushes down as StringStartsWith. Consolidates the round-1
    project_rename / project_drop / like_filter demos so all three
    §2.B rows sit inside the driver's 50-entry correctness window."""
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%") | F.col("p_type").like("SMALL%")
    )
    narrowed = p.select("p_partkey", "p_name", "p_type", "p_size").drop("p_size")
    return align_positional(narrowed, ["part_id", "part_name", "part_type"])


# --------------------------------------------------------------------------
# §2.C joins
# --------------------------------------------------------------------------

@register(
    "star_join_chain",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, c.c_name, n.n_name, r.r_name
    FROM lineitem l
    LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE l.l_shipdate >= TIMESTAMP '2001-01-01'
    """,
)
def star_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: multi-way left-join denormalization (the fraud queries'
    fact→cards→accounts→clients chain, main.py:405-411). Dims are
    broadcast: the fact is joined with zero shuffles."""
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    o = table(spark, sf_dir, "orders")
    c = F.broadcast(table(spark, sf_dir, "customer"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"], "left")
        .join(c, o["o_custkey"] == c["c_custkey"], "left")
        .join(n, c["c_nationkey"] == n["n_nationkey"], "left")
        .join(r, n["n_regionkey"] == r["r_regionkey"], "left")
        .select("l_orderkey", "l_linenumber", "o_orderdate", "c_name", "n_name", "r_name")
    )


@register(
    "expr_key_join_trim",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM (SELECT o_orderkey, rpad(CAST(o_custkey AS VARCHAR), 12, ' ') AS cust_key_padded
          FROM orders) o
    JOIN customer c ON trim(o.cust_key_padded) = CAST(c.c_custkey AS VARCHAR)
    """,
)
def expr_key_join_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6/D4: join on trimmed keys — BPCHAR blank-pad normalization
    (``ON trim(ft.card_num) = trim(dca.card_num)``, main.py:407)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.rpad(F.col("o_custkey").cast("string"), 12, " ").alias("cust_key_padded"),
    )
    c = table(spark, sf_dir, "customer")
    return o.join(
        F.broadcast(c), trim_key(o["cust_key_padded"]) == c["c_custkey"].cast("string")
    ).select("o_orderkey", "c_name")


@register(
    "expr_key_join_replace",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM (SELECT o_orderkey, CAST(o_custkey AS VARCHAR) || ' x' AS spaced_key
          FROM orders) o
    JOIN customer c
      ON replace(o.spaced_key, ' ', '') = CAST(c.c_custkey AS VARCHAR) || 'x'
    """,
)
def expr_key_join_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7/D5: join on space-stripped keys (card numbers with internal
    spaces: ``replace(card_num,' ','')``, main.py:458). translate()
    avoids the regex engine on the hot path."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat(F.col("o_custkey").cast("string"), F.lit(" x")).alias("spaced_key"),
    )
    c = table(spark, sf_dir, "customer")
    return o.join(
        F.broadcast(c),
        normalize_card_num(o["spaced_key"])
        == F.concat(c["c_custkey"].cast("string"), F.lit("x")),
    ).select("o_orderkey", "c_name")


@register(
    "expr_key_join",
    oracle="""
    SELECT o.o_orderkey, ct.c_name AS trim_name, cr.c_name AS replace_name
    FROM (SELECT o_orderkey,
                 rpad(CAST(o_custkey AS VARCHAR), 12, ' ') AS cust_key_padded,
                 CAST(o_custkey AS VARCHAR) || ' x' AS spaced_key
          FROM orders) o
    JOIN customer ct ON trim(o.cust_key_padded) = CAST(ct.c_custkey AS VARCHAR)
    JOIN customer cr
      ON replace(o.spaced_key, ' ', '') = CAST(cr.c_custkey AS VARCHAR) || 'x'
    """,
)
def expr_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 + C7 (D4 + D5) in one chain: the same orders frame joins
    customer twice — once on trim()'d BPCHAR-padded keys
    (``ON trim(ft.card_num) = trim(dca.card_num)``, main.py:407),
    once on space-stripped keys (``replace(card_num,' ','')``,
    main.py:458; translate() — no regex engine on the hot path).
    Both dims broadcast; expression keys never force a fact shuffle.
    Consolidates the round-1 expr_key_join_trim / _replace demos."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.rpad(F.col("o_custkey").cast("string"), 12, " ").alias("cust_key_padded"),
        F.concat(F.col("o_custkey").cast("string"), F.lit(" x")).alias("spaced_key"),
    )
    ct = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ct_key"), F.col("c_name").alias("trim_name")
    )
    cr = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cr_key"), F.col("c_name").alias("replace_name")
    )
    return (
        o.join(F.broadcast(ct), trim_key(o["cust_key_padded"]) == F.col("ct_key").cast("string"))
        .join(
            F.broadcast(cr),
            normalize_card_num(o["spaced_key"])
            == F.concat(F.col("cr_key").cast("string"), F.lit("x")),
        )
        .select("o_orderkey", "trim_name", "replace_name")
    )


# --------------------------------------------------------------------------
# §2.E windows
# --------------------------------------------------------------------------

@register(
    "window_lag_prev",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
    FROM events
    """,
)
def window_lag_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: lag() — the reference's single window primitive
    (``lag(terminal_city) OVER (PARTITION BY card ORDER BY
    trans_date)``, main.py:440-441). event_id tiebreak keeps the
    frame deterministic under equal timestamps."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events_table(spark, sf_dir).select(
        "event_id", "user_id", "ts", "value", F.lag("value").over(w).alias("prev_value")
    )


@register(
    "velocity_fraud_rule",
    oracle="""
    WITH pre AS (
      SELECT event_id, user_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             lag(ts)         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, ts, event_type, prev_type, prev_ts
    FROM pre
    WHERE prev_type IS NOT NULL
      AND event_type <> prev_type
      AND (epoch(date_trunc('second', ts)) - epoch(date_trunc('second', prev_ts))) / 3600.0 < 1.0
    """,
)
def velocity_fraud_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/H3 analog on the events stream: state change (city proxy =
    event_type) within one hour per user (main.py:437-467; verified 6
    events on the reference's own data). One shuffle — the window
    partition by user. The output carries the lag()'d prev_ts, so
    this query is also the driver-checked evidence for E1 (the
    reference's lone window primitive, main.py:440-441) — both lag
    columns ride the SAME window partitioning, one sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pre = events_table(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return pre.filter(
        F.col("prev_type").isNotNull()
        & (F.col("event_type") != F.col("prev_type"))
        & (hours_between("ts", "prev_ts") < F.lit(1.0))
    ).select("event_id", "user_id", "ts", "event_type", "prev_type", "prev_ts")


# --------------------------------------------------------------------------
# §2.F aggregations + general relational surface
# --------------------------------------------------------------------------

@register(
    "window_rank_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           lead(o_orderkey) OVER w AS next_orderkey,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General window surface beyond the reference's lone lag() (E1):
    rank, dense_rank, lead, ntile — all sharing ONE window
    partitioning, so the whole set costs a single shuffle+sort."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "watermark_max",
    oracle="""
    SELECT coalesce(
             max(CASE WHEN o_orderstatus = 'F' THEN o_orderdate END),
             max(o_orderdate)
           ) AS max_update_dt
    FROM orders
    """,
)
def watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/D1: the reference's only aggregate —
    ``coalesce(max(update_dt), max(create_dt))`` high-watermark
    (main.py:362-364). Partial aggregation makes this one tiny
    shuffle of per-partition maxima at any scale."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.coalesce(
            F.max(F.when(F.col("o_orderstatus") == "F", F.col("o_orderdate"))),
            F.max("o_orderdate"),
        ).alias("max_update_dt")
    )


@register(
    "groupby_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.F general surface: grouped aggregation (TPC-H Q1 shape).

    Exactness + speed: monetary values are aggregated as scaled
    INTEGERS (cents / 10⁻⁴ units) — order-independent like decimal
    sums, so a distributed aggregation hash-matches a single-threaded
    oracle, but ~2× faster (long adds instead of BigDecimal ops in
    the hot partial-agg loop). Final outputs are DOUBLE computed as
    exact-long ÷ power-of-ten — bit-identical on both engines (the
    long is < 2^53 and the divisor is exactly representable), and
    free of the DECIMAL canonicalization divergence the driver's
    round-1 hash gate exposed."""
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    agg = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(cents("l_quantity")).alias("__qty_c__"),
        F.sum(cents("l_extendedprice")).alias("__price_c__"),
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias("__disc_c4__"),
        F.count(F.lit(1)).alias("count_order"),
    )

    def to_dbl(col: str, divisor: float):
        return F.col(col).cast("double") / F.lit(divisor)

    return agg.select(
        "l_returnflag",
        "l_linestatus",
        to_dbl("__qty_c__", 100.0).alias("sum_qty"),
        to_dbl("__price_c__", 100.0).alias("sum_base_price"),
        to_dbl("__disc_c4__", 10000.0).alias("sum_disc_price"),
        "count_order",
    )


@register(
    "orderby_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.F general surface: global top-k. Spark plans this as
    TakeOrderedAndProject — per-partition heaps, no full sort, no
    full shuffle; the o_orderkey tiebreak makes the cut deterministic."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "set_ops",
    oracle="""
    WITH urgent AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    negbal AS (
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    )
    SELECT 'both' AS tag, custkey FROM (SELECT custkey FROM urgent INTERSECT SELECT custkey FROM negbal)
    UNION ALL
    SELECT 'only_urgent' AS tag, custkey FROM (SELECT custkey FROM urgent EXCEPT SELECT custkey FROM negbal)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.F general surface: INTERSECT / EXCEPT / UNION ALL."""
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    negbal = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    both = urgent.intersect(negbal).select(F.lit("both").alias("tag"), "custkey")
    only = urgent.exceptAll(negbal.intersect(urgent)).select(
        F.lit("only_urgent").alias("tag"), "custkey"
    )
    return both.unionByName(only)


@register(
    "analytic_top_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS DOUBLE)
             / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def analytic_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → star join → grouped
    revenue → top-10. Broadcast customer filter reaches the orders
    join; revenue aggregated as exact 10⁻⁴-unit integers, emitted as
    DOUBLE (order-independent, oracle-exact, no DECIMAL in output)."""
    c = F.broadcast(
        table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    cents = lambda col: F.round(F.col(col) * 100).cast("long")  # noqa: E731
    rev_c4 = F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_c4.alias("__rev_c4__"))
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            (F.col("__rev_c4__").cast("double") / F.lit(10000.0)).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "analytic_regional_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS DOUBLE)
             / 10000.0 AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def analytic_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: region-local supplier revenue — five-way join
    with a same-nation equi-constraint, exact integer revenue units
    emitted as DOUBLE.

    Scale plan (the standard Q5 strategy): the region filter is
    applied FIRST — nation⋈region('ASIA') yields the ~5-row ASIA
    nation-key set, and customer and supplier are pre-filtered on it
    BEFORE any fact-table join. The orders⋈lineitem volume that
    survives is ~1/5 of the unfiltered chain the round-1 plan built
    (the filter formerly entered last). All dims broadcast; the fact
    tables never shuffle for a dim join."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select("n_nationkey", "n_name")
    )
    c = F.broadcast(
        table(spark, sf_dir, "customer")
        .join(asia_nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    s = F.broadcast(
        table(spark, sf_dir, "supplier")
        .join(
            asia_nations.select("n_nationkey"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_nationkey")
    )
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    cents = lambda col: F.round(F.col(col) * 100).cast("long")  # noqa: E731
    joined = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(s, (l["l_suppkey"] == s["s_suppkey"]) & (s["s_nationkey"] == c["c_nationkey"]))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias("__rev__"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "n_name",
            (F.col("__rev__").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_items",
        )
    )


@register(
    "full_outer_join",
    oracle="""
    WITH fast AS (
      SELECT o_custkey AS custkey, count(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    ),
    slow AS (
      SELECT o_custkey AS custkey, count(*) AS n_low
      FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey
    )
    SELECT coalesce(f.custkey, s.custkey) AS custkey, f.n_urgent, s.n_low
    FROM fast f FULL OUTER JOIN slow s ON f.custkey = s.custkey
    """,
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General join surface: FULL OUTER — the primitive the SCD1
    merge rides internally (one full-outer pass classifies all four
    legs, operators/scd1.py); exposed here as a standalone query."""
    o = table(spark, sf_dir, "orders")
    fast = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_urgent"))
        .alias("f")
    )
    slow = (
        o.filter(F.col("o_orderpriority") == "5-LOW")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_low"))
        .alias("s")
    )
    return fast.join(slow, F.col("f.custkey") == F.col("s.custkey"), "full_outer").select(
        F.coalesce(F.col("f.custkey"), F.col("s.custkey")).alias("custkey"),
        "n_urgent",
        "n_low",
    )


@register(
    "distinct_agg",
    oracle="""
    SELECT c_nationkey,
           count(DISTINCT c_mktsegment) AS n_segments,
           count(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General surface: exact COUNT(DISTINCT) — Spark expands to a
    two-phase aggregate (distinct keys first, then count) that stays
    fully distributed."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "having_filter",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) > 15
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General surface: HAVING — a post-aggregation filter, pushed
    nowhere (correctly) but evaluated on the reduced aggregate."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 15)
    )


@register(
    "distinct_agg_having",
    oracle="""
    SELECT c_nationkey,
           count(DISTINCT c_mktsegment) AS n_segments,
           count(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    HAVING count(*) > 30
    """,
)
def distinct_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General surface, two §2.F capabilities in one query: exact
    COUNT(DISTINCT) (Spark's two-phase expand-aggregate, fully
    distributed) filtered by HAVING on the reduced aggregate.
    Consolidates the round-1 distinct_agg / having_filter demos into
    one driver-window slot."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .filter(F.col("n_customers") > 30)
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General surface: ROLLUP grouping sets (subtotals + grand
    total, NULL-marked) — one pass, Catalyst expands the sets.
    sum_qty is exact-long cents ÷ 100 emitted as DOUBLE (DECIMAL
    outputs diverge in the driver's canonicalization)."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.round(F.col("l_quantity") * 100).cast("long")).cast("double")
                / F.lit(100.0)
            ).alias("sum_qty"),
        )
    )


@register(
    "asof_join",
    oracle="""
    WITH state AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           s.o_orderkey AS last_orderkey, s.o_totalprice AS last_totalprice
    FROM events e
    ASOF LEFT JOIN state s
      ON e.user_id = s.o_custkey AND s.o_orderdate <= CAST(e.ts AS TIMESTAMP)
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join — enrich each event with the latest
    order state at or before the event time. Implemented as the
    union-and-window formulation (operators.asof): ONE shuffle + sort
    over the combined stream, linear in history length — never the
    quadratic range-join expansion. Oracle: DuckDB's native ASOF JOIN.
    State pre-deduped per (key, ts) with an explicit max-orderkey
    policy so both engines agree on ties."""
    from ..operators.asof import asof_join

    ev = events_table(spark, sf_dir).select("event_id", "user_id", "ts")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    state = (
        table(spark, sf_dir, "orders")
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            "o_orderdate",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_totalprice").alias("last_totalprice"),
        )
    )
    return asof_join(
        ev,
        state,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["last_orderkey", "last_totalprice"],
    )


# --------------------------------------------------------------------------
# §2.H fraud-rule analogs on the testdata star schema
# --------------------------------------------------------------------------

@register(
    "fraud_blacklist_semi",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate AS event_dt,
           c.c_name || ' ' || c.c_mktsegment AS fio,
           '1' AS event_type,
           CAST(CAST(l.l_shipdate AS DATE) AS TIMESTAMP) AS report_dt
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def fraud_blacklist_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 analog: star join + blacklist semi-join membership (the
    *intended* rule-1 predicate — not the reference's ``1=1`` bug at
    main.py:412). Blacklist = negative-balance customers; projection
    mirrors the report shape (event_dt, fio via NULL-propagating
    concat D3, day-truncated report_dt D6)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = F.broadcast(table(spark, sf_dir, "customer"))
    blacklist = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    star = l.join(o, l["l_orderkey"] == o["o_orderkey"]).join(
        c, o["o_custkey"] == c["c_custkey"]
    )
    return star.join(F.broadcast(blacklist), "c_custkey", "left_semi").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").alias("event_dt"),
        F.concat(F.col("c_name"), F.lit(" "), F.col("c_mktsegment")).alias("fio"),
        F.lit("1").alias("event_type"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("report_dt"),
    )


@register(
    "fraud_report_as_written",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate AS event_dt,
           c.c_name || ' ' || c.c_mktsegment AS fio,
           '1' AS event_type,
           CAST(CAST(l.l_shipdate AS DATE) AS TIMESTAMP) AS report_dt
    FROM lineitem l
    LEFT JOIN orders o   ON l.l_orderkey = o.o_orderkey
                        AND o.o_orderdate < TIMESTAMP '1995-01-01'
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def fraud_report_as_written(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 bug-compat analog: the reference's ``WHERE 1=1 OR ...``
    (main.py:412-413) makes rule 1 vacuously true, so EVERY fact row
    reaches the report — including rows whose left joins matched no
    dimension (NULL fio here, via the D3 NULL-propagating concat).
    The order join is date-restricted so a real share of rows exercise
    the NULL-attribute path the bug exposes. Production uses the
    intended predicate (fraud_blacklist_semi); this query exists so a
    migrating user can replay the as-written behavior bit-exactly."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp")
    )
    c = F.broadcast(table(spark, sf_dir, "customer"))
    star = l.join(o, l["l_orderkey"] == o["o_orderkey"], "left").join(
        c, o["o_custkey"] == c["c_custkey"], "left"
    )
    return star.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").alias("event_dt"),
        F.concat(F.col("c_name"), F.lit(" "), F.col("c_mktsegment")).alias("fio"),
        F.lit("1").alias("event_type"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("report_dt"),
    )


@register(
    "fraud_expiry_theta",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate AS event_dt,
           c.c_name AS fio, '2' AS event_type
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    """,
)
def fraud_expiry_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 analog: star join + expiry theta predicate
    (``da.valid_to < trans_date``, main.py:433) — here 'shipped more
    than 90 days after the order' plays the expired-contract role."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = F.broadcast(table(spark, sf_dir, "customer"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").alias("event_dt"),
            F.col("c_name").alias("fio"),
            F.lit("2").alias("event_type"),
        )
    )
