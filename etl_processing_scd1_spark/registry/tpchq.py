"""The remaining TPC-H query shapes (Q4, Q6, Q7, Q8, Q9, Q10, Q11,
Q12, Q13, Q16, Q19), completing the 22-shape suite.

Q1/Q2/Q3/Q5/Q14/Q15/Q17/Q18/Q20/Q21/Q22 already live in
``core.py`` / ``analyticsq.py`` / ``advancedq.py``; this module adds
the eleven shapes the registry still lacked. The testdata schema has
no ``partsupp`` table and drops several TPC-H columns
(``l_shipmode``, ``l_commitdate``, ``l_receiptdate``,
``p_container``, comment columns), so each query keeps the
REFERENCE SHAPE — the join topology, subquery kind, and aggregate
structure that make the query a meaningful engine test — while
substituting available columns for the missing ones (each docstring
says how). Numeric determinism follows the playbook: money sums as
scaled BIGINTs (cents / 10⁻⁴-dollar units), shares as a SINGLE
division of two exact longs, years as BIGINT on both engines, DuckDB
SUM(BIGINT) re-CAST to BIGINT so HUGEINT never reaches the driver's
canonicalizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._base import make_registry, table

QUERIES, ORACLES, register = make_registry()


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


# Exact 10⁻⁴-dollar revenue units: price-cents × (100 − discount-%).
def _rev_c4():
    return F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount")))


REV_C4_SQL = (
    "SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))"
)


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi join with a non-equi leg)
# ---------------------------------------------------------------------------


Q4_ORACLE = """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
"""


@register("analytic_q4_priority_late_ship", oracle=Q4_ORACLE)
def analytic_q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape (order-priority checking): a date-windowed
    orders scan restricted by an EXISTS over lineitem whose predicate
    correlates BOTH tables (the reference's ``l_commitdate <
    l_receiptdate`` late-line test becomes ``l_shipdate >
    o_orderdate + 60 days`` — this schema has no commit/receipt
    dates, but the engine shape is identical: a left-semi hash join
    on ``l_orderkey = o_orderkey`` whose non-equi leg evaluates as a
    post-join filter inside the same hash-join operator, never a
    nested loop). The date window prunes orders before the join;
    lineitem ships only its two join columns (column pruning to the
    scan)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (l["l_orderkey"] == o["o_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-side predicate aggregation)
# ---------------------------------------------------------------------------


Q6_ORACLE = """
    SELECT CAST(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
"""


@register("analytic_q6_forecast_revenue", oracle=Q6_ORACLE)
def analytic_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    scan-dominated query — every predicate lives on one table, so the
    whole WHERE pushes into the parquet scan (shipdate range +
    quantity reach ``PushedFilters``; the discount band compares the
    INTEGER percent on both engines, sidestepping the classic
    ``between 0.05 and 0.07`` double-literal trap where 0.07 has no
    exact binary representation). Revenue here is price × discount
    (the discount given), summed in exact 10⁻⁴ units. One global
    aggregate row, map-side partials, a 1-row final exchange."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 24)
    )
    dc = _cents("l_discount")
    return (
        l.filter((dc >= 5) & (dc <= 7))
        .agg(
            F.sum(_cents("l_extendedprice") * dc).alias("__rev_c4__"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .select(
            (F.col("__rev_c4__").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_items",
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (symmetric pair disjunction)
# ---------------------------------------------------------------------------


Q7_ORACLE = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST({rev} AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
        OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY sn.n_name, cn.n_name, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
""".format(rev=REV_C4_SQL)


@register("analytic_q7_volume_shipping", oracle=Q7_ORACLE)
def analytic_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): trade volume between two specific
    nations by year, with the symmetric pair disjunction ``(s=A ∧
    c=B) ∨ (s=B ∧ c=A)``. Scale plan: supplier and customer are
    pre-restricted to the TWO nations before touching a fact table
    (a 2-value IN semi-restricts both dims → both broadcast), so
    the orders⋈lineitem volume that survives is the ~2/25 slice in
    either trade direction; the pair disjunction then filters
    broadcast-joined name columns — no second pass over the facts.
    The year is a BIGINT on both engines (Spark ``year()`` is INT —
    cast explicitly; DuckDB EXTRACT is already BIGINT)."""
    pair = ("NATION_3", "NATION_7")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = F.broadcast(
        table(spark, sf_dir, "supplier")
        .join(
            n.select(F.col("n_nationkey").alias("__snk__"), F.col("n_name").alias("supp_nation")),
            F.col("s_nationkey") == F.col("__snk__"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = F.broadcast(
        table(spark, sf_dir, "customer")
        .join(
            n.select(F.col("n_nationkey").alias("__cnk__"), F.col("n_name").alias("cust_nation")),
            F.col("c_nationkey") == F.col("__cnk__"),
        )
        .select("c_custkey", "cust_nation")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    a, b = pair
    return (
        l.join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            _rev_c4().alias("__rev_c4__"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            (F.col("__rev_c4__").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_items",
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (conditional-sum share of a grouped total)
# ---------------------------------------------------------------------------


Q8_ORACLE = """
    WITH flat AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol_c4,
             s.s_nationkey
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      JOIN part p     ON l.l_partkey  = p.p_partkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN s_nationkey = 3 THEN vol_c4 ELSE 0 END) AS BIGINT)
             AS nation_vol_c4,
           CAST(SUM(vol_c4) AS BIGINT) AS total_vol_c4,
           CAST(CAST(SUM(CASE WHEN s_nationkey = 3 THEN vol_c4 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(vol_c4) AS BIGINT) AS DOUBLE) AS mkt_share
    FROM flat
    GROUP BY o_year
"""


@register("analytic_q8_market_share", oracle=Q8_ORACLE)
def analytic_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of ASIA's
    PROMO-part order volume by year. The classic trap is computing
    ``sum(case)/sum(all)`` over doubles — order-dependent; here BOTH
    sums are exact 10⁻⁴-unit longs and the share is ONE IEEE division
    of the two (bit-identical on both engines). Scale plan: region
    and part-type filters semi-restrict customer and part before the
    fact joins; all five dims broadcast; the fact chain shuffles only
    on its own join keys, then one grouped aggregate on year."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select("n_nationkey")
    )
    c = F.broadcast(
        table(spark, sf_dir, "customer")
        .join(asia, F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("c_custkey")
    )
    p = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = F.broadcast(table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    vol = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    flat = (
        l.join(p, l["l_partkey"] == p["p_partkey"], "left_semi")
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"], "left_semi")
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("__vol__"),
            "s_nationkey",
        )
    )
    agg = flat.groupBy("o_year").agg(
        F.sum(F.when(F.col("s_nationkey") == 3, F.col("__vol__")).otherwise(F.lit(0))).alias(
            "nation_vol_c4"
        ),
        F.sum("__vol__").alias("total_vol_c4"),
    )
    return agg.select(
        "o_year",
        "nation_vol_c4",
        "total_vol_c4",
        (F.col("nation_vol_c4").cast("double") / F.col("total_vol_c4").cast("double")).alias(
            "mkt_share"
        ),
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit (LIKE-restricted 5-way join, signed profit sum)
# ---------------------------------------------------------------------------


Q9_ORACLE = """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                         - CAST(round(p.p_retailprice * 100) AS BIGINT)
                           * CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 10000.0 AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
"""


@register("analytic_q9_product_profit", oracle=Q9_ORACLE)
def analytic_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit): profit on '%red%'-named parts
    by supplier nation and order year. This schema has no
    ``partsupp.ps_supplycost``, so cost is ``p_retailprice ×
    quantity`` — the SIGNED profit expression (revenue − cost,
    routinely negative) and the mid-string LIKE (cannot push as a
    prefix — evaluates post-scan, restricting part before broadcast)
    are the shape under test. Both terms share the 10⁻⁴ unit so the
    subtraction is exact in int64; per-row magnitude ~1e9 leaves
    headroom to ~1e9 matched rows per (nation, year) group."""
    p = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = F.broadcast(table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = table(spark, sf_dir, "lineitem")
    profit = _cents("l_extendedprice") * (100 - _cents("l_discount")) - _cents(
        "p_retailprice"
    ) * _cents("l_quantity")
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).alias("__profit_c4__"))
        .select(
            "nation",
            "o_year",
            (F.col("__profit_c4__").cast("double") / F.lit(10000.0)).alias("profit"),
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned item reporting (grouped top-k with carried dim columns)
# ---------------------------------------------------------------------------


Q10_ORACLE = """
    SELECT c.c_custkey, c.c_name,
           CAST(CAST({rev} AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
""".format(rev=REV_C4_SQL)


@register("analytic_q10_returned_items", oracle=Q10_ORACLE)
def analytic_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): top-20 customers by
    revenue lost to returns in a quarter, carrying non-key dim
    columns (name, balance, nation) through the aggregate. The
    carried columns ride INSIDE the groupBy key (functionally
    dependent on c_custkey, so group counts are unchanged) rather
    than re-joining after the top-k — one shuffle, and the final
    ORDER BY runs TakeOrderedAndProject (per-partition heaps, no
    global sort). The returnflag filter pushes to the lineitem scan;
    c_custkey breaks revenue ties deterministically."""
    c = F.broadcast(
        table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_acctbal", "c_nationkey"
        )
    )
    n = F.broadcast(table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_c4().alias("__rev_c4__"))
        .select(
            "c_custkey",
            "c_name",
            (F.col("__rev_c4__").cast("double") / F.lit(10000.0)).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 — important inventory (HAVING against a global scalar subquery)
# ---------------------------------------------------------------------------


Q11_ORACLE = """
    WITH v AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey = 3
      GROUP BY l.l_partkey
    ),
    t AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents,
                 CAST(count(*) AS BIGINT) AS n_parts
          FROM v)
    SELECT v.l_partkey, v.value_cents
    FROM v, t
    WHERE v.value_cents * t.n_parts > t.total_cents * 3
"""


@register("analytic_q11_important_inventory", oracle=Q11_ORACLE)
def analytic_q11_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's shape (important stock): per-part value for one
    nation's suppliers, kept only where the part exceeds a MULTIPLE
    of the nation-wide mean part value — the
    HAVING-against-a-global-scalar subquery. No ``partsupp`` here, so
    value is shipped lineitem price for nation-3 suppliers; the
    mean-relative threshold (> 3× mean) is scale-free, unlike Q11's
    literal fraction-of-total, which stops selecting anything as the
    part count grows (0 rows at sf0.1 — a trivial hash match, not
    evidence). The scalar decorrelates into a 1-row (sum, count)
    aggregate over the SAME grouped relation cross-joined back as a
    broadcast; the threshold is the integer cross-multiplication
    ``value × n_parts > total × 3`` — no division anywhere."""
    s = F.broadcast(
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 3)
        .select("s_suppkey")
    )
    l = table(spark, sf_dir, "lineitem")
    v = (
        l.join(s, l["l_suppkey"] == s["s_suppkey"], "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("value_cents"))
    )
    t = v.agg(
        F.sum("value_cents").alias("__total__"),
        F.count(F.lit(1)).alias("__n_parts__"),
    )
    return (
        v.join(F.broadcast(t))
        .filter(F.col("value_cents") * F.col("__n_parts__") > F.col("__total__") * 3)
        .select("l_partkey", "value_cents")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping delay vs priority (CASE-sum pivot over a derived bucket)
# ---------------------------------------------------------------------------


Q12_ORACLE = """
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
"""


@register("analytic_q12_ship_delay_priority", oracle=Q12_ORACLE)
def analytic_q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority): the CASE-sum
    pivot — high- vs low-priority line counts per shipping class.
    This schema has no ``l_shipmode``/``l_receiptdate``, so the class
    is DERIVED: lines shipped >90 days after the order date are
    'SLOW', the rest 'FAST' (``datediff`` on both engines; the
    testdata timestamps are midnight-aligned, so day arithmetic is
    exact). The shape under test is grouping on a computed column
    while the measures are conditional sums over a joined column —
    one fact shuffle on ``l_orderkey``, counts as exact longs."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.when(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, "SLOW")
            .otherwise("FAST")
            .alias("ship_bucket")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer distribution (outer join with an ON-clause filter)
# ---------------------------------------------------------------------------


Q13_ORACLE = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
"""


@register("analytic_q13_customer_distribution", oracle=Q13_ORACLE)
def analytic_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): the histogram of customers
    by order count, where the exclusion filter lives in the OUTER
    join's ON clause — a customer whose every order is excluded must
    still appear with count 0, which a WHERE clause would destroy
    (the classic outer-join-filter-placement bug; the reference's
    ``o_comment NOT LIKE`` becomes a priority exclusion on this
    schema). ``count(o_orderkey)`` counts non-null matches only.
    Since the filter touches only the right side, it pre-filters
    orders BEFORE the join (same semantics, smaller build side);
    double groupBy: first on custkey, then a near-trivial shuffle on
    the ~50-value count."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier relationship (count-distinct behind a NOT IN exclusion)
# ---------------------------------------------------------------------------


Q16_ORACLE = """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#12'
      AND p.p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("analytic_q16_supplier_relationship", oracle=Q16_ORACLE)
def analytic_q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier
    counts per (brand, type, size) behind a NOT IN exclusion — the
    anti-join over a subquery of flagged suppliers (negative account
    balance standing in for the reference's complaint-comment scan;
    no ``partsupp``, so part-supplier pairs come from lineitem).
    ``s_suppkey`` is non-null so NOT IN ≡ left-anti (the NULL
    poison case doesn't arise — documented, not assumed silently).
    The brand/size filters broadcast-restrict part; count(DISTINCT)
    plans as the two-phase partial-distinct aggregate, never a
    driver-side distinct."""
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#12")
            & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(bad), l["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunction of multi-column conjuncts)
# ---------------------------------------------------------------------------


Q19_ORACLE = """
    SELECT CAST(CAST({rev} AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
""".format(rev=REV_C4_SQL)


@register("analytic_q19_disjunctive_revenue", oracle=Q19_ORACLE)
def analytic_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the OR-of-conjuncts join
    predicate, where each disjunct constrains BOTH sides (brand/size
    on part, quantity on lineitem). The optimizer-relevant move —
    which Catalyst performs via constraint propagation, and we state
    explicitly for plan stability — is factoring the per-side hulls
    out of the disjunction: part prunes to the three brands with
    their max sizes, lineitem to quantity ∈ [1, 30], BEFORE the join;
    the full disjunction then evaluates on the joined row. The part
    side broadcasts; quantity bounds compare integer-valued doubles
    against integer literals (no arithmetic — exact on both
    engines)."""
    p = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(
            ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5)))
            | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)))
            | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15)))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    q = F.col("l_quantity")
    disj = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5)) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15)) & q.between(20, 30))
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .filter(disj)
        .agg(
            _rev_c4().alias("__rev_c4__"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .select(
            (F.col("__rev_c4__").cast("double") / F.lit(10000.0)).alias("revenue"),
            "n_items",
        )
    )
