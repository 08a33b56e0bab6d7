"""Advanced relational surface: interval join, skew-salted
aggregation, exact medians, JSON extraction — capabilities a
general-purpose engine needs beyond the reference's fixed DAG
(SURVEY.md §2.F note / §2.C 'not present in reference' list)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import attach_cache
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


@register(
    "gap_fill_interpolate",
    oracle="""
    WITH daily AS (
      SELECT o_custkey % 97 AS grp, CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2
    ),
    bounds AS (SELECT grp, min(day) AS lo, max(day) AS hi FROM daily GROUP BY grp),
    spine AS (
      SELECT grp, CAST(d AS DATE) AS day
      FROM bounds,
           unnest(range(CAST(lo AS TIMESTAMP),
                        CAST(hi AS TIMESTAMP) + INTERVAL 1 DAY,
                        INTERVAL 1 DAY)) AS t(d)
    ),
    joined AS (
      SELECT s.grp, s.day, d.rev_cents
      FROM spine s LEFT JOIN daily d ON s.grp = d.grp AND s.day = d.day
    ),
    ctx AS (
      SELECT grp, day, rev_cents,
             last_value(rev_cents IGNORE NULLS) OVER (
               PARTITION BY grp ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_rev,
             last_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY grp ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
             first_value(rev_cents IGNORE NULLS) OVER (
               PARTITION BY grp ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_rev,
             first_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY grp ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
      FROM joined
    )
    SELECT grp, day, prev_rev AS rev_locf_cents, rev_cents IS NULL AS is_gap,
           CASE
             WHEN rev_cents IS NOT NULL THEN CAST(rev_cents AS DOUBLE)
             WHEN next_rev IS NULL THEN CAST(prev_rev AS DOUBLE)
             ELSE CAST(prev_rev AS DOUBLE)
                  + (CAST(next_rev AS DOUBLE) - CAST(prev_rev AS DOUBLE))
                    * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                       / CAST(date_diff('day', prev_day, next_day) AS DOUBLE))
           END AS rev_interp
    FROM ctx
    """,
)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: per-group daily spine (sequence +
    explode between each group's min/max day), left join of observed
    daily revenue, then last-observation-carried-forward AND linear
    interpolation across gaps in one window pass (last/first with
    ignorenulls over unbounded frames — no self-joins, no UDFs).

    Scale: the spine explode is O(groups × days) rows, generated
    map-side from a tiny bounds aggregate; the fill is one window
    shuffle on grp. Interpolation arithmetic is derived from exact
    cent/day integers, so both engines produce bit-identical doubles.
    """
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        (F.col("o_custkey") % 97).alias("grp"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    bounds = daily.groupBy("grp").agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select("grp", F.explode(F.sequence("lo", "hi")).alias("day"))
    joined = spine.join(daily, ["grp", "day"], "left")

    back = Window.partitionBy("grp").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.partitionBy("grp").orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("rev_cents").isNotNull(), F.col("day"))
    ctx = (
        joined.withColumn("prev_rev", F.last("rev_cents", ignorenulls=True).over(back))
        .withColumn("prev_day", F.last(obs_day, ignorenulls=True).over(back))
        .withColumn("next_rev", F.first("rev_cents", ignorenulls=True).over(fwd))
        .withColumn("next_day", F.first(obs_day, ignorenulls=True).over(fwd))
    )
    frac = F.datediff(F.col("day"), F.col("prev_day")).cast("double") / F.datediff(
        F.col("next_day"), F.col("prev_day")
    ).cast("double")
    interp = (
        F.when(F.col("rev_cents").isNotNull(), F.col("rev_cents").cast("double"))
        .when(F.col("next_rev").isNull(), F.col("prev_rev").cast("double"))
        .otherwise(
            F.col("prev_rev").cast("double")
            + (F.col("next_rev").cast("double") - F.col("prev_rev").cast("double")) * frac
        )
    )
    return ctx.select(
        "grp",
        "day",
        F.col("prev_rev").alias("rev_locf_cents"),
        F.col("rev_cents").isNull().alias("is_gap"),
        interp.alias("rev_interp"),
    )


# --------------------------------------------------------------------------
# HyperLogLog cardinality sketch (register-based, mergeable)
# --------------------------------------------------------------------------
# One SQL template rendered into both engines. All arithmetic is
# engine-exact: register maxima are integer aggregates; the harmonic
# sum adds exact powers of two (1/2^M, M <= 40 — every partial sum
# fits the 52-bit mantissa, so addition order cannot matter); ln()
# appears only in the small-range correction and is quantized to
# 1e-9. Dialect differences are confined to hex->int (Spark conv vs
# DuckDB strpos polynomial), shiftleft syntax, and regexp group arg.

_HLL_M = 256
_HLL_ALPHA_M2 = repr((0.7213 / (1 + 1.079 / 256)) * 256.0 * 256.0)


def _hll_dialect(dialect: str) -> tuple[str, str, str, str]:
    """(bucket, shift, zeros, strtype) fragments per engine."""
    if dialect == "spark":
        return (
            "CAST(conv(substr(h, 1, 2), 16, 10) AS BIGINT)",
            "shiftleft(CAST(1 AS BIGINT), M)",
            "length(regexp_extract(substr(h, 3, 16), '^0*', 0))",
            "STRING",
        )
    d1 = "(strpos('0123456789abcdef', substr(h, 1, 1)) - 1)"
    d2 = "(strpos('0123456789abcdef', substr(h, 2, 1)) - 1)"
    return (
        f"CAST({d1} * 16 + {d2} AS BIGINT)",
        "(CAST(1 AS BIGINT) << M)",
        "length(regexp_extract(substr(h, 3, 16), '^0*'))",
        "VARCHAR",
    )


def _hll_sql(dialect: str) -> str:
    bucket, shift, zeros, strtype = _hll_dialect(dialect)
    raw = f"CAST({_HLL_ALPHA_M2} AS DOUBLE) / (CAST(256 - present AS DOUBLE) + s_present)"
    corrected = (
        f"CASE WHEN {raw} <= 640.0 AND present < 256 "
        "THEN 256.0 * (round(ln(256.0 / CAST(256 - present AS DOUBLE)) * 1000000000.0) "
        "/ 1000000000.0) "
        f"ELSE {raw} END"
    )
    return f"""
    WITH hashed AS (
      SELECT md5(CAST(o_custkey AS {strtype})) AS h FROM {{tbl}}
    ),
    parts AS (
      SELECT {bucket} AS bucket, {zeros} AS z,
             substr(h, 3 + {zeros}, 1) AS d
      FROM hashed
    ),
    rho AS (
      SELECT bucket,
             least(4 * z + CASE WHEN d = '1' THEN 3
                                WHEN d IN ('2', '3') THEN 2
                                WHEN d IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END + 1, 40) AS r
      FROM parts
    ),
    regs AS (SELECT bucket, max(r) AS M FROM rho GROUP BY bucket),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS present,
             SUM(1.0 / CAST({shift} AS DOUBLE)) AS s_present
      FROM regs
    ),
    exact AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact FROM {{tbl}})
    SELECT CAST(256 AS BIGINT) AS m,
           CAST(256 - present AS BIGINT) AS v_zero,
           n_exact,
           CAST(256 - present AS DOUBLE) + s_present AS harmonic_sum,
           {corrected} AS hll_estimate
    FROM folded, exact
    """


@register("hll_cardinality", oracle=_hll_sql("duck").format(tbl="orders"))
def hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register-based HyperLogLog (m=64) over orders.o_custkey — the
    MERGEABLE cardinality sketch (register merge = per-bucket max,
    which is exactly the map-side partial aggregate Spark plans for
    the groupBy), unlike the linear-counting bitmap of
    cardinality_sketch. Output carries the exact distinct count next
    to the estimate so accuracy is part of the checked contract.

    Scale: the corpus never shuffles — only 64 (bucket, max) cells
    reach the final stage from each partition; union of sketches
    across tables/days is the same max, making this the incremental
    distinct-count path at 100 TB."""
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__hll_orders__")
    return spark.sql(_hll_sql("spark").format(tbl="__hll_orders__"))


@register(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
           count(*) AS n_rows,
           CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General surface: CUBE grouping sets — all 2^k subtotal
    combinations in one pass (Catalyst expands the sets; partial
    aggregation applies per set). gid = GROUPING() bitmask
    disambiguates genuine NULL group values from subtotal markers,
    the standard trap ROLLUP/CUBE consumers hit."""
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            (
                F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")
            ).cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.round(F.col("l_quantity") * 100).cast("long")).cast("double")
                / F.lit(100.0)
            ).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")
    )


@register(
    "moving_window_agg",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey,
             CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders
    )
    SELECT o_custkey, o_orderkey, day_num, price_cents,
           CAST(CAST(sum(price_cents) OVER w3 AS BIGINT) AS DOUBLE)
             / CAST(count(*) OVER w3 AS DOUBLE) AS ma3,
           CAST(sum(price_cents) OVER cum AS BIGINT) AS cum_cents,
           CAST(sum(price_cents) OVER d30 AS BIGINT) AS sum30_cents
    FROM base
    WINDOW
      w3 AS (PARTITION BY o_custkey ORDER BY day_num, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      cum AS (PARTITION BY o_custkey ORDER BY day_num, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      d30 AS (PARTITION BY o_custkey ORDER BY day_num
              RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
)
def moving_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based window aggregates: 3-row moving average, running
    total, and a 30-day RANGE frame sum per customer — the sliding
    analytics surface beyond offset (lag) and ranking windows. ROWS
    frames are tie-broken by orderkey (deterministic under any
    partitioning); the RANGE frame orders by the bare numeric day so
    peer rows aggregate together, which is the frame's defined
    semantics. The moving average divides two exact BIGINTs. One
    shuffle on o_custkey serves all three frames."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    w3 = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    cum = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d30 = Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-29, 0)
    return base.select(
        "o_custkey",
        "o_orderkey",
        "day_num",
        "price_cents",
        (
            F.sum("price_cents").over(w3).cast("double")
            / F.count(F.lit(1)).over(w3).cast("double")
        ).alias("ma3"),
        F.sum("price_cents").over(cum).cast("long").alias("cum_cents"),
        F.sum("price_cents").over(d30).cast("long").alias("sum30_cents"),
    )


def _pagerank_oracle(iters: int = 3) -> str:
    """Unrolled-iteration SQL twin of the pagerank query. All rank
    arithmetic is BIGINT in nano-rank units (floor divisions), so
    each iteration is exactly reproducible on any engine."""
    blocks = ["""
    pairs AS (
      SELECT DISTINCT l.l_suppkey + 1000000 AS s_node, o.o_custkey AS c_node
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT s_node AS src, c_node AS dst FROM pairs
      UNION ALL
      SELECT c_node AS src, s_node AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST(1000000000 AS BIGINT) // n AS r FROM nodes, nn)"""]
    for t in range(iters):
        blocks.append(f"""
    s{t} AS (
      SELECT e.dst AS node, CAST(SUM(r.r // dg.d) AS BIGINT) AS m
      FROM edges e
      JOIN r{t} r ON r.node = e.src
      JOIN deg dg ON dg.src = e.src
      GROUP BY e.dst
    ),
    r{t + 1} AS (
      SELECT n0.node,
             (CAST(15 AS BIGINT) * 1000000000) // (100 * nn.n)
             + (CAST(85 AS BIGINT) * COALESCE(s.m, CAST(0 AS BIGINT))) // 100 AS r
      FROM nodes n0 CROSS JOIN nn LEFT JOIN s{t} s ON s.node = n0.node
    )""")
    return (
        "WITH " + ",".join(blocks)
        + f" SELECT node AS node_id, r AS rank_nanos FROM r{iters}"
    )


@register("pagerank", oracle=_pagerank_oracle())
def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the bipartite
    supplier↔customer trade graph (edges = distinct supplied-to
    pairs, both directions, so no node dangles). The second
    oracle-checked ITERATIVE algorithm after k-means: rank lives in
    BIGINT nano-units with floor-division shares, so distributed
    float-accumulation order cannot perturb it and the unrolled SQL
    twin matches bit-for-bit.

    Scale: one distinct + one groupBy(dst) shuffle per iteration over
    the edge list; ranks and degrees co-partition with edges on src.
    In production the edge frame is persisted across iterations and
    partitioned by src; the iteration count is a fixed parameter."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("l_suppkey") + 1000000).alias("src"),
            F.col("o_custkey").alias("dst"),
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))

    r = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr("CAST(1000000000 AS BIGINT) DIV n").alias("r")
    )
    for _ in range(3):
        contrib = (
            edges.join(r, edges["src"] == r["node"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r DIV d")).cast("long").alias("m"))
        )
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.expr(
                    "(CAST(15 AS BIGINT) * 1000000000) DIV (100 * n)"
                    " + (CAST(85 AS BIGINT) * COALESCE(m, CAST(0 AS BIGINT))) DIV 100"
                ).alias("r"),
            )
        )
    return r.select(F.col("node").alias("node_id"), F.col("r").alias("rank_nanos"))


def _cms_bucket_duck(i: int) -> str:
    """hex pair i of md5 -> 0..255 (DuckDB lacks conv())."""
    d1 = f"(strpos('0123456789abcdef', substr(h, {2 * i + 1}, 1)) - 1)"
    d2 = f"(strpos('0123456789abcdef', substr(h, {2 * i + 2}, 1)) - 1)"
    return f"CAST({d1} * 16 + {d2} AS BIGINT)"


_CMS_ORACLE = f"""
    WITH toks AS (
      SELECT t AS term FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
      WHERE t <> ''
    ),
    hashed AS (SELECT term, md5(term) AS h FROM toks),
    occ AS (
      {" UNION ALL ".join(f"SELECT {i} AS row_i, {_cms_bucket_duck(i)} AS b FROM hashed" for i in range(4))}
    ),
    cells AS (
      SELECT row_i, b, CAST(count(*) AS BIGINT) AS cnt
      FROM occ GROUP BY row_i, b
    ),
    vocab AS (
      SELECT term, md5(term) AS h, CAST(count(*) AS BIGINT) AS true_count
      FROM toks GROUP BY term
    ),
    cand AS (
      {" UNION ALL ".join(f"SELECT term, true_count, {i} AS row_i, {_cms_bucket_duck(i)} AS b FROM vocab" for i in range(4))}
    ),
    est AS (
      SELECT c.term, c.true_count, min(cl.cnt) AS est_count
      FROM cand c JOIN cells cl ON cl.row_i = c.row_i AND cl.b = c.b
      GROUP BY c.term, c.true_count
    )
    SELECT term, est_count, true_count, est_count - true_count AS over_count
    FROM est ORDER BY est_count DESC, term LIMIT 20
"""


@register("cms_heavy_hitters", oracle=_CMS_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 × width 256, hash rows = md5 hex
    pairs) over document tokens, reporting the top-20 heavy hitters
    by sketch estimate with the exact count alongside (CMS guarantees
    est ≥ true; over_count shows the collision inflation).

    Scale: the sketch is 1024 integer cells built by one partially-
    aggregated groupBy over the token stream (mergeable: cell-wise
    add), and the point-query join touches cells only for the
    candidate vocabulary — the raw corpus is never re-scanned per
    query. Top-k is a total order (est desc, term) so the LIMIT is
    deterministic."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("term")
        )
        .filter(F.col("term") != "")
    )

    def buckets(h):
        return F.array(
            *[
                F.conv(F.substring(h, 2 * i + 1, 2), 16, 10).cast("long")
                for i in range(4)
            ]
        )

    hashed = toks.withColumn("h", F.md5("term"))
    cells = (
        hashed.select(F.posexplode(buckets(F.col("h"))).alias("row_i", "b"))
        .groupBy("row_i", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("true_count"))
        .withColumn("h", F.md5("term"))
    )
    cand = vocab.select(
        "term",
        "true_count",
        F.posexplode(buckets(F.col("h"))).alias("row_i", "b"),
    )
    est = (
        cand.join(cells, ["row_i", "b"])
        .groupBy("term", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.select(
            "term",
            "est_count",
            "true_count",
            (F.col("est_count") - F.col("true_count")).alias("over_count"),
        )
        .orderBy(F.col("est_count").desc(), "term")
        .limit(20)
    )


@register(
    "order_streaks",
    oracle="""
    WITH d AS (
      SELECT DISTINCT o_orderpriority AS grp,
             CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num
      FROM orders
    ),
    anchored AS (
      SELECT grp, day_num,
             day_num - row_number() OVER (PARTITION BY grp ORDER BY day_num) AS anchor
      FROM d
    )
    SELECT grp, min(day_num) AS start_day, max(day_num) AS end_day,
           CAST(count(*) AS BIGINT) AS streak_days
    FROM anchored GROUP BY grp, anchor
    """,
)
def order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE days with at
    least one order per priority class — the classic streak pattern
    via the day_num − row_number() anchor (consecutive days share an
    anchor), one window + one groupBy, no self-joins."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    d = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("day_num")
    return (
        d.withColumn("anchor", F.col("day_num") - F.row_number().over(w))
        .groupBy("grp", "anchor")
        .agg(
            F.min("day_num").alias("start_day"),
            F.max("day_num").alias("end_day"),
            F.count(F.lit(1)).cast("long").alias("streak_days"),
        )
        .drop("anchor")
    )


@register(
    "pandas_scalar_udf",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS norm_text,
           CAST(length(trim(regexp_replace(lower(text), ' +', ' ', 'g')))
                - length(replace(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ', ''))
                + 1 AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.J Arrow SCALAR pandas_udf (the third UDF shape next to
    applyInPandas and mapInPandas): vectorized text normalization —
    lowercase, collapse runs of spaces, strip — executed on Arrow
    record batches, never row-at-a-time. The oracle reproduces it
    with SQL string functions; parity of the two is itself the test
    that the UDF stays a pure column function."""
    from ..operators.udfs import normalize_text as normalize

    docs = table(spark, sf_dir, "documents")
    # spread the single-file scan before the Python stage
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
    out = docs.select("doc_id", normalize(F.col("text")).alias("norm_text"))
    n_tokens = (
        F.length("norm_text")
        - F.length(F.regexp_replace("norm_text", " ", ""))
        + 1
    ).cast("long")
    return out.select("doc_id", "norm_text", n_tokens.alias("n_tokens"))


def _roundtrip_dir(fmt: str) -> str:
    import os
    import tempfile

    return os.path.join(tempfile.gettempdir(), f"spark_graft_{fmt}_roundtrip")


@register(
    "jsonl_scan",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name,
           CAST(length(n.n_name) AS BIGINT) AS name_len
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.A source-format breadth: JSON-lines. nation round-trips
    through newline-delimited JSON (write → read with an EXPLICIT
    schema — schema inference is a nondeterminism source and a full
    extra pass at scale), then joins region. Proves the engine's
    text-source path end-to-end, not just parquet."""
    path = _roundtrip_dir("jsonl")
    nation = table(spark, sf_dir, "nation")
    nation.coalesce(1).write.mode("overwrite").json(path)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    n = spark.read.schema(schema).json(path)
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            "n_nationkey",
            "n_name",
            "r_name",
            F.length("n_name").cast("long").alias("name_len"),
        )
    )


@register(
    "orc_scan",
    oracle="""
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM supplier GROUP BY s_nationkey
    """,
)
def orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.A source-format breadth: ORC. supplier round-trips through
    ORC (columnar like parquet — predicate pushdown and column
    pruning apply the same way) and aggregates per nation. DuckDB has
    no ORC reader, so the oracle runs on the parquet twin — the check
    therefore proves the ORC round-trip is lossless."""
    path = _roundtrip_dir("orc")
    supplier = table(spark, sf_dir, "supplier")
    supplier.write.mode("overwrite").orc(path)
    s = spark.read.orc(path)
    return s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum(F.round(F.col("s_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("acctbal_cents"),
    )


@register(
    "histogram_quantiles",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    bins AS (
      SELECT cents // 1048576 AS bin, CAST(count(*) AS BIGINT) AS cnt
      FROM base GROUP BY 1
    ),
    cum AS (
      SELECT bin, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
      FROM bins
    ),
    qs AS (SELECT * FROM (VALUES (25), (50), (90), (99)) AS q(q_pct)),
    targets AS (
      SELECT q_pct, CAST((q_pct * n + 99) // 100 AS BIGINT) AS target_rank, n
      FROM qs, nn
    ),
    hit AS (
      SELECT t.q_pct, t.target_rank, min(c.bin) AS bin
      FROM targets t JOIN cum c ON c.cum_cnt >= t.target_rank
      GROUP BY t.q_pct, t.target_rank
    ),
    est AS (
      SELECT h.q_pct, h.target_rank,
             h.bin * 1048576 AS bin_lo_cents,
             CAST(h.bin * 1048576 AS DOUBLE)
             + 1048576.0 * (CAST(h.target_rank - (c.cum_cnt - c.cnt) AS DOUBLE)
                            / CAST(c.cnt AS DOUBLE)) AS est_cents
      FROM hit h JOIN cum c ON c.bin = h.bin
    ),
    ordered AS (
      SELECT cents, row_number() OVER (ORDER BY cents, o_orderkey) AS rn FROM base
    )
    SELECT e.q_pct, e.target_rank, e.bin_lo_cents, e.est_cents,
           o.cents AS exact_cents
    FROM est e JOIN ordered o ON o.rn = e.target_rank
    """,
)
def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketch: fixed-width histogram bins
    (2^20 cents) with within-bin linear interpolation at the target
    rank — the third sketch family next to HLL and count-min (bins
    merge by cell-wise add, so per-partition/per-day histograms
    compose). The exact order statistic rides alongside, making the
    approximation error part of the checked contract.

    Scale: the sketch is one partially-aggregated groupBy to ~60
    cells; only the exact-verification column needs a sort, and at
    production scale that column is dropped, leaving a shuffle-light
    plan. All ranks/bins are exact integers; the interpolation is a
    single double division."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    nn = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    bins = base.groupBy(F.expr("cents DIV 1048576").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cum = bins.withColumn(
        "cum_cnt",
        F.sum("cnt")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    qs = spark.createDataFrame([(25,), (50,), (90,), (99,)], "q_pct int")
    targets = qs.crossJoin(F.broadcast(nn)).select(
        "q_pct", F.expr("CAST((q_pct * n + 99) DIV 100 AS BIGINT)").alias("target_rank")
    )
    hit = (
        targets.join(F.broadcast(cum), F.col("cum_cnt") >= F.col("target_rank"))
        .groupBy("q_pct", "target_rank")
        .agg(F.min("bin").alias("bin"))
    )
    est = hit.join(F.broadcast(cum), "bin").select(
        "q_pct",
        "target_rank",
        (F.col("bin") * 1048576).alias("bin_lo_cents"),
        (
            (F.col("bin") * 1048576).cast("double")
            + F.lit(1048576.0)
            * (
                (F.col("target_rank") - (F.col("cum_cnt") - F.col("cnt"))).cast("double")
                / F.col("cnt").cast("double")
            )
        ).alias("est_cents"),
    )
    ordered = base.withColumn(
        "rn", F.row_number().over(Window.orderBy("cents", "o_orderkey"))
    )
    return est.join(ordered, est["target_rank"] == ordered["rn"]).select(
        "q_pct", "target_rank", "bin_lo_cents", "est_cents",
        F.col("cents").alias("exact_cents"),
    )


def _bloom_pos_duck(i: int) -> str:
    d1 = f"(strpos('0123456789abcdef', substr(h, {3 * i + 1}, 1)) - 1)"
    d2 = f"(strpos('0123456789abcdef', substr(h, {3 * i + 2}, 1)) - 1)"
    d3 = f"(strpos('0123456789abcdef', substr(h, {3 * i + 3}, 1)) - 1)"
    return f"CAST({d1} * 256 + {d2} * 16 + {d3} AS BIGINT) % 4096"


_BLOOM_ORACLE = f"""
    WITH member AS (SELECT DISTINCT o_custkey AS k FROM orders),
    mh AS (SELECT k, md5(CAST(k AS VARCHAR)) AS h FROM member),
    bits AS (
      {" UNION ".join(f"SELECT DISTINCT {_bloom_pos_duck(i)} AS pos FROM mh" for i in range(3))}
    ),
    probe AS (SELECT c_custkey AS k FROM customer),
    ph AS (SELECT k, md5(CAST(k AS VARCHAR)) AS h FROM probe),
    probed AS (
      SELECT k,
             {" AND ".join(f"({_bloom_pos_duck(i)}) IN (SELECT pos FROM bits)" for i in range(3))}
             AS bloom_hit
      FROM ph
    ),
    truth AS (
      SELECT p.k, p.bloom_hit, m.k IS NOT NULL AS is_member
      FROM probed p LEFT JOIN member m ON m.k = p.k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
           CAST(sum(CASE WHEN is_member AND NOT bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives
    FROM truth
"""


@register("bloom_membership", oracle=_BLOOM_ORACLE)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter membership sketch (4096 bits, 3 md5-derived hash
    positions) — the fourth sketch family (HLL, count-min, histogram,
    Bloom). Builds the bit set from orders' customer keys, probes
    every customer, and reports hits vs exact membership: the checked
    contract asserts ZERO false negatives (the Bloom guarantee) while
    surfacing the false-positive count.

    Scale: the filter is a distinct over ≤ 3·4096 positions (bit-wise
    OR merge = set union, partially aggregated); probing broadcasts
    those positions — this is exactly the semi-join pre-filter that
    cuts shuffle volume on selective joins at 100 TB."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")

    def positions(key_col):
        h = F.md5(key_col.cast("string"))
        return [
            F.conv(F.substring(h, 3 * i + 1, 3), 16, 10).cast("long") % 4096
            for i in range(3)
        ]

    member = orders.select(F.col("o_custkey").alias("k")).distinct()
    bits = None
    for i, pos in enumerate(positions(F.col("k"))):
        sel = member.select(pos.alias("pos")).distinct()
        bits = sel if bits is None else bits.unionByName(sel).distinct()
    probed = customer.select(F.col("c_custkey").alias("k"))
    for i, pos in enumerate(positions(F.col("k"))):
        hit_i = bits.select(F.col("pos").alias(f"p{i}"))
        probed = probed.withColumn(f"b{i}", pos).join(
            F.broadcast(hit_i), F.col(f"b{i}") == F.col(f"p{i}"), "left"
        ).withColumn(f"hit{i}", F.col(f"p{i}").isNotNull()).drop(f"p{i}")
    probed = probed.withColumn(
        "bloom_hit", F.col("hit0") & F.col("hit1") & F.col("hit2")
    )
    truth = probed.join(
        member.select(F.col("k").alias("mk")), probed["k"] == F.col("mk"), "left"
    ).withColumn("is_member", F.col("mk").isNotNull())
    return truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).cast("long").alias("n_hits"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).cast("long").alias("n_members"),
        F.sum(F.when(F.col("bloom_hit") & ~F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("false_positives"),
        F.sum(F.when(F.col("is_member") & ~F.col("bloom_hit"), 1).otherwise(0))
        .cast("long")
        .alias("false_negatives"),
    )


@register(
    "dq_checks",
    oracle="""
    SELECT 'orders_custkey_fk' AS check_name,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL) AS violations,
           (SELECT CAST(count(*) AS BIGINT) FROM orders) AS checked
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
    UNION ALL
    SELECT 'orders_pk_unique',
           (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM
             (SELECT count(*) AS c FROM orders GROUP BY o_orderkey) g
            WHERE c > 1),
           (SELECT CAST(count(*) AS BIGINT) FROM orders)
    UNION ALL
    SELECT 'orders_price_positive',
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_totalprice IS NULL OR o_totalprice <= 0),
           (SELECT CAST(count(*) AS BIGINT) FROM orders)
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem
            WHERE l_discount IS NULL OR l_discount < 0 OR l_discount > 1),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit as a first-class operator: referential
    integrity (anti joins), primary-key uniqueness (surplus rows per
    key), domain constraints (positivity, NULLs), and cross-column
    ordering — one violations row per named check, the shape a
    pipeline gates its publish on (the reference trusts Postgres
    constraints; immutable-file warehouses must recheck on write).

    Scale: each check is an independent aggregate/anti-join over one
    table — no check forces a wider shuffle than the rule itself, FK
    probes broadcast the dimension side, and the final result is five
    rows regardless of data size."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    lineitem = table(spark, sf_dir, "lineitem")

    def one(name: str, violations, checked) -> DataFrame:
        return violations.crossJoin(checked).select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
            F.col("checked").cast("long").alias("checked"),
        )

    cnt = lambda df: df.agg(F.count(F.lit(1)).alias("checked"))  # noqa: E731

    fk1 = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("violations"))
    fk2 = lineitem.join(
        orders.select("o_orderkey"),
        lineitem["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("violations"))
    pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("violations"))
    )
    dom = orders.filter(
        F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
    ).agg(F.count(F.lit(1)).alias("violations"))
    disc = lineitem.filter(
        F.col("l_discount").isNull()
        | (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1)
    ).agg(F.count(F.lit(1)).alias("violations"))
    return (
        one("orders_custkey_fk", fk1, cnt(orders))
        .unionByName(one("lineitem_orderkey_fk", fk2, cnt(lineitem)))
        .unionByName(one("orders_pk_unique", pk, cnt(orders)))
        .unionByName(one("orders_price_positive", dom, cnt(orders)))
        .unionByName(one("lineitem_discount_range", disc, cnt(lineitem)))
    )


@register(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS ship_month,
           CAST(CAST(sum(CASE WHEN p.p_type = 'ECONOMY'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS BIGINT) AS econ_cents,
           CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS BIGINT) AS total_cents,
           CAST(CAST(sum(CASE WHEN p.p_type = 'ECONOMY'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) AS econ_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: category revenue share per ship month —
    fact ⋈ broadcast(part), discounted revenue as exact cents
    (the double product is computed identically on both engines, then
    rounded once to BIGINT before any aggregation), conditional and
    total sums in one pass, share as a single exact-long division."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li["l_partkey"] == F.col("p_partkey"),
    )
    out = joined.groupBy(
        F.trunc(F.to_date("l_shipdate"), "month").alias("ship_month")
    ).agg(
        F.sum(F.when(F.col("p_type") == "ECONOMY", cents).otherwise(0))
        .cast("long")
        .alias("econ_cents"),
        F.sum(cents).cast("long").alias("total_cents"),
    )
    return out.select(
        "ship_month",
        "econ_cents",
        "total_cents",
        (
            F.col("econ_cents").cast("double") / F.col("total_cents").cast("double")
        ).alias("econ_share"),
    )


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT o_orderpriority AS grp,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS BIGINT) AS rev_cents
    FROM orders GROUP BY o_orderpriority
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for distributive aggregates: the
    stored partial state (orders before 1997-06-01, aggregated) is
    MERGED with the new-batch partial (orders from 1997-06-01 on) by
    summing state cells — never rescanning history. The oracle is the
    full recompute over all orders, so the check IS the proof that
    merge(partial_old, partial_new) == full for count/sum state.

    Scale: the nightly cost is O(batch) + O(|groups|) state merge —
    the same property stage_append gives row storage, lifted to
    aggregate tables. (Non-distributive aggs need sketch state:
    see hll_cardinality / histogram_quantiles.)"""
    orders = table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-06-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("grp")).agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents"),
        )

    stored = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        stored.unionByName(delta)
        .groupBy("grp")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("rev_cents").cast("long").alias("rev_cents"),
        )
    )


def _hll_merge_sql(dialect: str) -> str:
    """Mergeability proof: per-priority-group HLL registers, merged
    by per-bucket max, must equal the registers of a direct sketch
    over the whole table — compared cell-by-cell, not just on the
    final estimate."""
    bucket, shift, zeros, strtype = _hll_dialect(dialect)
    return f"""
    WITH hashed AS (
      SELECT o_orderpriority AS grp, md5(CAST(o_custkey AS {strtype})) AS h
      FROM {{tbl}}
    ),
    parts AS (
      SELECT grp, {bucket} AS bucket, {zeros} AS z,
             substr(h, 3 + {zeros}, 1) AS d
      FROM hashed
    ),
    rho AS (
      SELECT grp, bucket,
             least(4 * z + CASE WHEN d = '1' THEN 3
                                WHEN d IN ('2', '3') THEN 2
                                WHEN d IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END + 1, 40) AS r
      FROM parts
    ),
    group_regs AS (
      SELECT grp, bucket, max(r) AS M FROM rho GROUP BY grp, bucket
    ),
    merged AS (SELECT bucket, max(M) AS M FROM group_regs GROUP BY bucket),
    direct AS (SELECT bucket, max(r) AS M FROM rho GROUP BY bucket),
    cmp AS (
      SELECT coalesce(m.bucket, d.bucket) AS bucket,
             m.M AS merged_m, d.M AS direct_m
      FROM merged m FULL OUTER JOIN direct d ON m.bucket = d.bucket
    )
    SELECT CAST(count(*) AS BIGINT) AS buckets_used,
           CAST(sum(CASE WHEN merged_m IS NOT DISTINCT FROM direct_m
                         THEN 1 ELSE 0 END) AS BIGINT) AS buckets_equal,
           CAST((SELECT count(*) FROM (SELECT DISTINCT grp FROM hashed)) AS BIGINT)
             AS n_groups
    FROM cmp
    """


@register("hll_merge_proof", oracle=_hll_merge_sql("duck").format(tbl="orders"))
def hll_merge_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability, checked cell-by-cell: HLL registers built
    per order-priority group and merged with a per-bucket max must
    equal the registers of one direct sketch over the whole table
    (buckets_equal == buckets_used). This is the property that lets
    per-partition / per-day sketches answer global distinct-count
    questions at 100 TB without rescans — here it is part of the
    oracle-checked contract rather than an assumed identity."""
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__hll_merge_orders__")
    return spark.sql(_hll_merge_sql("spark").format(tbl="__hll_merge_orders__"))


KCORE_ORACLE = """
    WITH co AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    e AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM co a JOIN co b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY a.l_suppkey, b.l_suppkey
      HAVING count(*) >= 4
    ),
    u0 AS (
      SELECT u AS src, v AS dst FROM e
      UNION ALL SELECT v, u FROM e
    ),
    kp1 AS (
      SELECT src FROM u0 GROUP BY src HAVING count(*) >= 3
    ),
    u1 AS (
      SELECT x.src, x.dst FROM u0 x
      JOIN kp1 a ON x.src = a.src
      JOIN kp1 b ON x.dst = b.src
    ),
    kp2 AS (
      SELECT src FROM u1 GROUP BY src HAVING count(*) >= 3
    ),
    u2 AS (
      SELECT x.src, x.dst FROM u1 x
      JOIN kp2 a ON x.src = a.src
      JOIN kp2 b ON x.dst = b.src
    ),
    kp3 AS (
      SELECT src FROM u2 GROUP BY src HAVING count(*) >= 3
    ),
    u3 AS (
      SELECT x.src, x.dst FROM u2 x
      JOIN kp3 a ON x.src = a.src
      JOIN kp3 b ON x.dst = b.src
    ),
    kp4 AS (
      SELECT src FROM u3 GROUP BY src HAVING count(*) >= 3
    ),
    u4 AS (
      SELECT x.src, x.dst FROM u3 x
      JOIN kp4 a ON x.src = a.src
      JOIN kp4 b ON x.dst = b.src
    )
    SELECT src AS node_id, CAST(count(*) AS BIGINT) AS core_degree
    FROM u4 GROUP BY src
"""


@register("kcore_decomposition", oracle=KCORE_ORACLE)
def kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics: the 3-core of the frequent co-supplier graph
    (same support-thresholded edges as ``triangle_count``) via a
    FIXED 4-round synchronous peel — each round drops every node
    whose current degree is below 3 together with its edges. Fixed
    rounds (not run-to-convergence) keep the oracle an unrolled CTE
    chain and make the two engines bit-comparable even mid-peel; on
    this graph the fringe is shallow, so the peel is stationary well
    before round 4 (asserted in pytest). O(E) per round, one degree
    aggregation + two node-keyed semi joins, per-round persists
    released through the attach_cache contract. Output: surviving
    (node_id, core_degree) — the dense backbone for community
    seeding and collusion-ring screens."""
    from ..operators.graph import k_core

    li = table(spark, sf_dir, "lineitem")
    co = li.select("l_orderkey", "l_suppkey").distinct()
    b = co.select(
        F.col("l_orderkey").alias("__o__"), F.col("l_suppkey").alias("__s__")
    )
    edges = (
        co.join(b, co["l_orderkey"] == F.col("__o__"))
        .filter(F.col("l_suppkey") < F.col("__s__"))
        .groupBy(F.col("l_suppkey").alias("u"), F.col("__s__").alias("v"))
        .agg(F.count(F.lit(1)).alias("__support__"))
        .filter(F.col("__support__") >= 4)
        .select("u", "v")
    )
    return k_core(edges, k=3, rounds=4)


@register(
    "triangle_count",
    oracle="""
    WITH co AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM co a JOIN co b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY a.l_suppkey, b.l_suppkey
      HAVING count(*) >= 4
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    GROUP BY node
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics: per-node triangle counts on the FREQUENT
    co-supplier graph (suppliers sharing ≥ 4 orders — the
    market-basket support threshold) — the clustering-coefficient
    numerator used for community/anomaly screens on entity graphs.

    The support threshold is the density control: a raw co-occurrence
    graph over high-throughput entities saturates toward the complete
    graph as data grows (measured 91% density at sf0.1 — 1.25e8
    triangles, quadratic garbage), while support-thresholded edges
    keep only statistically meaningful ties, so edge count tracks
    the entity count, not its square.

    Canonical-order enumeration: undirected edges stored once as
    ``u < v`` and triangles matched as a<b<c via two equi-joins
    (edge (a,b) ⋈ (b,c) ⋈ (a,c)) — each triangle counted exactly
    once, no nested-loop and no double counting to divide away. The
    a<b<c orientation is the id-ordered variant of compact-forward:
    every wedge is generated from its lowest vertex only, so the
    join fanout is Σ_v d_>(v)² over FORWARD degrees, not total
    degrees (at 100 TB the further refinement is degree-ordering
    the orientation; id-order keeps the oracle portable). Edge
    construction fans out per-order supplier pairs — bounded by
    items-per-order (~7), linear in lineitem."""
    li = table(spark, sf_dir, "lineitem")
    co = li.select("l_orderkey", "l_suppkey").distinct()
    a = co.alias("a")
    b = co.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 4)
        .select("u", "v")
        # consumed THREE times below (e1/e2/e3): without the persist
        # each join leg re-runs the whole lineitem co-occurrence
        # build; released by callers via the attach_cache contract
        .persist()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    # ONE pass over the triangle join: explode each (a,b,c) row into
    # its three corners. The union-of-three-projections form this
    # replaces re-executed the two-join tri subtree once PER BRANCH
    # (ReuseExchange dedupes only the exchanges, not the join probe) —
    # same multiset of corner rows, identical counts, 3x less join
    # work (r11 optimization, guide §2.4).
    nodes = tri.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
    )
    return attach_cache(
        nodes.groupBy("node").agg(F.count("*").alias("n_triangles")), edges
    )


LABEL_PROP_ORACLE = """
WITH
    co AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM co a JOIN co b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY a.l_suppkey, b.l_suppkey
      HAVING count(*) >= 4
    ),
    adj AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL SELECT v AS src, u AS dst FROM edges
    ),
    nodes AS (SELECT DISTINCT src AS node FROM adj),
    lab0 AS (SELECT node, node AS community FROM nodes),
    votes1 AS (
      SELECT a.src AS node, l.community, count(*) AS votes
      FROM adj a JOIN lab0 l ON l.node = a.dst
      GROUP BY a.src, l.community
    ),
    win1 AS (
      SELECT node, community FROM (
        SELECT node, community,
               row_number() OVER (
                 PARTITION BY node ORDER BY votes DESC, community
               ) AS rn
        FROM votes1
      ) WHERE rn = 1
    ),
    lab1 AS (
      SELECT n.node, COALESCE(w.community, n.node) AS community
      FROM nodes n LEFT JOIN win1 w ON w.node = n.node
    ),
    votes2 AS (
      SELECT a.src AS node, l.community, count(*) AS votes
      FROM adj a JOIN lab1 l ON l.node = a.dst
      GROUP BY a.src, l.community
    ),
    win2 AS (
      SELECT node, community FROM (
        SELECT node, community,
               row_number() OVER (
                 PARTITION BY node ORDER BY votes DESC, community
               ) AS rn
        FROM votes2
      ) WHERE rn = 1
    ),
    lab2 AS (
      SELECT n.node, COALESCE(w.community, n.node) AS community
      FROM nodes n LEFT JOIN win2 w ON w.node = n.node
    ),
    votes3 AS (
      SELECT a.src AS node, l.community, count(*) AS votes
      FROM adj a JOIN lab2 l ON l.node = a.dst
      GROUP BY a.src, l.community
    ),
    win3 AS (
      SELECT node, community FROM (
        SELECT node, community,
               row_number() OVER (
                 PARTITION BY node ORDER BY votes DESC, community
               ) AS rn
        FROM votes3
      ) WHERE rn = 1
    ),
    lab3 AS (
      SELECT n.node, COALESCE(w.community, n.node) AS community
      FROM nodes n LEFT JOIN win3 w ON w.node = n.node
    )
    SELECT node, CAST(community AS BIGINT) AS community
    FROM lab3
"""


@register("label_propagation_communities", oracle=LABEL_PROP_ORACLE)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics (iterative #3, beside PageRank and the
    dedup-cluster components): deterministic synchronous label
    propagation on the support-thresholded co-supplier graph
    (operators.graph.label_propagation) — 3 rounds of
    adopt-the-modal-neighbor-label, ties to the lowest label,
    isolated nodes keep their own. The oracle unrolls the rounds as
    generated CTE blocks from the same iteration count. One O(E)
    join+agg per round; the edge build is the shared
    market-basket-support construction (density control at scale)."""
    from ..operators.dedup import attach_cache
    from ..operators.graph import label_propagation

    li = table(spark, sf_dir, "lineitem")
    co = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = co.alias("a"), co.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 4)
        .select("u", "v")
        # consumed once per propagation round — persist like
        # triangle_count's triply-consumed edge relation
        .persist()
    )
    out = label_propagation(edges, iters=3)
    return attach_cache(
        out.select("node", F.col("community").cast("long").alias("community")),
        edges,
    )


@register(
    "gzip_jsonl_scan",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM customer GROUP BY c_nationkey
    """,
)
def gzip_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.A source-format breadth: COMPRESSED JSON-lines — how web
    corpora actually arrive (Common-Crawl-style .jsonl.gz drops).
    customer round-trips through gzip-codec JSONL (write with
    compression=gzip → read with an explicit schema; gzip is
    NON-SPLITTABLE so one file = one task — the docstring trade
    every ingest pipeline must know: fine for many medium files,
    repack to a splittable codec or parquet for few huge ones),
    then aggregates exact cents per nation."""
    path = _roundtrip_dir("gzip_jsonl")
    cust = table(spark, sf_dir, "customer")
    (
        cust.repartition(4)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(path)
    )
    schema = "c_custkey long, c_nationkey int, c_acctbal double"
    back = spark.read.schema(schema).json(path)
    return back.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("acctbal_cents"),
    )


@register(
    "fixed_width_scan",
    oracle="""
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM supplier GROUP BY s_nationkey
    """,
)
def fixed_width_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.A source-format breadth: FIXED-WIDTH text — the
    mainframe/legacy-extract format next to the reference's CSV/XLSX
    drop-dir family. supplier round-trips through a fixed-width
    rendering (``sources.readers.write_fixed_width`` /
    ``read_fixed_width``: decimals rendered as right-aligned integer
    cents so the text round-trip is exact; the parse is pure
    substring/trim/cast inside whole-stage codegen, and plain
    fixed-width text stays line-splittable, unlike the gzip-JSONL
    drop), then aggregates exact cents per nation."""
    from ..sources.readers import read_fixed_width, write_fixed_width

    specs = [
        ("s_suppkey", 1, 12, "long"),
        ("s_name", 13, 24, "string"),
        ("s_nationkey", 37, 4, "int"),
        ("acctbal_cents", 41, 10, "long"),
    ]
    path = _roundtrip_dir("fixed_width")
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_cents"),
    )
    write_fixed_width(sup.repartition(4), path, specs)
    back = read_fixed_width(spark, path, specs)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("acctbal_cents").cast("long").alias("acctbal_cents"),
    )


BAND_JOIN_ORACLE = """
    WITH p AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS vc
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           CAST(abs(a.vc - b.vc) AS BIGINT) AS diff_c
    FROM p a JOIN p b
      ON a.event_id < b.event_id AND abs(a.vc - b.vc) <= 5
"""


@register("band_join_tolerance", oracle=BAND_JOIN_ORACLE)
def band_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance (band) self-join: all purchase pairs whose amounts
    differ by ≤ 5 cents — the record-linkage / fraud-screen shape
    ('same charge, split card'). A bare ``abs(a-b) <= t`` predicate
    plans as a nested loop; :func:`operators.rangejoin.band_join`
    buckets both sides on ``value DIV tolerance`` (partner is always
    in the same or an adjacent bucket → 3× replication on one side)
    and the exact band filters inside the bucket equi-join. Values
    are quantized to integer cents BEFORE the join, so the band edge
    is exact on both engines; ``id_a < id_b`` halves the symmetric
    pairs. Oracle: the naive inequality join, fine at oracle scale."""
    from ..operators.rangejoin import band_join

    ev = events_table(spark, sf_dir).filter(F.col("event_type") == "purchase")
    base = ev.select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("value_c")
    )
    right = base.select(
        F.col("event_id").alias("id_b"), F.col("value_c").alias("vc_b")
    )
    return (
        band_join(base, right, "value_c", "vc_b", tolerance=5)
        .filter(F.col("event_id") < F.col("id_b"))
        .select(
            F.col("event_id").alias("id_a"),
            "id_b",
            F.abs(F.col("value_c") - F.col("vc_b")).cast("long").alias("diff_c"),
        )
    )


# Fellegi–Sunter model constants shared by the Spark plan and the
# oracle: the integer milli-bit weights are computed ONCE here and
# embedded as literals in both, so there is no engine-side float log
# to drift.
from ..operators.linkage import fs_weights_milli as _fs_w  # noqa: E402

_FS_SEG = _fs_w(0.9, 0.2, name="segment")
_FS_NAME = _fs_w(0.95, 0.01, name="name")
_FS_BAL = _fs_w(0.9, 0.3, name="acctbal")
_FS_MATCH, _FS_POSSIBLE = 6000, 0

RECORD_LINKAGE_ORACLE = f"""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer
    ),
    pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             CAST(CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END AS BIGINT) AS agr_segment,
             CAST(CASE WHEN levenshtein(a.c_name, b.c_name) <= 2 THEN 1 ELSE 0 END AS BIGINT) AS agr_name,
             CAST(CASE WHEN abs(a.bal_c - b.bal_c) <= 100 THEN 1 ELSE 0 END AS BIGINT) AS agr_acctbal
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey
       AND abs(a.bal_c - b.bal_c) <= 500
       AND a.c_custkey < b.c_custkey
    ),
    scored AS (
      SELECT *,
             CAST(CASE WHEN agr_segment = 1 THEN {_FS_SEG[0]} ELSE {_FS_SEG[1]} END
                + CASE WHEN agr_name = 1 THEN {_FS_NAME[0]} ELSE {_FS_NAME[1]} END
                + CASE WHEN agr_acctbal = 1 THEN {_FS_BAL[0]} ELSE {_FS_BAL[1]} END
               AS BIGINT) AS score_milli
      FROM pairs
    )
    SELECT id_a, id_b, agr_segment, agr_name, agr_acctbal, score_milli,
           CASE WHEN score_milli >= {_FS_MATCH} THEN 'match'
                WHEN score_milli < {_FS_POSSIBLE} THEN 'non_match'
                ELSE 'possible' END AS link_class
    FROM scored
"""


@register("record_linkage_fs", oracle=RECORD_LINKAGE_ORACLE)
def record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution, the record-level sibling of document dedup:
    Fellegi–Sunter probabilistic linkage over the customer table.
    Blocking is the band join (same-nation customers whose account
    balances sit within 500 cents — a HIGH-cardinality blocking key,
    so block sizes stay bounded as data grows; blocking on nation
    alone would grow pair counts quadratically). Each candidate pair
    is compared on three fields — market segment equality, name edit
    distance <= 2 (JVM levenshtein, no UDF), balance within 100 cents
    — and scored with the FS log-likelihood weights log2(m/u) /
    log2((1-m)/(1-u)), precomputed driver-side as integer milli-bit
    literals (``operators.linkage.fs_weights_milli``), then classified
    match / possible / non_match. Every executor-side operation is an
    integer comparison or addition, so the distributed classification
    hash-matches the single-threaded oracle exactly."""
    from ..operators.linkage import FsField, fs_score_pairs
    from ..operators.rangejoin import band_join

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    right = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nation_b"),
        F.col("c_mktsegment").alias("segment_b"),
        F.col("bal_c").alias("bal_b"),
    )
    blocked = (
        band_join(
            c, right, "bal_c", "bal_b", tolerance=500,
            extra_key=("c_nationkey", "nation_b"),
        )
        .filter(F.col("c_custkey") < F.col("id_b"))
    )
    fields = [
        FsField("segment", F.col("c_mktsegment") == F.col("segment_b"), 0.9, 0.2),
        FsField("name", F.levenshtein("c_name", "name_b") <= 2, 0.95, 0.01),
        FsField("acctbal", F.abs(F.col("bal_c") - F.col("bal_b")) <= 100, 0.9, 0.3),
    ]
    return fs_score_pairs(
        blocked, fields,
        match_threshold_milli=_FS_MATCH, possible_threshold_milli=_FS_POSSIBLE,
    ).select(
        F.col("c_custkey").alias("id_a"),
        "id_b", "agr_segment", "agr_name", "agr_acctbal",
        "score_milli", "link_class",
    )


SORTED_NEIGHBORHOOD_ORACLE = """
    WITH c AS (
      SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer
    ),
    r AS (
      SELECT c_custkey, bal_c,
             row_number() OVER (ORDER BY bal_c, c_custkey) AS rn
      FROM c
    )
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(b.rn - a.rn AS BIGINT) AS rank_dist,
           CAST(abs(a.bal_c - b.bal_c) AS BIGINT) AS bal_diff_c
    FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 9
"""


@register("sorted_neighborhood_pairs", oracle=SORTED_NEIGHBORHOOD_ORACLE)
def sorted_neighborhood_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER classic linkage blocking (Hernández–Stolfo sorted
    neighborhood): every customer pair within 10 positions of each
    other in the global (balance, id) sort order — output bounded at
    O(n·window) by construction, where value-band blocking
    (``record_linkage_fs``) goes Ω(pairs-in-band) on dense regions.
    The global rank comes from
    ``operators.linkage.global_row_number`` — range partition +
    per-partition rank + bounded offset collect — NOT the naive empty
    partitionBy window that funnels the corpus through one task; the
    rank-space pair join reuses the band join as an equi-join on rank
    buckets. Ranks are exact integers under a total order, so the
    distributed result hash-matches the oracle's single-threaded
    row_number."""
    from ..operators.linkage import sorted_neighborhood_pairs

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c")
    )
    pairs = sorted_neighborhood_pairs(
        c, "c_custkey", ["bal_c", "c_custkey"], window=10
    )
    out = pairs.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_custkey_b").alias("id_b"),
        "rank_dist",
        F.abs(F.col("bal_c") - F.col("bal_c_b")).cast("long").alias("bal_diff_c"),
    )
    return attach_cache(out, *getattr(pairs, "_spark_graft_cached", ()))
