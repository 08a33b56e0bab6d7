"""Behavioral analytics + corpus-indexing surface: funnel, cohort
retention, Markov transitions, document chunking, TF-IDF, token
entropy, fuzzy matching, exact group quantiles, EWMA smoothing,
integer-exact outlier flags, and a bounded inverted index.

These extend the engine past the reference's fixed DAG the same way
the §2.K rows do: each is a pattern a training-data / product
analytics pipeline runs at 100 TB, expressed as declarative DataFrame
plans (one- or two-shuffle shapes, no driver-side loops), with DuckDB
oracle twins built from the determinism playbook (integer cents,
quantized ln(), DIV floor-division on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import (
    nb_token_counts,
    nb_tokens,
    winnow_dedup_pairs,
    winnow_fingerprints,
)
from ._base import events_table, make_registry, table

QUERIES, ORACLES, register = make_registry()


# ---------------------------------------------------------------------------
# Funnel analysis: signup -> view -> purchase, min-timestamp progression.
# ---------------------------------------------------------------------------


@register(
    "funnel_analysis",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
      GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'signup' AS stage_name, (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'view_after_signup', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase_after_view', (SELECT count(*) FROM s3)
    """,
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: users who signed up, then viewed strictly after
    their first signup, then purchased strictly after that first view.

    Shape: three per-stage aggregations, each a single groupBy on
    ``user_id``; the stage-N+1 join keys on the same ``user_id`` the
    previous groupBy just partitioned on, so the shuffles reuse one
    partitioning. The type filters push into the scan. No windows, no
    per-user state — the pattern scales as three hash aggregations
    regardless of corpus size.
    """
    ev = events_table(spark, sf_dir)

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(n: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count("*").alias("n_users"),
        )

    return (
        stage(1, "signup", s1)
        .unionAll(stage(2, "view_after_signup", s2))
        .unionAll(stage(3, "purchase_after_view", s3))
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention matrix.
# ---------------------------------------------------------------------------


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS TIMESTAMP)
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           date_diff('day', CAST(f.cohort_week AS DATE),
                     CAST(a.active_week AS DATE)) // 7 AS offset_weeks,
           count(*) AS n_users
    FROM firsts f JOIN active a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by the week of their first
    event; for each (cohort week, week offset) the count of users
    still active. The week offset is computed as floor(day-diff / 7)
    with integer division on BOTH engines — never a 'week' datediff,
    whose boundary semantics differ across engines.

    Shape: one groupBy(user) for first-touch, one distinct over
    (user, week), one user-keyed join (partitioning reused), one
    final aggregation on the small (cohort, offset) grid.
    """
    ev = events_table(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        firsts.join(active, "user_id")
        .select(
            "cohort_week",
            F.expr(
                "datediff(CAST(active_week AS DATE), CAST(cohort_week AS DATE)) DIV 7"
            ).alias("offset_weeks"),
        )
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Markov transition counts over per-user event sequences.
# ---------------------------------------------------------------------------


@register(
    "markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS curr_type, count(*) AS n_trans
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, curr_type, n_trans,
           CAST((n_trans * 1000000) // sum(n_trans) OVER (PARTITION BY prev_type)
                AS BIGINT) AS prob_ppm
    FROM pairs
    """,
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for each
    observed (prev, curr) pair, the transition count and probability
    in parts-per-million. The probability is integer floor-division
    (``DIV`` / ``//``) of exact counts — no float ratios to drift.

    Shape: one window shuffle on user_id for the lag, one groupBy on
    the tiny (prev, curr) grid, one window over that grid for the
    row-normalising totals. The event ordering ties break on
    event_id, so the lag sequence is total-ordered and deterministic.
    """
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count("*").alias("n_trans"))
    )
    return pairs.select(
        "prev_type",
        "curr_type",
        "n_trans",
        F.expr("n_trans * 1000000 DIV sum(n_trans) OVER (PARTITION BY prev_type)")
        .alias("prob_ppm"),
    )


# ---------------------------------------------------------------------------
# Document chunking with overlap (context-window preparation).
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 200
_CHUNK_STRIDE = 150


@register(
    "chunk_documents",
    oracle=f"""
    SELECT doc_id,
           k AS chunk_idx,
           k * {_CHUNK_STRIDE} AS chunk_start,
           substr(text, k * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE}) AS chunk_text,
           length(substr(text, k * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE})) AS chunk_len
    FROM (
      SELECT doc_id, text,
             unnest(range(0, ((length(text) - 1) // {_CHUNK_STRIDE}) + 1)) AS k
      FROM documents
    )
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking — the standard context-window
    preparation pass for LLM training/retrieval corpora: 200-char
    windows every 150 chars (50-char overlap), last chunk ragged.

    Shape: a pure narrow map — ``sequence`` + ``explode`` generates
    chunk offsets per row with no shuffle at all; output size is
    len/stride per document. At 100 TB this is the ideal operator:
    embarrassingly parallel, no state, pushdown-transparent.
    """
    docs = table(spark, sf_dir, "documents")
    k = F.explode(
        F.sequence(F.lit(0), F.expr(f"(length(text) - 1) DIV {_CHUNK_STRIDE}"))
    ).alias("k")
    chunk = F.expr(f"substring(text, k * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE})")
    return (
        docs.select("doc_id", "text", k)
        .select(
            "doc_id",
            F.col("k").alias("chunk_idx"),
            (F.col("k") * _CHUNK_STRIDE).alias("chunk_start"),
            chunk.alias("chunk_text"),
            F.length(chunk).alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (quantized-ln determinism).
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t AS term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
      WHERE t <> ''
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * CAST(round(ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE))
                                * 1000000000.0) AS BIGINT) AS score_q
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score_q FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score_q DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 most distinctive terms per document, scored as
    tf * ln(N/df). The ln() is quantized to 1e-9 then held as a
    BIGINT multiple, so the score is an exact integer on both engines
    (the [[bm25_score]] determinism technique); ties rank by term.

    Shape: explode → (doc,term) partial-aggregatable count → term-
    keyed df aggregate (small) joined back — at scale the df side is
    vocabulary-sized, so that join broadcasts; the top-3 filter is a
    row_number window on the doc-keyed frame, same key as the tf
    groupBy, reusing the partitioning.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.count()
    score_q = (
        F.col("tf")
        * F.expr(
            f"CAST(round(ln(CAST({n} AS DOUBLE) / CAST(df AS DOUBLE))"
            " * 1000000000.0) AS BIGINT)"
        )
    ).alias("score_q")
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id", "term", "tf", "df", score_q
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score_q")
    )


# ---------------------------------------------------------------------------
# Unigram token entropy per document (integer-exact).
# ---------------------------------------------------------------------------


@register(
    "token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t AS term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
      WHERE t <> ''
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS c FROM toks GROUP BY doc_id, term
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000000.0)
                               AS BIGINT)) AS BIGINT) AS sum_clnc_q
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           CAST((CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000000.0) AS BIGINT)
                 * n_tokens - sum_clnc_q) // (n_tokens * 1000) AS BIGINT)
             AS entropy_micronats
    FROM per_doc
    """,
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram entropy per document in micro-nats — the repetition /
    diversity signal quality filters threshold on. H = ln(n) −
    (1/n)·Σ c·ln(c), computed entirely in quantized-ln integer
    arithmetic: each ln() is rounded to 1e-9 and held as BIGINT, so
    the sums are order-free and the floor-division is exact on both
    engines.

    Shape: explode → one (doc,term) count → one doc-keyed aggregate.
    Both groupBys partial-aggregate map-side; no joins, no windows.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    ln_q = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1000000000.0) AS BIGINT)"
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.expr(f"c * {ln_q.format(x='c')}")).alias("sum_clnc_q"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.expr(
            f"CAST(({ln_q.format(x='n_tokens')} * n_tokens - sum_clnc_q)"
            " DIV (n_tokens * 1000) AS BIGINT)"
        ).alias("entropy_micronats"),
    )


# ---------------------------------------------------------------------------
# Bounded inverted index (term -> df + capped postings list).
# ---------------------------------------------------------------------------


@register(
    "inverted_index",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT doc_id, t AS term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
      WHERE t <> ''
    ),
    grouped AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings
      FROM pairs GROUP BY term
    )
    SELECT term, df, postings FROM grouped WHERE df >= 50
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus: for every term appearing in at
    least 50 documents, the document frequency and the first 20
    posting doc_ids (ascending). Postings are CAPPED inside the plan
    — a row_number window keyed the same as the aggregation bounds
    per-term state to 20 rows BEFORE the collect, so a stop-word with
    a billion postings costs 20 rows of memory, not a billion (the
    collect_list-then-slice shape would not survive 100 TB).

    Shape: explode → distinct (doc,term) → one term-keyed window
    (row_number + count) → one term-keyed groupBy reusing the same
    partitioning.
    """
    docs = table(spark, sf_dir, "documents")
    pairs = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
                )
            ).alias("term"),
        )
        .distinct()
    )
    w = Window.partitionBy("term")
    wo = w.orderBy("doc_id")
    capped = (
        pairs.withColumn("df", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") <= 20)
    )
    return (
        capped.groupBy("term")
        .agg(
            F.max("df").alias("df"),
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("postings"),
        )
        .filter(F.col("df") >= 50)
    )


# ---------------------------------------------------------------------------
# Fuzzy self-join: edit-distance matching with key blocking.
# ---------------------------------------------------------------------------


@register(
    "fuzzy_join_levenshtein",
    oracle="""
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           a.c_nationkey AS nationkey,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) record matching — the entity-resolution
    primitive. Candidate pairs are generated by BLOCKING on
    c_nationkey (equi-join), and only blocked pairs pay the
    levenshtein evaluation: never an all-pairs cross join. At 100 TB
    the blocking key is the knob — a tighter key (nation × name
    prefix) bounds per-block candidates the same way the MinHash
    bands bound [[near_dedup_minhash]].

    Both engines implement classic Levenshtein, so the distance is
    integer-identical.
    """
    cust = table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nationkey"),
    )
    b = cust.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return (
        a.join(b, "nationkey")
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 2)
        .select("custkey_a", "custkey_b", "nationkey", "edit_dist")
    )


# ---------------------------------------------------------------------------
# Exact per-group quartiles on integer cents.
# ---------------------------------------------------------------------------


@register(
    "group_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) AS q25,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.50) AS q50,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) AS q75,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quartiles of extended price. Works on integer
    cents so the linear interpolation between adjacent order
    statistics is exact in double — Spark ``percentile`` and DuckDB
    ``quantile_cont`` agree bit-for-bit (the [[median_agg]] rule,
    extended to a full quartile profile).

    Exact percentile is a sort-based aggregate: fine per group here;
    at 100 TB the mergeable-sketch variant is [[histogram_quantiles]].
    """
    li = table(spark, sf_dir, "lineitem")
    cents = "CAST(round(l_extendedprice * 100) AS LONG)"
    return li.groupBy("l_returnflag").agg(
        F.expr(f"percentile({cents}, 0.25)").alias("q25"),
        F.expr(f"percentile({cents}, 0.50)").alias("q50"),
        F.expr(f"percentile({cents}, 0.75)").alias("q75"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# EWMA smoothing with power-of-two weights (integer-exact).
# ---------------------------------------------------------------------------

_EWMA_TERMS = 16


def _ewma_exprs(lag_fn) -> tuple[str, str]:
    """Numerator / weight-sum expressions: weight 2^(15-k) for lag k.

    With alpha = 1/2 the EWMA weights are exact powers of two, so the
    whole smoothing is BIGINT arithmetic — order-free and engine-
    identical. ``lag_fn(k)`` renders the lag-k expression.
    """
    num = " + ".join(
        f"COALESCE({lag_fn(k)}, 0) * {1 << (_EWMA_TERMS - 1 - k)}"
        for k in range(_EWMA_TERMS)
    )
    wsum = " + ".join(
        f"(CASE WHEN {lag_fn(k)} IS NOT NULL THEN {1 << (_EWMA_TERMS - 1 - k)} ELSE 0 END)"
        for k in range(_EWMA_TERMS)
    )
    return num, wsum


@register(
    "ewma_smooth",
    oracle=(
        lambda num, wsum: f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS daily_cents
      FROM orders GROUP BY 1
    )
    SELECT day, daily_cents,
           CAST(({num}) // ({wsum}) AS BIGINT) AS ewma_cents
    FROM daily
    """
    )(*_ewma_exprs(lambda k: f"lag(daily_cents, {k}) OVER (ORDER BY day)")),
)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue with
    alpha = 1/2 over the last 16 observed days. Powers-of-two weights
    make every term exact BIGINT; the final division is floor on both
    engines. Warm-up rows renormalize over the weights actually
    present (the CASE weight-sum) rather than emitting biased values.

    Shape: one day-keyed aggregation, then ONE window pass computing
    all 16 lags (Spark evaluates them in a single sort). A global
    ORDER BY window is single-partition by nature — at 100 TB this
    runs per series key (add PARTITION BY), which is how any
    time-series smoother distributes.
    """
    num, wsum = _ewma_exprs(lambda k: f"lag(daily_cents, {k}) OVER (ORDER BY day)")
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS LONG)")).alias("daily_cents")
    )
    return daily.select(
        "day",
        "daily_cents",
        F.expr(f"CAST(({num}) DIV ({wsum}) AS BIGINT)").alias("ewma_cents"),
    )


# ---------------------------------------------------------------------------
# Z-score outlier flags via exact wide-integer comparison.
# ---------------------------------------------------------------------------


@register(
    "anomaly_zscore",
    oracle="""
    WITH c AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    stats AS (
      SELECT o_orderpriority,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
      FROM c GROUP BY o_orderpriority
    )
    SELECT c.o_orderkey, c.o_orderpriority, c.cents
    FROM c JOIN stats USING (o_orderpriority)
    WHERE 4 * (stats.n * c.cents - stats.s) * (stats.n * c.cents - stats.s)
          > 9 * (stats.n * stats.q - stats.s * stats.s)
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier flags: orders whose total price is more
    than 1.5 population standard deviations from their priority-group
    mean (the order-total distribution is near-uniform, so |z| tops
    out at √3 ≈ 1.73 — a 2σ gate would be vacuous). The test
    |x−μ| > 1.5σ is algebraically cleared of divisions and square
    roots into the integer inequality 4·(n·x − S)² > 9·(n·Q − S²),
    evaluated in DECIMAL(38,0) on Spark and HUGEINT on DuckDB —
    exact on both, no float boundary drift.

    Shape: one groupBy for the 5-row stats frame, broadcast back over
    the fact — a linear scan with an exact predicate; the flagging
    pass adds zero shuffles beyond the stats aggregate.
    """
    orders = table(spark, sf_dir, "orders")
    c = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS LONG)").alias("cents"),
    )
    stats = c.groupBy("o_orderpriority").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).alias("q"),
    )
    joined = c.join(F.broadcast(stats), "o_orderpriority")
    dev = F.col("n") * F.col("cents") - F.col("s")
    return joined.filter(
        F.lit(4) * dev * dev
        > F.lit(9) * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    ).select("o_orderkey", "o_orderpriority", "cents")


@register(
    "winsorize_stats",
    oracle="""
    WITH vm AS (
      SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v_m
      FROM events
    ),
    counts AS (
      SELECT event_type, v_m, count(*) AS c FROM vm GROUP BY event_type, v_m
    ),
    cum AS (
      SELECT event_type, v_m,
             sum(c) OVER (
               PARTITION BY event_type ORDER BY v_m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM counts
    ),
    bounds AS (
      SELECT event_type,
             min(CASE WHEN cum >= (5 * n + 99) // 100 THEN v_m END) AS lo_micros,
             min(CASE WHEN cum >= (95 * n + 99) // 100 THEN v_m END) AS hi_micros
      FROM cum GROUP BY event_type
    )
    SELECT v.event_type,
           count(*) AS n_events,
           CAST(sum(greatest(b.lo_micros, least(b.hi_micros, v.v_m))) AS BIGINT)
             AS sum_clipped_micros,
           min(b.lo_micros) AS lo_micros,
           min(b.hi_micros) AS hi_micros
    FROM vm v JOIN bounds b USING (event_type)
    GROUP BY v.event_type
    """,
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per event type: clip ``value`` to
    its exact [p05, p95] order statistics, then integer-exact clipped
    sums — the outlier-robust aggregate a metrics pipeline runs before
    trusting means (one fat-fingered 1e9 event otherwise owns the
    average).

    Exactness: the k-th order statistic is the smallest value whose
    cumulative count reaches ``k = ceil(p·n)`` — pure integer
    arithmetic on micro-quantized values, no percentile interpolation
    whose float rounding could drift between engines.

    Scale shape: the cumulative-count window runs over the per-type
    DISTINCT micro-values (collapsed first by a map-side-combined
    groupBy), not the raw events — the classic low-cardinality-key
    window skew (every raw event of a type forced through one task)
    is reduced to |distinct values| per type before any sort. The
    5-row bounds frame broadcasts back over the fact for the clip —
    zero extra shuffles on the wide side beyond one groupBy.
    """
    ev = events_table(spark, sf_dir)
    vm = ev.select(
        "event_type", F.expr("CAST(round(value * 1000000) AS LONG)").alias("v_m")
    )
    counts = vm.groupBy("event_type", "v_m").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        "v_m",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    bounds = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= F.expr("(5 * n + 99) DIV 100"), F.col("v_m"))).alias(
            "lo_micros"
        ),
        F.min(
            F.when(F.col("cum") >= F.expr("(95 * n + 99) DIV 100"), F.col("v_m"))
        ).alias("hi_micros"),
    )
    clipped = vm.join(F.broadcast(bounds), "event_type")
    return clipped.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.greatest("lo_micros", F.least("hi_micros", F.col("v_m")))
        ).alias("sum_clipped_micros"),
        F.min("lo_micros").alias("lo_micros"),
        F.min("hi_micros").alias("hi_micros"),
    )




SESSIONIZE_ORACLE = """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    g AS (
      SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT user_id, us,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM g
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(max(us) - min(us) AS BIGINT) AS duration_us
    FROM s GROUP BY user_id, session_id
"""


@register("sessionize_events", oracle=SESSIONIZE_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gaps-and-islands twin of the
    streaming ``session_window_agg``: a session breaks after 30 idle
    minutes. lag() marks session starts, a running sum numbers them,
    one groupBy aggregates — all three steps share the ONE shuffle on
    user_id (same-key windows and the final agg reuse the
    partitioning). Timestamps flow as epoch MICROSECOND integers —
    exact, order-free, and immune to the pandas datetime-range
    canonicalization failures of round 4."""
    e = events_table(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag("us").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("us") - prev) > 1_800_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessioned = e.withColumn("session_id", F.sum(is_new).over(run))
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("session_start_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


_PROFILE_COLS = ["l_orderkey", "l_shipdate", "l_returnflag", "l_linestatus"]

PROFILE_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM lineitem
    """
    for c in _PROFILE_COLS
)


@register("profile_table", oracle=PROFILE_ORACLE)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ/profiling: per-column row/null/distinct counts and string-
    rendered min/max — the audit a warehouse emits before publish
    (complements dq_checks' constraint violations). ONE scan computes
    every per-column aggregate map-side partially; the profiled
    columns are int/date/string so the string rendering is identical
    across engines (no float formatting divergence)."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = li.agg(*aggs)
    stacked = one.select(
        F.expr(
            "stack("
            + str(len(_PROFILE_COLS))
            + ", "
            + ", ".join(
                f"'{c}', __n_{c}, __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}"
                for c in _PROFILE_COLS
            )
            + ") AS (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )
    return stacked




CDC_APPLY_ORACLE = """
    WITH c AS (
      SELECT user_id,
             epoch_us(ts) AS us,
             event_id,
             CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
             value
      FROM events
    ),
    latest AS (
      SELECT user_id, us, op, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY us DESC, event_id DESC
             ) AS rn
      FROM c
    )
    SELECT user_id,
           CAST(us AS BIGINT) AS last_us,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM latest WHERE rn = 1 AND op <> 'D'
"""


@register("cdc_apply", oracle=CDC_APPLY_ORACLE)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC materialization: collapse a change stream (upserts +
    deletes) to current state — last op per key wins by (event time,
    change id), a trailing delete removes the key. ONE window shuffle
    on the key; the standard replication-feed -> queryable-table
    step (the event_id%10 op derivation stands in for the feed's op
    column). Values emitted as exact cents, timestamps as epoch
    micros."""
    e = events_table(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.when(F.col("event_id") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("us"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("us").alias("last_us"),
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
    )




#: Benford leading-digit probabilities log10(1+1/d), shared verbatim
#: by the Spark plan and the DuckDB oracle so expected counts agree
#: bit-for-bit
_BENFORD_P = {"1": 0.3010299956639812, "2": 0.17609125905568124, "3": 0.12493873660829992, "4": 0.09691001300805642, "5": 0.07918124604762482, "6": 0.06694678963061322, "7": 0.05799194697768673, "8": 0.05115252244738129, "9": 0.04575749056067514}

BENFORD_ORACLE = """
    WITH d AS (
      SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit
      FROM orders
    ),
    c AS (SELECT digit, count(*) AS observed FROM d GROUP BY digit),
    t AS (SELECT count(*) AS n FROM d),
    praw(digit, p) AS (VALUES ('1', 0.3010299956639812), ('2', 0.17609125905568124), ('3', 0.12493873660829992), ('4', 0.09691001300805642), ('5', 0.07918124604762482), ('6', 0.06694678963061322), ('7', 0.05799194697768673), ('8', 0.05115252244738129), ('9', 0.04575749056067514)),
    p AS (SELECT digit, CAST(p AS DOUBLE) AS p FROM praw)
    SELECT c.digit,
           CAST(observed AS BIGINT) AS observed,
           CAST(round(t.n * p.p * 1e9) AS BIGINT) AS expected_nano,
           CAST(round((observed - t.n * p.p) * (observed - t.n * p.p)
                      / (t.n * p.p) * 1e9) AS BIGINT) AS chi2_nano
    FROM c JOIN p ON p.digit = c.digit CROSS JOIN t
"""


@register("benford_screen", oracle=BENFORD_ORACLE)
def benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud analytics (the reference's domain, H-family adjacent):
    Benford's-law leading-digit screen over order totals — fabricated
    amounts flunk the log-distribution, so per-digit chi-squared
    contributions are the standard first-pass forensic test. The
    leading digit is taken through an explicit floor before the
    BIGINT cast (Spark's decimal->long cast truncates while DuckDB's
    ROUNDS — and decimal string formatting differs too); expectations use the
    module-literal log10 probabilities shared with the oracle; chi2
    contributions are nano-quantized after identical IEEE arithmetic.
    Two tiny aggregations (9-row digit counts + a 1-row total,
    broadcast back) — scan-bound at any scale."""
    orders = table(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    total = d.agg(F.count(F.lit(1)).alias("n"))
    p = spark.createDataFrame(
        [(k, v) for k, v in _BENFORD_P.items()], "digit string, p double"
    )
    j = counts.join(F.broadcast(p), "digit").crossJoin(F.broadcast(total))
    exp = F.col("n") * F.col("p")
    return j.select(
        "digit",
        F.col("observed").cast("long").alias("observed"),
        F.round(exp * 1e9).cast("long").alias("expected_nano"),
        F.round((F.col("observed") - exp) * (F.col("observed") - exp) / exp * 1e9)
        .cast("long")
        .alias("chi2_nano"),
    )




Q18_ORACLE = """
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_custkey,
           o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice
"""


@register("analytic_q18", oracle=Q18_ORACLE)
def analytic_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): an IN-subquery over
    a grouped HAVING — planned as a partial-agg'd per-order quantity
    rollup whose survivors SEMI-restrict the fact before the customer
    join. The big-order relation is tiny after the threshold, so it
    broadcasts into the semi join; quantities sum as exact integers,
    prices as cents."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q__"))
        .filter(F.col("__q__") > 300)
        .select("l_orderkey")
    )
    restricted = li.join(F.broadcast(big), "l_orderkey", "left_semi")
    return (
        restricted.join(orders, restricted["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty")
        )
        .select(
            "c_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
    )


CORR_MIN_ORACLE = """
    SELECT p.p_partkey, p.p_type,
           CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents
    FROM part p
    WHERE p.p_retailprice = (
      SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
    )
"""


@register("correlated_min_subquery", oracle=CORR_MIN_ORACLE)
def correlated_min_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-scalar-subquery shape: rows matching
    their group's minimum. Decorrelated the way Catalyst itself
    would — ONE window min over the correlation key instead of a
    per-row subquery execution; equality on DECIMAL is exact so the
    filter is engine-portable."""
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("__min__", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("__min__"))
        .select(
            "p_partkey",
            "p_type",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        )
    )




RFM_ORACLE = """
    SELECT o_custkey,
           CAST(max_by(o_orderkey, strftime(o_orderdate, '%Y%m%d') || '-' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS BIGINT) AS last_orderkey,
           CAST(max(o_orderdate) AS VARCHAR) AS last_orderdate,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
    FROM orders GROUP BY o_custkey
"""


@register("customer_rfm", oracle=RFM_ORACLE)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mart analytics: recency/frequency/monetary per customer in ONE
    window-free aggregation — ``max_by`` keyed on a
    lexicographic (date, zero-padded orderkey) string picks the
    latest order deterministically (the tiebreak rides the
    comparison key, not a row_number sort; DuckDB's max_by takes no
    composite key, so both engines share the string encoding), so the whole scoring scan
    is partial-aggregatable: each map task contributes one row per
    customer, no whole-table window sort ever happens. Exact cents;
    dates rendered as ISO strings (identical on both engines)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.max_by(
            F.col("o_orderkey"),
            F.concat(
                F.date_format("o_orderdate", "yyyyMMdd"),
                F.lit("-"),
                F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
            ),
        )
        .cast("long")
        .alias("last_orderkey"),
        F.max("o_orderdate").cast("string").alias("last_orderdate"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )


Q21_ORACLE = """
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    ),
    blame AS (
      SELECT t.l_orderkey, t.l_suppkey FROM late t
      WHERE EXISTS (
        SELECT 1 FROM pairs p
        WHERE p.l_orderkey = t.l_orderkey AND p.l_suppkey <> t.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l2
        WHERE l2.l_orderkey = t.l_orderkey AND l2.l_suppkey <> t.l_suppkey
      )
    )
    SELECT b.l_suppkey AS s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM blame b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    GROUP BY b.l_suppkey, s.s_name
"""


@register("analytic_q21_blame_supplier", oracle=Q21_ORACLE)
def analytic_q21_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape (suppliers who kept orders waiting), adapted
    to this schema's dates: a supplier is BLAMED for an order when it
    shipped late (l_shipdate > o_orderdate + 60 days), the order had
    ANOTHER supplier (EXISTS → left-semi on the order key with a
    supp-inequality residual), and NO OTHER supplier shipped it late
    (NOT EXISTS → left-anti, same shape). This is the classic
    hardest-to-decorrelate TPC-H query: two correlated subqueries
    against the same fact, planned here as two hash joins on the
    order key with the inequality as a join residual — the late-pair
    relation is distinct-collapsed BEFORE the self-joins, so each leg
    shuffles O(late pairs), never O(lineitems)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    p2 = pairs.select(
        F.col("l_orderkey").alias("__o__"), F.col("l_suppkey").alias("__s__")
    )
    l2 = late.select(
        F.col("l_orderkey").alias("__o__"), F.col("l_suppkey").alias("__s__")
    )
    blame = late.join(
        p2,
        (late["l_orderkey"] == p2["__o__"]) & (late["l_suppkey"] != p2["__s__"]),
        "left_semi",
    ).join(
        l2,
        (late["l_orderkey"] == l2["__o__"]) & (late["l_suppkey"] != l2["__s__"]),
        "left_anti",
    )
    return (
        blame.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("numwait").cast("long").alias("numwait"))
    )


Q20_ORACLE = """
    WITH qualifying AS (
      SELECT l_suppkey, l_partkey
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 's%')
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 60
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS n_heavy_parts
    FROM qualifying q JOIN supplier s ON s.s_suppkey = q.l_suppkey
    GROUP BY s.s_suppkey, s.s_name
"""


@register("analytic_q20_heavy_suppliers", oracle=Q20_ORACLE)
def analytic_q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20's nested-IN shape (suppliers with heavy volume on a
    part family): the inner IN (name-prefix part filter — pushed to
    the part scan as StringStartsWith) broadcast-SEMI-restricts the
    fact, a grouped HAVING keeps (supplier, part) pairs over the
    volume threshold, and the outer IN collapses to a per-supplier
    count joined against the broadcast supplier dim. Every subquery
    level becomes a join stage with the fact shuffled exactly once,
    on the aggregation key."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supp = table(spark, sf_dir, "supplier")
    fam = part.filter(F.col("p_name").startswith("s")).select("p_partkey")
    qualifying = (
        li.join(F.broadcast(fam), li["l_partkey"] == fam["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__q__"))
        .filter(F.col("__q__") > 60)
    )
    return (
        qualifying.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_heavy_parts"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_heavy_parts").cast("long").alias("n_heavy_parts"),
        )
    )


Q17_ORACLE = """
    WITH agg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qc,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey,
           CAST(count(*) AS BIGINT) AS n_small,
           CAST(CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) // 7 AS BIGINT)
             AS avg_yearly_cents
    FROM lineitem l
    JOIN agg a ON a.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * a.cnt < a.sum_qc
    GROUP BY l.l_partkey
"""


@register("analytic_q17_small_qty_revenue", oracle=Q17_ORACLE)
def analytic_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's correlated-scalar-average shape (revenue lost to
    small-quantity orders): the per-part ``avg(l_quantity)`` subquery
    decorrelates into ONE grouped aggregate over the fact, and the
    ``qty < 0.2 * avg`` predicate becomes the exact integer
    cross-multiplication ``qty_cents * 5 * cnt < sum_qty_cents`` (no
    float division on either engine — the comparison is order-free
    and hash-stable). The brand filter pushes to the part scan and
    broadcast-restricts BOTH the aggregate and the probe side, so the
    fact is scanned twice but shuffled only on ``l_partkey`` — the
    same key both times, and the per-part aggregate (one row per
    part) broadcasts back to the probe. Revenue ships as exact cents
    floor-divided by 7 (both engines share ``//``-on-BIGINT)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    brand = part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    fact = (
        li.join(F.broadcast(brand), li["l_partkey"] == brand["p_partkey"], "left_semi")
        .select(
            "l_partkey",
            F.round(F.col("l_quantity") * 100).cast("long").alias("__qc__"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("__pc__"),
        )
    )
    agg = fact.groupBy("l_partkey").agg(
        F.sum("__qc__").alias("__sum_qc__"), F.count(F.lit(1)).alias("__cnt__")
    )
    return (
        fact.join(
            F.broadcast(agg.withColumnRenamed("l_partkey", "__pk__")),
            F.col("l_partkey") == F.col("__pk__"),
        )
        .filter(F.col("__qc__") * 5 * F.col("__cnt__") < F.col("__sum_qc__"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_small"),
            # DIV truncates, DuckDB // floors — identical here because
            # the summed cents are non-negative.
            F.expr("CAST(sum(__pc__) DIV 7 AS BIGINT)").alias("avg_yearly_cents"),
        )
    )


Q22_ORACLE = """
    WITH pos AS (
      SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_c,
             count(*) AS cnt
      FROM customer WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11)
    )
    SELECT c.c_nationkey AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11)
      AND CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.cnt > pos.sum_c
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
      )
    GROUP BY c.c_nationkey
"""


@register("analytic_q22_global_sales_opportunity", oracle=Q22_ORACLE)
def analytic_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape (well-funded customers in target countries
    with no sales activity), adapted to this schema: the country-code
    substring filter becomes a nationkey IN-list, and — because this
    dataset has no order-less customers — the NOT EXISTS leg excludes
    customers with any LARGE order (>450k) instead of any order at
    all, preserving the anti-join. The correlated scalar
    ``avg(c_acctbal)`` decorrelates into ONE global aggregate
    (sum_cents, count) carried as a 1-row broadcast cross join, and
    the ``bal > avg`` predicate is the exact integer cross-multiply
    ``bal_cents * cnt > sum_cents`` — order-free on both engines. The
    anti join shuffles only the distinct big-order customer keys; the
    customer scan keeps its IN-list pushed down."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    nations = [1, 3, 5, 7, 9, 11]
    tgt = cust.filter(F.col("c_nationkey").isin(nations)).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("__bc__"),
    )
    pos = tgt.filter(F.col("__bc__") > 0).agg(
        F.sum("__bc__").cast("long").alias("__sum_c__"),
        F.count(F.lit(1)).alias("__cnt__"),
    )
    big = orders.filter(F.col("o_totalprice") > 450000).select("o_custkey")
    return (
        tgt.crossJoin(F.broadcast(pos))
        .filter(F.col("__bc__") * F.col("__cnt__") > F.col("__sum_c__"))
        .join(big, F.col("c_custkey") == big["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("__bc__").cast("long").alias("totacctbal_cents"),
        )
    )


WINNOW_ORACLE = """
    WITH g AS (
      SELECT doc_id,
             [ (CAST(ascii(substr(text, p, 1)) AS BIGINT) * 27512614111
              + CAST(ascii(substr(text, p + 1, 1)) AS BIGINT) * 887503681
              + CAST(ascii(substr(text, p + 2, 1)) AS BIGINT) * 28629151
              + CAST(ascii(substr(text, p + 3, 1)) AS BIGINT) * 923521
              + CAST(ascii(substr(text, p + 4, 1)) AS BIGINT) * 29791
              + CAST(ascii(substr(text, p + 5, 1)) AS BIGINT) * 961
              + CAST(ascii(substr(text, p + 6, 1)) AS BIGINT) * 31
              + ascii(substr(text, p + 7, 1))) % 1000000007
                * 2097152 + (2097151 - p)
               for p in range(1, greatest(length(text) - 7, 0) + 1) ] AS packed
      FROM documents
    ),
    fp AS (
      SELECT doc_id,
             list_distinct([
               list_aggregate(list_slice(packed, q, q + 3), 'min') // 2097152
               for q in range(1, greatest(len(packed) - 3, 0) + 1)
             ]) AS fps
      FROM g
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(coalesce(list_sum(fps), 0) AS BIGINT) AS fp_sum
    FROM fp
"""


@register("winnowing_fingerprint", oracle=WINNOW_ORACLE)
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: robust winnowing (Schleimer/Wilkerson/Aiken, the MOSS
    fingerprint): polynomial-hash every char 8-gram (base 31, mod
    1e9+7 — exact BIGINT arithmetic, identical on both engines), then
    slide a window of 4 consecutive gram hashes and keep the minimum
    of each window, rightmost-on-ties (the tiebreak rides a packed
    ``hash * 2^21 + (2^21-1-pos)`` key, so ``min`` alone selects it).
    The guarantee: any shared substring of >= 11 chars between two
    documents yields at least one shared fingerprint, with ~2/(w+1)
    of grams selected — the local-dedup primitive between
    full-shingle Jaccard (too big) and one-hash-per-doc
    (``doc_fingerprint``, too coarse).

    Runs as the Arrow-vectorized ``winnow_fingerprints``
    (``operators/text.py``): per-row independent, zero shuffles. The
    pure-builtin spelling (aggregate/transform fold over the packed
    gram array — structurally the oracle below) is correct but
    interpreted per element and measured ~20x slower; the operator
    docstring records the tradeoff."""
    docs = table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, "doc_id", "text", k=8, window=4)


WINNOW_PAIRS_ORACLE = """
    WITH g AS (
      SELECT doc_id,
             [ (CAST(ascii(substr(text, p, 1)) AS BIGINT) * 27512614111
              + CAST(ascii(substr(text, p + 1, 1)) AS BIGINT) * 887503681
              + CAST(ascii(substr(text, p + 2, 1)) AS BIGINT) * 28629151
              + CAST(ascii(substr(text, p + 3, 1)) AS BIGINT) * 923521
              + CAST(ascii(substr(text, p + 4, 1)) AS BIGINT) * 29791
              + CAST(ascii(substr(text, p + 5, 1)) AS BIGINT) * 961
              + CAST(ascii(substr(text, p + 6, 1)) AS BIGINT) * 31
              + ascii(substr(text, p + 7, 1))) % 1000000007
                * 2097152 + (2097151 - p)
               for p in range(1, greatest(length(text) - 7, 0) + 1) ] AS packed
      FROM documents
    ),
    rows_ AS (
      SELECT doc_id,
             unnest(list_distinct([
               list_aggregate(list_slice(packed, q, q + 3), 'min') // 2097152
               for q in range(1, greatest(len(packed) - 3, 0) + 1)
             ])) AS fp
      FROM g
    ),
    capped AS (
      SELECT doc_id, fp FROM (
        SELECT doc_id, fp,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM rows_
      ) WHERE rn <= 32
    ),
    counts AS (SELECT doc_id, count(*) AS nfp FROM rows_ GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM capped a JOIN rows_ b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.id_a, p.id_b, p.n_shared,
           CAST(100 * p.n_shared // least(ca.nfp, cb.nfp) AS BIGINT)
             AS containment_pct
    FROM pairs p
    JOIN counts ca ON ca.doc_id = p.id_a
    JOIN counts cb ON cb.doc_id = p.id_b
    WHERE 100 * p.n_shared // least(ca.nfp, cb.nfp) >= 50
"""


@register("winnow_dedup_pairs", oracle=WINNOW_PAIRS_ORACLE)
def winnow_dedup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: fingerprint-overlap near-dup pairs — the DETERMINISTIC
    complement to MinHash-LSH (``near_dedup_minhash``). Winnowing's
    detection guarantee makes recall structural: any pair sharing a
    verbatim substring of >= 11 chars shares a fingerprint, so
    near-dup pairs surface without a probabilistic band threshold;
    precision comes from the fingerprint-containment ratio
    (shared // min(|fps|) >= 50% — planted near-dups sit >= 50%,
    the boilerplate noise floor under 35%). The pair join is an inverted-index self-join per
    fingerprint (never all-pairs); hot boilerplate fingerprints are
    capped on the pair-source side (lowest-32 ids, same
    ``cap_bucket_side`` guard as the LSH family, overflow reported)
    — the oracle replicates the cap exactly via the same
    deterministic row_number ranking."""
    docs = table(spark, sf_dir, "documents")
    return winnow_dedup_pairs(
        docs, "doc_id", "text", min_containment_pct=50, max_posting=32
    )


NB_ORACLE = """
    WITH toks AS (
      SELECT doc_id, lang, t AS term, count(*) AS tf FROM (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
      WHERE t <> ''
      GROUP BY doc_id, lang, t
    ),
    counts AS (
      SELECT lang, term, CAST(SUM(tf) AS BIGINT) AS c
      FROM toks GROUP BY lang, term
    ),
    class_totals AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS t_c FROM counts GROUP BY lang
    ),
    vocab AS (SELECT count(DISTINCT term) AS v FROM toks),
    priors AS (
      SELECT lang, count(DISTINCT doc_id) AS d_c FROM toks GROUP BY lang
    ),
    total AS (SELECT CAST(SUM(d_c) AS BIGINT) AS d FROM priors),
    grid AS (
      SELECT t.term, ct.lang,
             CAST(round(ln((COALESCE(c.c, 0) + 1.0) / (ct.t_c + v.v))
                        * 1000000000.0) AS BIGINT) AS logp_q
      FROM (SELECT DISTINCT term FROM toks) t
      CROSS JOIN class_totals ct CROSS JOIN vocab v
      LEFT JOIN counts c ON c.term = t.term AND c.lang = ct.lang
    ),
    scores AS (
      SELECT tk.doc_id, tk.lang AS actual_lang, g.lang AS cand,
             CAST(SUM(tk.tf * g.logp_q) AS BIGINT)
             + any_value(CAST(round(ln(CAST(p.d_c AS DOUBLE) / t.d)
                                    * 1000000000.0) AS BIGINT)) AS score_q
      FROM toks tk
      JOIN grid g ON g.term = tk.term
      JOIN priors p ON p.lang = g.lang
      CROSS JOIN total t
      GROUP BY tk.doc_id, tk.lang, g.lang
    ),
    pred AS (
      SELECT actual_lang, cand AS predicted_lang FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score_q DESC, cand) AS rn
        FROM scores
      ) WHERE rn = 1
    )
    SELECT actual_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2
"""


@register("nb_lang_classifier", oracle=NB_ORACLE)
def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained AND applied as one dataflow —
    the train-a-model-in-the-engine pattern (quality/domain/language
    classifiers over a 100 TB corpus train exactly like this: the
    "model" is a (term, class, log-prob) relation, never a
    driver-side object). Laplace-smoothed token likelihoods and class
    priors are quantized-ln BIGINTs (the tfidf_top_terms playbook) so
    scores sum order-free and hash-identically on both engines;
    argmax per doc is a C-row window with a lexicographic tiebreak.
    Output is the confusion matrix (actual x predicted counts) of
    self-classification by ``lang``.

    Scale shape: two token-keyed aggregations (tf, counts), the V x C
    smoothing grid built by cross-joining the distinct-term relation
    with the C-row class totals (left join fills zeros — a term
    absent from a class still contributes ln(1/(T_c+V))), one
    term-keyed score join, one doc-keyed sum + argmax window. No
    driver-side model state, no collect; C is the only small
    constant."""
    docs = table(spark, sf_dir, "documents")
    toks = nb_tokens(docs, "doc_id", "text", "lang")
    counts, priors = nb_token_counts(docs, "doc_id", "text", "lang")
    class_totals = counts.groupBy("lang").agg(F.sum("c").cast("long").alias("t_c"))
    vocab = toks.agg(F.countDistinct("term").alias("v"))
    total = priors.agg(F.sum("d_c").cast("long").alias("d"))
    terms = toks.select("term").distinct()
    grid = (
        terms.crossJoin(F.broadcast(class_totals))
        .crossJoin(F.broadcast(vocab))
        .join(
            counts.select(
                F.col("term").alias("__t__"), F.col("lang").alias("__l__"), "c"
            ),
            (F.col("term") == F.col("__t__")) & (F.col("lang") == F.col("__l__")),
            "left",
        )
        .select(
            "term",
            "lang",
            F.expr(
                "CAST(round(ln((COALESCE(c, 0) + 1.0) / (t_c + v))"
                " * 1000000000.0) AS BIGINT)"
            ).alias("logp_q"),
        )
    )
    prior_q = (
        priors.crossJoin(F.broadcast(total))
        .select(
            F.col("lang").alias("cand"),
            F.expr(
                "CAST(round(ln(CAST(d_c AS DOUBLE) / d) * 1000000000.0)"
                " AS BIGINT)"
            ).alias("prior_q"),
        )
    )
    scores = (
        toks.join(
            grid.select(
                F.col("term").alias("__t__"), F.col("lang").alias("cand"), "logp_q"
            ),
            F.col("term") == F.col("__t__"),
        )
        .groupBy("doc_id", F.col("lang").alias("actual_lang"), "cand")
        .agg(F.sum(F.col("tf") * F.col("logp_q")).cast("long").alias("__s__"))
        .join(F.broadcast(prior_q), "cand")
        .withColumn("score_q", F.col("__s__") + F.col("prior_q"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_q").desc(), F.col("cand"))
    pred = scores.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return pred.groupBy(
        "actual_lang", F.col("cand").alias("predicted_lang")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


Q15_ORACLE = """
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(round(l_extendedprice * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01'
        AND l_shipdate < DATE '1995-04-01'
      GROUP BY l_suppkey
    ),
    mx AS (SELECT CAST(MAX(rev_c) AS BIGINT) AS m FROM revenue)
    SELECT s.s_suppkey, s.s_name, r.rev_c AS total_revenue_c
    FROM revenue r
    CROSS JOIN mx
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_c = mx.m
"""


@register("analytic_q15_top_supplier", oracle=Q15_ORACLE)
def analytic_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15's view-plus-scalar-max shape (the top supplier(s) by
    windowed revenue): the revenue "view" is one grouped aggregate
    over the date-filtered fact (filter pushed to the scan), the
    scalar MAX over it is a 1-row global aggregate broadcast-crossed
    back onto the view (the benign NLJ shape the plan audit
    classifies), and the equality keeps every supplier tied at the
    max — exactly the Q15 subtlety (the spec's equality, not a
    LIMIT 1, so ties all surface). Revenue is exact integer cents of
    price*(100 - discount_pct), avoiding the float product both
    engines would round differently."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-04-01"))
        )
        .select(
            "l_suppkey",
            F.round(
                F.col("l_extendedprice")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            )
            .cast("long")
            .alias("__rc__"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("__rc__").cast("long").alias("rev_c"))
    )
    mx = revenue.agg(F.max("rev_c").cast("long").alias("__m__"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_c") == F.col("__m__"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("rev_c").alias("total_revenue_c"))
    )


__all__ = ["QUERIES", "ORACLES"]
