"""Data-mining tier: market-basket co-occurrence, Pareto skyline,
hybrid-retrieval rank fusion, and multi-source BFS.

Beyond-reference analytics shapes a warehouse engine is expected to
answer (the reference's single fraud pipeline has no equivalent —
capability parity here is with the §2.F/§2.K "general analytics over
the TPC-H-ish tables" tier established in earlier rounds; reference
scope per ``main.py:1-479``).

Determinism playbook (same as the rest of the registry): every
derived metric is integer (scaled-nano floor divisions, counts,
ranks); the only doubles are comparisons of values computed by the
IDENTICAL expression tree on both engines (BM25's quantized-ln
scores, raw parquet doubles), so ordering cannot diverge; every
ordering carries an integer tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._base import make_registry, table
from ..operators.mining import cooccurrence_pairs, pareto_skyline_2d
from ..operators.similarity import cosine_topk_bruteforce, cosine_topk_ivf
from .extensions import _BM25_TERMS, _bm25_contrib

QUERIES, ORACLES, register = make_registry()


# --------------------------------------------------------------------------
# Market-basket frequent pairs (support + lift)
# --------------------------------------------------------------------------

# Lift in nano units. The floor divisions are applied in this exact
# order on BOTH engines, chosen so no intermediate exceeds int64 even
# at sf1000: support*1e9 <= n_baskets*1e9; //cnt_a bounds it by 1e9
# (support <= min(cnt_a, cnt_b)); *n_baskets stays under 9.2e18 while
# n_baskets < 9.2e9 baskets.
_LIFT_EXPR = (
    "((support * CAST(1000000000 AS BIGINT)) {div} cnt_a)"
    " * n_baskets {div} cnt_b"
)

_FREQUENT_PAIRS_ORACLE = f"""
    WITH b AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS br
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets FROM b),
    cnt AS (SELECT br, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY br),
    pairs AS (
      SELECT a.br AS brand_a, b2.br AS brand_b,
             CAST(count(*) AS BIGINT) AS support
      FROM b a JOIN b b2 ON a.o = b2.o AND a.br < b2.br
      GROUP BY a.br, b2.br
    ),
    joined AS (
      SELECT p.brand_a, p.brand_b, p.support,
             ca.c AS cnt_a, cb.c AS cnt_b, n.n_baskets
      FROM pairs p
      JOIN cnt ca ON ca.br = p.brand_a
      JOIN cnt cb ON cb.br = p.brand_b
      CROSS JOIN n
    )
    SELECT brand_a, brand_b, support,
           {_LIFT_EXPR.format(div="//")} AS lift_nanos
    FROM joined WHERE support >= 5
"""


@register("frequent_pairs", oracle=_FREQUENT_PAIRS_ORACLE)
def frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: brand pairs co-purchased in the same
    order, with support and lift (A-priori's k=2 stage — the
    candidate-pair generation that dominates frequent-itemset mining
    at scale).

    Plan: baskets = one distinct shuffle on (orderkey, brand) after a
    broadcast part-dim join; the pair self-join co-partitions on
    orderkey (bounded fan-out: <=C(25,2) pairs per basket); the pair
    count partial-aggregates map-side into at most |brands|^2 groups;
    per-brand counts (25 rows) and the 1-row basket count broadcast
    into the lift projection. No driver-side state; the widest
    relation ever shuffled is the basket list itself."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("br"))
        .distinct()
    )
    n = b.agg(F.countDistinct("o").cast("long").alias("n_baskets"))
    cnt = b.groupBy("br").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pairs = cooccurrence_pairs(b, "o", "br").select(
        F.col("item_a").alias("brand_a"),
        F.col("item_b").alias("brand_b"),
        "support",
    )
    joined = (
        pairs.join(
            F.broadcast(cnt.select(F.col("br").alias("brand_a"), F.col("c").alias("cnt_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(cnt.select(F.col("br").alias("brand_b"), F.col("c").alias("cnt_b"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return joined.filter(F.col("support") >= 5).select(
        "brand_a",
        "brand_b",
        "support",
        F.expr(_LIFT_EXPR.format(div="DIV")).alias("lift_nanos"),
    )


# --------------------------------------------------------------------------
# Pareto skyline (2-D dominance)
# --------------------------------------------------------------------------

_SKYLINE_ORACLE = """
    SELECT a.p_brand AS brand, a.p_partkey AS partkey,
           a.p_retailprice AS price, CAST(a.p_size AS BIGINT) AS size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_brand = a.p_brand
        AND b.p_retailprice <= a.p_retailprice
        AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
"""


@register("pareto_skyline", oracle=_SKYLINE_ORACLE)
def pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto skyline over (minimize retail price, maximize
    size): parts not strictly dominated within their brand. The
    oracle states the spec as the quadratic NOT EXISTS; the engine
    computes it in O(n log n) — a part is dominated iff a strictly
    cheaper price level reaches its size (prefix running max over
    distinct price levels) or its own price level holds a strictly
    larger size (per-level max).

    Plan and the 100 TB degradation path: see
    :func:`operators.mining.pareto_skyline_2d` (the only per-row
    shuffle is the (brand, price) level groupBy; the prefix window
    runs over the small levels relation, never the part table)."""
    part = table(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("partkey"),
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )
    return pareto_skyline_2d(part, "brand", "price", "size").select(
        "brand", "partkey", "price", "size"
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and cosine ranks
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOPK = 20
_SEM_QUERY_ID = 7


def _rank_fusion_oracle() -> str:
    score = " + ".join(_bm25_contrib(i + 1) for i in range(len(_BM25_TERMS)))
    any_tf = " + ".join(f"tf{i + 1}" for i in range(len(_BM25_TERMS)))
    tfs = ",\n             ".join(
        f"CAST(sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i + 1}"
        for i, t in enumerate(_BM25_TERMS)
    )
    dfs = ",\n             ".join(
        f"CAST(sum(CASE WHEN tf{i + 1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i + 1}"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, t AS term FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
      WHERE t <> ''
    ),
    counts AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
             {tfs}
      FROM toks GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl,
             {dfs}
      FROM counts
    ),
    scored AS (
      SELECT doc_id, {score} AS bm25
      FROM counts, stats WHERE {any_tf} > 0
    ),
    lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS rank_lex
      FROM scored
    ),
    lexk AS (SELECT * FROM lex WHERE rank_lex <= {_RRF_TOPK}),
    expanded AS (
      SELECT vec_id,
             unnest(range(1, len(embedding) + 1)) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, SUM(CAST(round(v * v * 1e8) AS BIGINT)) AS n
      FROM expanded GROUP BY vec_id
    ),
    dots AS (
      SELECT c.vec_id AS neighbor_id,
             SUM(CAST(round(q.v * c.v * 1e8) AS BIGINT)) AS dot_scaled
      FROM expanded q JOIN expanded c ON q.idx = c.idx
      WHERE q.vec_id = {_SEM_QUERY_ID}
      GROUP BY c.vec_id
    ),
    sem AS (
      SELECT d.neighbor_id,
             CAST(row_number() OVER (
               ORDER BY d.dot_scaled / sqrt(CAST(nq.n AS DOUBLE) * CAST(nc.n AS DOUBLE)) DESC,
                        d.neighbor_id
             ) AS BIGINT) AS rank_sem
      FROM dots d
      JOIN norms nc ON nc.vec_id = d.neighbor_id
      CROSS JOIN (SELECT n FROM norms WHERE vec_id = {_SEM_QUERY_ID}) nq
    ),
    semk AS (SELECT * FROM sem WHERE rank_sem <= {_RRF_TOPK})
    SELECT COALESCE(l.doc_id, s.neighbor_id) AS doc_id,
           CAST(COALESCE(l.rank_lex, 0) AS BIGINT) AS rank_lex,
           CAST(COALESCE(s.rank_sem, 0) AS BIGINT) AS rank_sem,
           (CASE WHEN l.rank_lex IS NULL THEN 0
                 ELSE CAST(1000000000 AS BIGINT) // ({_RRF_K} + l.rank_lex) END
            + CASE WHEN s.rank_sem IS NULL THEN 0
                   ELSE CAST(1000000000 AS BIGINT) // ({_RRF_K} + s.rank_sem) END)
             AS rrf_nanos
    FROM lexk l FULL JOIN semk s ON l.doc_id = s.neighbor_id
"""


@register("rank_fusion", oracle=_rank_fusion_oracle())
def rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (RRF, k=60) of a
    lexical BM25 top-20 (terms as in [[bm25_score]]) and a semantic
    cosine top-20 (query = embedding {q}), the standard two-tower
    candidate-merge in retrieval-augmented pipelines. RRF scores are
    nano-scaled integer floor divisions of integer ranks — exact.

    Plan: the BM25 leg is the bm25_score plan (one explode shuffle +
    broadcast 1-row stats) capped by TakeOrdered top-20 (never a
    global sort); the semantic leg reuses cosine_topk_bruteforce
    (broadcast 1-row query, corpus map-side); both legs end k-row,
    so the fusion full-outer join is a trivially small exchange. The
    row_number windows run over <=20-row relations (post-limit), not
    over the corpus."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    counts = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"tf{i + 1}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf{i + 1}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df{i + 1}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = " + ".join(_bm25_contrib(i + 1) for i in range(len(_BM25_TERMS)))
    any_tf = " + ".join(f"tf{i + 1}" for i in range(len(_BM25_TERMS)))
    scored = (
        counts.join(F.broadcast(stats))
        .filter(F.expr(f"{any_tf} > 0"))
        .select("doc_id", F.expr(score).alias("bm25"))
    )
    top_lex = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_RRF_TOPK)
    lexk = top_lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("long")
        .alias("rank_lex"),
    )

    emb = table(spark, sf_dir, "embeddings")
    semk = (
        cosine_topk_bruteforce(
            emb,
            emb.filter(F.col("vec_id") == _SEM_QUERY_ID),
            id_col="vec_id",
            vec_col="embedding",
            k=_RRF_TOPK,
        )
        .select("neighbor_id", F.col("rank").cast("long").alias("rank_sem"))
    )

    fused = lexk.join(
        semk, lexk["doc_id"] == semk["neighbor_id"], "full_outer"
    )
    rrf = (
        f"CASE WHEN rank_lex IS NULL THEN 0"
        f" ELSE CAST(1000000000 AS BIGINT) DIV ({_RRF_K} + rank_lex) END"
        f" + CASE WHEN rank_sem IS NULL THEN 0"
        f" ELSE CAST(1000000000 AS BIGINT) DIV ({_RRF_K} + rank_sem) END"
    )
    return fused.select(
        F.coalesce(F.col("doc_id"), F.col("neighbor_id")).alias("doc_id"),
        F.coalesce(F.col("rank_lex"), F.lit(0)).cast("long").alias("rank_lex"),
        F.coalesce(F.col("rank_sem"), F.lit(0)).cast("long").alias("rank_sem"),
        F.expr(rrf).alias("rrf_nanos"),
    )


rank_fusion.__doc__ = rank_fusion.__doc__.replace("{q}", str(_SEM_QUERY_ID))


# --------------------------------------------------------------------------
# Multi-source BFS (3 unrolled rounds)
# --------------------------------------------------------------------------

_BFS_INF = 999
_BFS_ROUNDS = 3


def _bfs_oracle(rounds: int = _BFS_ROUNDS) -> str:
    blocks = [f"""
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
    d0 AS (
      SELECT node,
             CAST(CASE WHEN node >= 1000000 AND (node - 1000000) % 10 = 0
                  THEN 0 ELSE {_BFS_INF} END AS BIGINT) AS d
      FROM nodes)"""]
    for t in range(rounds):
        blocks.append(f"""
    s{t} AS (
      SELECT e.dst AS node, CAST(min(r.d) + 1 AS BIGINT) AS nd
      FROM edges e JOIN d{t} r ON r.node = e.src
      WHERE r.d < {_BFS_INF}
      GROUP BY e.dst
    ),
    d{t + 1} AS (
      SELECT d.node,
             CAST(least(d.d, COALESCE(s.nd, {_BFS_INF})) AS BIGINT) AS d
      FROM d{t} d LEFT JOIN s{t} s ON s.node = d.node
    )""")
    return (
        "WITH " + ",".join(blocks)
        + f" SELECT node AS node_id, d AS dist FROM d{rounds} WHERE d < {_BFS_INF}"
    )


@register("bfs_distances", oracle=_bfs_oracle())
def bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: shortest hop count (3 unrolled rounds) from
    the seed set (suppliers with suppkey % 10 == 0) over the
    bipartite supplier<->customer trade graph of [[pagerank]].
    Distances are small integers — exact on any engine; the oracle is
    the same recurrence unrolled as CTEs.

    Plan: per round, one join of the O(V) frontier relation to the
    edge list plus one min-aggregation keyed on node — O(E) shuffled
    bytes per round, node-keyed so the rounds reuse the partitioning;
    no driver state beyond the loop counter. A convergence-looped
    variant belongs behind checkpointed iteration like
    dedup_clusters; the fixed round count keeps the plan finite and
    the oracle unrollable."""
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
    d = nodes.select(
        "node",
        F.expr(
            f"CAST(CASE WHEN node >= 1000000 AND (node - 1000000) % 10 = 0"
            f" THEN 0 ELSE {_BFS_INF} END AS BIGINT)"
        ).alias("d"),
    )
    for _ in range(_BFS_ROUNDS):
        frontier = (
            edges.join(d.filter(F.col("d") < _BFS_INF), edges["src"] == F.col("node"))
            .groupBy("dst")
            .agg((F.min("d") + 1).cast("long").alias("nd"))
        )
        d = (
            d.join(frontier, d["node"] == frontier["dst"], "left")
            .select(
                "node",
                F.least(F.col("d"), F.coalesce(F.col("nd"), F.lit(_BFS_INF)))
                .cast("long")
                .alias("d"),
            )
        )
    return d.filter(F.col("d") < _BFS_INF).select(
        F.col("node").alias("node_id"), F.col("d").alias("dist")
    )


# --------------------------------------------------------------------------
# ANN quality measurement: IVF recall against exact brute force
# --------------------------------------------------------------------------

_IVF_RECALL_ORACLE = """
    WITH expanded AS (
      SELECT vec_id,
             unnest(range(1, len(embedding) + 1)) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, SUM(CAST(round(v * v * 1e8) AS BIGINT)) AS n
      FROM expanded GROUP BY vec_id
    ),
    cdots AS (
      SELECT e.vec_id, c.vec_id AS cid,
             SUM(CAST(round(e.v * c.v * 1e8) AS BIGINT)) AS dot
      FROM expanded e JOIN expanded c ON e.idx = c.idx
      WHERE c.vec_id < 8
      GROUP BY e.vec_id, c.vec_id
    ),
    assigned AS (
      SELECT vec_id, cid AS bucket FROM (
        SELECT d.vec_id, d.cid,
               row_number() OVER (
                 PARTITION BY d.vec_id
                 ORDER BY d.dot / sqrt(CAST(nv.n AS DOUBLE) * CAST(nc.n AS DOUBLE)) DESC,
                          d.cid
               ) AS rn
        FROM cdots d
        JOIN norms nv ON nv.vec_id = d.vec_id
        JOIN norms nc ON nc.vec_id = d.cid
      ) WHERE rn = 1
    ),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             SUM(CAST(round(q.v * c.v * 1e8) AS BIGINT)) AS dot_scaled
      FROM expanded q JOIN expanded c ON q.idx = c.idx
      WHERE q.vec_id >= 100 AND q.vec_id < 105
      GROUP BY q.vec_id, c.vec_id
    ),
    exact5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT d.query_id, d.neighbor_id,
               row_number() OVER (
                 PARTITION BY d.query_id
                 ORDER BY d.dot_scaled / sqrt(CAST(nq.n AS DOUBLE) * CAST(nc.n AS DOUBLE)) DESC,
                          d.neighbor_id
               ) AS rank
        FROM dots d
        JOIN norms nq ON nq.vec_id = d.query_id
        JOIN norms nc ON nc.vec_id = d.neighbor_id
      ) WHERE rank <= 5
    ),
    ivf5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT d.query_id, d.neighbor_id,
               row_number() OVER (
                 PARTITION BY d.query_id
                 ORDER BY d.dot_scaled / sqrt(CAST(nq.n AS DOUBLE) * CAST(nc.n AS DOUBLE)) DESC,
                          d.neighbor_id
               ) AS rank
        FROM dots d
        JOIN assigned aq ON aq.vec_id = d.query_id
        JOIN assigned ac ON ac.vec_id = d.neighbor_id AND ac.bucket = aq.bucket
        JOIN norms nq ON nq.vec_id = d.query_id
        JOIN norms nc ON nc.vec_id = d.neighbor_id
      ) WHERE rank <= 5
    ),
    hits AS (
      SELECT i.query_id, CAST(count(*) AS BIGINT) AS matched
      FROM ivf5 i JOIN exact5 e
        ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
      GROUP BY i.query_id
    )
    SELECT q.vec_id AS query_id,
           CAST(COALESCE(h.matched, 0) AS BIGINT) AS matched,
           CAST(COALESCE(h.matched, 0) * 1000 // 5 AS BIGINT) AS recall_milli
    FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 100 AND vec_id < 105) q
    LEFT JOIN hits h ON h.query_id = q.vec_id
"""


@register("ivf_recall", oracle=_IVF_RECALL_ORACLE)
def ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement IN-ENGINE: recall@5 of the
    single-probe IVF search ([[similarity_ivf]]) against the exact
    brute-force ranking ([[similarity_topk]]) for the same query set
    — the completeness metric every approximate index must report
    before it replaces the exact path in a pipeline. Counts are
    integers; recall is milli-units via floor division — exact.

    Plan: both legs reuse the K3 operators (broadcast-bounded query
    side, cell-restricted IVF join); the comparison itself is a
    left-semi join of two k-row-per-query relations plus a count —
    negligible next to the searches. At scale, recall is estimated
    over a SAMPLED query set precisely because the exact leg is
    brute-force; the query-set probe in cosine_topk_bruteforce
    enforces that boundedness."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105))
    exact = cosine_topk_bruteforce(
        emb, queries, id_col="vec_id", vec_col="embedding", k=5
    ).select("query_id", "neighbor_id")
    approx = cosine_topk_ivf(
        emb,
        queries,
        centroids=emb.filter(F.col("vec_id") < 8),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    ).select("query_id", "neighbor_id")
    hits = (
        approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("matched"))
    )
    return (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("matched"), F.lit(0)).cast("long").alias("matched"),
            F.expr(
                "CAST(COALESCE(matched, 0) * 1000 DIV 5 AS BIGINT)"
            ).alias("recall_milli"),
        )
    )


# --------------------------------------------------------------------------
# Weighted shortest paths, bounded hops (Bellman-Ford relaxation)
# --------------------------------------------------------------------------

_SSSP_INF = 1 << 60
_SSSP_ROUNDS = 3


def _sssp_oracle(rounds: int = _SSSP_ROUNDS) -> str:
    blocks = [f"""
    pairs AS (
      SELECT l.l_suppkey + 1000000 AS s_node, o.o_custkey AS c_node,
             CAST(min(round(l.l_extendedprice * 100)) AS BIGINT) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT s_node AS src, c_node AS dst, w FROM pairs
      UNION ALL
      SELECT c_node AS src, s_node AS dst, w FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    d0 AS (
      SELECT node,
             CAST(CASE WHEN node >= 1000000 AND (node - 1000000) % 10 = 0
                  THEN 0 ELSE {_SSSP_INF} END AS BIGINT) AS d
      FROM nodes)"""]
    for t in range(rounds):
        blocks.append(f"""
    s{t} AS (
      SELECT e.dst AS node, CAST(min(r.d + e.w) AS BIGINT) AS nd
      FROM edges e JOIN d{t} r ON r.node = e.src
      WHERE r.d < {_SSSP_INF}
      GROUP BY e.dst
    ),
    d{t + 1} AS (
      SELECT d.node,
             CAST(least(d.d, COALESCE(s.nd, {_SSSP_INF})) AS BIGINT) AS d
      FROM d{t} d LEFT JOIN s{t} s ON s.node = d.node
    )""")
    return (
        "WITH " + ",".join(blocks)
        + f" SELECT node AS node_id, d AS dist_cents FROM d{rounds}"
        f" WHERE d < {_SSSP_INF}"
    )


@register("sssp_bounded_hops", oracle=_sssp_oracle())
def sssp_bounded_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source(-set) shortest paths, Bellman-Ford
    relaxation unrolled {rounds} hops — the WEIGHTED sibling of
    [[bfs_distances]]: edge weight = cheapest traded lineitem between
    a supplier and customer in exact cents, d_{{t+1}}(v) =
    min(d_t(v), min_u d_t(u) + w(u,v)). Distances stay exact BIGINT
    cent sums (3 hops ≤ 3·10^7 cents — no float, no overflow).

    Plan shape is the BFS one: per round ONE edges⋈frontier join and
    ONE node-keyed min-aggregation, O(E) shuffled bytes per round,
    node-keyed partitioning reused across rounds; fixed rounds keep
    the plan finite and the oracle unrollable (a convergence loop
    belongs behind checkpointed iteration like dedup_clusters)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            (F.col("l_suppkey") + 1000000).alias("src"),
            F.col("o_custkey").alias("dst"),
        )
        .agg(
            F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("w")
        )
    )
    edges = pairs.unionByName(
        pairs.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w")
        )
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    d = nodes.select(
        "node",
        F.expr(
            f"CAST(CASE WHEN node >= 1000000 AND (node - 1000000) % 10 = 0"
            f" THEN 0 ELSE {_SSSP_INF} END AS BIGINT)"
        ).alias("d"),
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = (
            edges.join(
                d.filter(F.col("d") < _SSSP_INF), edges["src"] == F.col("node")
            )
            .groupBy("dst")
            .agg(F.min(F.col("d") + F.col("w")).cast("long").alias("nd"))
        )
        d = d.join(relaxed, d["node"] == relaxed["dst"], "left").select(
            "node",
            F.least(F.col("d"), F.coalesce(F.col("nd"), F.lit(_SSSP_INF)))
            .cast("long")
            .alias("d"),
        )
    return d.filter(F.col("d") < _SSSP_INF).select(
        F.col("node").alias("node_id"), F.col("d").alias("dist_cents")
    )
