"""Similarity search over embedding columns (SURVEY.md §2.K K3).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
variant as the scale path. All arithmetic is JVM-side array
expressions (``zip_with`` + ``aggregate``) — no Python in the loop.

Determinism: per-element products are scaled to integers
(``round(x*y*1e8)``) and summed as BIGINT. IEEE multiply of
identical inputs is bit-identical everywhere and integer addition is
order-independent, so a 1000-executor run hash-matches a
single-threaded oracle — float accumulation order can never skew a
result. The scale factor gives ~8 significant digits, ample for
ranking unit-normalized embeddings.

Scale design: brute force is a broadcast of the (small) query set
against a partitioned corpus — embarrassingly parallel, no shuffle
of the corpus. When the query set is large, the LSH variant buckets
both sides by random-hyperplane signs so the join is per-bucket.
For billion-vector corpora, the same skeleton takes an IVF
assignment (precomputed centroid per row, groupBy centroid) — the
bucketing column is pluggable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = int(1e8)

#: broadcast ceiling for the query side of the brute-force paths.
#: The BroadcastNestedLoopJoin those plans produce is safe ONLY while
#: |Q| is bounded — 65536 query vectors × a few-hundred-float payload
#: is tens of MB, comfortably inside executor broadcast budgets;
#: beyond it the "small by definition" assumption is broken and the
#: plan must not silently ship an unbounded relation to every task.
DEFAULT_MAX_QUERY_ROWS = 65536


def _probe_query_rows(
    queries: DataFrame, max_query_rows: int | None, fn_name: str
) -> None:
    """Fail-fast guard on the bounded-|Q| contract (mirrors the dedup
    broadcast auto-probe): count AT MOST ``max_query_rows + 1`` rows
    of the query side — ``limit(n+1).count()`` stops scanning at the
    bound, so the probe costs O(bound) regardless of how large the
    relation actually is — and raise before the plan is built when
    the bound is exceeded. ``max_query_rows=None`` skips the probe
    (caller asserts boundedness by construction, e.g. a k-row
    centroid batch)."""
    if max_query_rows is None:
        return
    n = queries.limit(max_query_rows + 1).count()
    if n > max_query_rows:
        raise ValueError(
            f"{fn_name}: query side exceeds max_query_rows={max_query_rows} "
            "— the broadcast nested-loop plan is only safe for bounded "
            "query batches. Split the batch, route through the bucketed "
            "path (cosine_topk_lsh with broadcast_queries=False, or IVF "
            "cells via group_col), or raise max_query_rows deliberately."
        )


def _dot_scaled(a: Column, b: Column) -> Column:
    """Σ round(a_i * b_i * SCALE) as BIGINT — exact, order-free."""
    prods = F.zip_with(
        a, b, lambda x, y: F.round(x.cast("double") * y.cast("double") * SCALE).cast("long")
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _norm_scaled(a: Column) -> Column:
    sq = F.transform(
        a, lambda x: F.round(x.cast("double") * x.cast("double") * SCALE).cast("long")
    )
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_query_rows: int | None = DEFAULT_MAX_QUERY_ROWS,
    on_overflow: str = "raise",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Output: (query_id, neighbor_id, rank, dot_scaled) — integer
    evidence columns, rank tie-broken by neighbor id. The query side
    is broadcast; the corpus streams through map-side; the only
    shuffle is the per-query top-k window over k·|Q| survivors.

    The broadcast is guarded by an explicit |Q| probe
    (:func:`_probe_query_rows`): ``on_overflow="raise"`` (default)
    fails fast when the query side exceeds ``max_query_rows``;
    ``on_overflow="lsh"`` falls back to the bucketed
    :func:`cosine_topk_lsh` path with a SHUFFLE join (no broadcast) —
    the scale shape for query sets too large to ship to every task,
    at the documented cost of approximate recall (the fallback is
    opt-in precisely because it trades exactness).
    """
    if max_query_rows is not None:
        if on_overflow not in ("raise", "lsh"):
            raise ValueError(f"on_overflow must be 'raise' or 'lsh', got {on_overflow!r}")
        try:
            _probe_query_rows(queries, max_query_rows, "cosine_topk_bruteforce")
        except ValueError:
            if on_overflow == "raise":
                raise
            dim = queries.select(F.size(F.col(vec_col))).first()[0]
            return cosine_topk_lsh(
                corpus,
                queries,
                planes=md5_planes(16, dim),
                id_col=id_col,
                vec_col=vec_col,
                k=k,
                broadcast_queries=False,
            )
    # Norms computed ONCE per vector before the join (not per pair),
    # and the dot product once per pair — the per-pair work is a
    # single zip_with/aggregate pass.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
        _norm_scaled(F.col(vec_col)).alias("__qn__"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv__"),
        _norm_scaled(F.col(vec_col)).alias("__cn__"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("dot_scaled", _dot_scaled(F.col("__qv__"), F.col("__cv__")))
        .withColumn(
            "__cos__",
            F.col("dot_scaled")
            / F.sqrt(F.col("__qn__").cast("double") * F.col("__cn__").cast("double")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos__").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_scaled")
    )


def assign_centroid(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "vec_id",
    centroid_vec_col: str = "embedding",
    bucket_col: str = "bucket",
    n_probe: int = 1,
) -> DataFrame:
    """IVF assignment: nearest centroid by cosine (scaled-int exact;
    ties → lowest centroid id).

    CONTRACT: ``id_col`` must be row-unique in ``df`` — the argmax is
    a ``groupBy(id_col)``, so duplicate ids would collapse to one
    output row with carried columns mixed nondeterministically by
    ``F.first`` (every caller here — semantic_dedup, IVF build/search —
    feeds a unique vector id; pass ``monotonically_increasing_id`` as
    the id when the input can carry duplicates).

    A PURE NARROW MAP: the centroid relation is k rows BY DEFINITION
    (k ≤ a few hundred for IVF cells — same argument as the PQ
    codebook), so it is collected and inlined as literals, and the
    argmax is ``array_min`` over ``struct(-cos, cid)`` — struct
    ordering gives highest cosine, ties to the lowest centroid id.
    Zero joins, zero shuffles, zero windows: the earlier
    crossJoin + row_number formulation shuffled and sorted corpus×k
    ROWS for the argmax, which at a billion vectors × 1024 cells is a
    trillion-row exchange — the exact plan shape this engine bans.
    (For k in the many thousands, assign hierarchically: two narrow
    passes over √k coarse then fine centroids.)

    ``n_probe > 1`` keeps the n nearest centroids via array_sort +
    slice + ONE bounded explode (n_probe rows per vector) — the
    standard multi-probe recall knob for the QUERY side of an IVF
    search; corpus rows are always stored under their single nearest
    cell."""
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("__cid__"),
            F.col(centroid_vec_col).alias("__cv__"),
        )
    )
    cos = (
        _dot_scaled(F.col(vec_col), F.col("__cv__"))
        / F.sqrt(
            _norm_scaled(F.col(vec_col)).cast("double")
            * _norm_scaled(F.col("__cv__")).cast("double")
        )
    )
    # The k-way fanout stays a broadcast nested-loop over the k-row
    # literal side (one flat codegen'd dot per fanout row — measured
    # 3-4× faster than k HOF dots unrolled or looped in ONE projection,
    # which fall out of whole-stage codegen). The argmax is a
    # map-side-combinable min over struct(-cos, cid): highest cosine,
    # ties → lowest centroid id. Because the k fanout rows of each
    # vector are adjacent in their partition, partial aggregation
    # collapses them BEFORE the exchange — the shuffle carries ONE
    # narrow row per vector, never the corpus×k rows (and never a
    # sort) that a row_number window would (the formulation this
    # replaced; at 10⁹ vectors × 1024 cells that window is a
    # trillion-row sorted exchange). Carried columns ride F.first()
    # over k identical copies — deterministic.
    scored = df.crossJoin(c).withColumn(
        "__scored__",
        F.struct((-cos).alias("negcos"), F.col("__cid__").alias("cid")),
    )
    carried = [col for col in df.columns if col != id_col]
    if n_probe == 1:
        return (
            scored.groupBy(id_col)
            .agg(
                F.min("__scored__").alias("__best__"),
                *[F.first(col).alias(col) for col in carried],
            )
            .select(*df.columns, F.col("__best__.cid").alias(bucket_col))
        )
    return (
        scored.groupBy(id_col)
        .agg(
            F.slice(F.array_sort(F.collect_list("__scored__")), 1, n_probe).alias(
                "__probes__"
            ),
            *[F.first(col).alias(col) for col in carried],
        )
        .withColumn("__probe__", F.explode("__probes__"))
        .select(*df.columns, F.col("__probe__.cid").alias(bucket_col))
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 1,
) -> DataFrame:
    """K3 scale path #2 — IVF: both sides are assigned to their
    nearest centroid, and search joins only within matching cells;
    ``n_probe`` probes the query's n nearest cells (recall knob —
    each extra probe reads one more cell, cost stays
    O(n_probe · cell), never the full corpus).

    At billion-vector scale the corpus assignment is precomputed and
    stored as a partition column, making a query a partition-pruned
    scan of its probed cells; here both assignments run inline. Same
    output shape as brute force; exact within the probed cells. A
    corpus vector lives in exactly one cell, so multi-probe never
    duplicates a (query, neighbor) pair."""
    ca = assign_centroid(corpus, centroids, id_col, vec_col)
    qa = assign_centroid(queries, centroids, id_col, vec_col, n_probe=n_probe)
    q = qa.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
        _norm_scaled(F.col(vec_col)).alias("__qn__"),
        F.col("bucket"),
    )
    c = ca.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv__"),
        _norm_scaled(F.col(vec_col)).alias("__cn__"),
        F.col("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .withColumn("dot_scaled", _dot_scaled(F.col("__qv__"), F.col("__cv__")))
        .withColumn(
            "__cos__",
            F.col("dot_scaled")
            / F.sqrt(F.col("__qn__").cast("double") * F.col("__cn__").cast("double")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos__").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_scaled")
    )


def embedding_near_dup(
    corpus: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos_pct: int = 95,
    bands: int = 1,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via BANDED hyperplane
    LSH, the vector twin of the MinHash band join (dedup.py).

    The ``len(planes)`` sign bits split into ``bands`` bands of
    ``len(planes)/bands`` rows each; a pair is a candidate iff it
    matches on ALL bits of AT LEAST ONE band (multi-probe OR over
    bands). Then the exact scaled-integer cosine filters at
    ``min_cos_pct/100``.

    Scale design — why banded beats one flat bucket set:
    - Bucket count per band is 2^rows and must grow with the corpus:
      pick rows ≈ log2(N / target_bucket_size) so per-bucket
      candidate work stays CONSTANT as N grows (a fixed plane count
      is the all-pairs join in disguise — per-bucket pairs grow
      N²/2^planes; the round-1 plan's 4 planes hit exactly that).
    - Recall is restored by the OR over bands: P(candidate) =
      1-(1-p^rows)^bands for per-plane agreement p. True near-dups
      at cos ≥ 0.95 (p ≈ 0.9) survive; EXACT duplicates have
      identical sign vectors, so they collide in every band —
      recall 1.0 on real copies regardless of parameters.
    - The band join is narrow: (id, norm, band_id, sig) only;
      vectors are re-joined just for surviving candidate pairs, so
      verify work is output-bounded like the MinHash path.
    - ``max_bucket_size`` is the degenerate-bucket guard (a spam
      corpus can put millions of vectors behind one sign pattern):
      the pair-source side of the band self-join is capped to each
      bucket's lowest ids (dedup.cap_bucket_side), bounding work at
      |bucket|·cap; overflowing buckets ride the result as
      ``_spark_graft_truncated``. None = uncapped (exact).
    """
    rows_per_band = len(planes) // bands
    assert rows_per_band * bands == len(planes), "planes must split evenly into bands"
    # The signature pass is CPU-bound narrow work (planes × dim
    # multiplies per vector); spread it over all cores — a
    # single-row-group parquet source would otherwise pin it to one
    # task (same rationale as dedup.near_dedup_minhash).
    sc = corpus.sparkSession.sparkContext
    # Repartition feeds ONLY the signature map; the verify-side vector
    # lookups (va/vb below) read the original input directly — routing
    # them through the repartition would re-run its shuffle per
    # consumer for no balance benefit.
    spread = corpus.repartition(sc.defaultParallelism, F.col(id_col))
    c = spread.select(
        F.col(id_col),
        F.col(vec_col).alias("__v__"),
        _norm_scaled(F.col(vec_col)).alias("__n__"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bits__"),
    )
    sigs = c.select(
        F.col(id_col),
        F.col("__n__"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.substring("__bits__", b * rows_per_band + 1, rows_per_band).alias(
                            "band_sig"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band__"),
    ).select(id_col, "__n__", "__band__.band_id", "__band__.band_sig")
    # Both self-join sides (and the optional cap ranking) consume the
    # signature relation; without a persist the CPU-heavy plane
    # projection runs once PER consumer (same multi-consumption issue
    # as the dedup verify path). The persisted relation is narrow —
    # (id, norm, band_id, band_sig), no vectors.
    sigs = sigs.persist()
    truncated = None
    a_rel = sigs
    if max_bucket_size is not None:
        from .dedup import cap_bucket_side

        a_rel, truncated = cap_bucket_side(
            sigs, ["band_id", "band_sig"], id_col, max_bucket_size
        )
    a = a_rel.select(
        F.col(id_col).alias("id_a"), F.col("__n__").alias("__na__"), "band_id", "band_sig"
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"), F.col("__n__").alias("__nb__"), "band_id", "band_sig"
    )
    pairs = (
        a.join(b, ["band_id", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__na__", "__nb__")
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va__"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb__"))
    dot = _dot_scaled(F.col("__va__"), F.col("__vb__"))
    cos = dot / F.sqrt(F.col("__na__").cast("double") * F.col("__nb__").cast("double"))
    out = (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("dot_scaled", dot)
        .withColumn("__cos__", cos)
        .filter(F.col("__cos__") * 100 >= F.lit(float(min_cos_pct)))
        .select("id_a", "id_b", "dot_scaled")
    )
    if truncated is not None:
        out._spark_graft_truncated = truncated  # type: ignore[attr-defined]
    from .dedup import attach_cache

    # callers release with dedup.release_cached(out) after their action
    return attach_cache(out, sigs)


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_query_rows: int | None = DEFAULT_MAX_QUERY_ROWS,
) -> DataFrame:
    """Exact cosine top-k with the scoring loop in an Arrow-batched
    ``mapInPandas`` (numpy matrix math) instead of JVM array
    expressions — the §2.J escape hatch for scoring functions the
    expression language can't state (learned metrics, quantized dots).

    Bit-compatible with :func:`cosine_topk_bruteforce` and the same
    DuckDB oracle: per-element products are rounded half-away-from-
    zero to scaled BIGINTs BEFORE summation (``np.rint`` would round
    half-to-even and diverge from Spark/DuckDB ``round``). The query
    matrix rides the closure (small side); the corpus streams through
    executors in Arrow batches; only k·|Q| survivors shuffle for the
    final ranking window.

    The driver-side ``collect()`` makes the bounded-|Q| contract even
    harder here than in the JVM variant (an unbounded query side is
    an OOM, not just a slow broadcast), so the probe runs BEFORE the
    collect and always fails fast — there is no approximate fallback
    that preserves this function's exactness promise; route oversized
    batches through cosine_topk_lsh / IVF instead."""
    import numpy as np
    import pandas as pd

    _probe_query_rows(queries, max_query_rows, "cosine_topk_pandas")
    qrows = queries.select(id_col, vec_col).collect()
    qids = [int(r[id_col]) for r in qrows]
    qm = np.array([r[vec_col] for r in qrows], dtype=np.float64)

    def _half_away(x: "np.ndarray") -> "np.ndarray":
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    qnorms = _half_away(qm * qm * SCALE).sum(axis=1)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__cv__"]])
            cn = _half_away(cm * cm * SCALE).sum(axis=1)
            out = []
            for j, qid in enumerate(qids):
                dots = _half_away(cm * qm[j] * SCALE).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": pdf["__cid__"].to_numpy(),
                            "dot_scaled": dots,
                            "__qn__": qnorms[j],
                            "__cn__": cn,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    scored = corpus.select(
        F.col(id_col).alias("__cid__"), F.col(vec_col).alias("__cv__")
    ).mapInPandas(
        score,
        schema="query_id long, neighbor_id long, dot_scaled long, __qn__ long, __cn__ long",
    )
    w = Window.partitionBy("query_id").orderBy(
        (
            F.col("dot_scaled")
            / F.sqrt(F.col("__qn__").cast("double") * F.col("__cn__").cast("double"))
        ).desc(),
        F.col("neighbor_id"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_scaled")
    )


def md5_planes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes derived from md5(i:j) — no RNG
    state, reproducible across engines and runs."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{i}:{j}".encode()).digest()[0] % 2 else -1.0
            for j in range(dim)
        ]
        for i in range(num_planes)
    ]


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: the sign bits of vec·plane
    for each plane, as a bit string — the SimHash-for-vectors scheme.
    The dot uses the same scaled-integer sum as _dot_scaled, so the
    bucket assignment is exact: a float-accumulation sign flip near
    zero can never put the same vector in two buckets on two runs."""
    # ONE nested-lambda expression over a 2D plane-matrix literal,
    # not one tree per plane: 32 separate aggregate/zip_with lambdas
    # cost ~2.5 s of driver-side Catalyst analysis per query build
    # (measured at 32 planes × 64 dims); a single transform over the
    # matrix keeps the identical per-plane scaled-integer arithmetic
    # in a plan ~1/32nd the size.
    matrix = F.array(*[F.array(*[F.lit(x) for x in p]) for p in planes])
    per_plane = F.transform(
        matrix,
        lambda pl: F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    pl,
                    lambda x, y: F.round(x.cast("double") * y * SCALE).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.array_join(per_plane, "")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: join only within matching hyperplane
    buckets. Same output shape as brute force; recall depends on
    plane count (probe multiple tables at higher recall — the bucket
    column is cheap to replicate).

    ``broadcast_queries=False`` switches the bucket join to a plain
    SHUFFLE join (both sides exchanged on ``__bucket__``): the shape
    for query sets too large to broadcast — this is the fallback
    target of cosine_topk_bruteforce's |Q| probe, and the only
    variant here with no size assumption on either side."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
        _norm_scaled(F.col(vec_col)).alias("__qn__"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket__"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv__"),
        _norm_scaled(F.col(vec_col)).alias("__cn__"),
        hyperplane_bucket(F.col(vec_col), planes).alias("__bucket__"),
    )
    scored = (
        c.join(F.broadcast(q) if broadcast_queries else q, "__bucket__")
        .withColumn("dot_scaled", _dot_scaled(F.col("__qv__"), F.col("__cv__")))
        .withColumn(
            "__cos__",
            F.col("dot_scaled")
            / F.sqrt(F.col("__qn__").cast("double") * F.col("__cn__").cast("double")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos__").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_scaled")
    )


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the standard
    4× compression step before a billion-vector ANN index (scale =
    max|x|/127, q_i = round(x_i/scale)). Array-native expressions
    only; each row is independent, so the op is a narrow linear scan
    at any corpus size.

    Determinism: the scale is one float→double widening plus one IEEE
    division; q and the reconstruction error are elementwise double
    ops — bit-identical on any engine (single operations are
    correctly rounded; only accumulation ORDER is nondeterministic,
    and the one sum here, the L1 mass, is over exact integers).
    """
    vec = F.col(vec_col)
    scale = (
        F.array_max(F.transform(vec, lambda x: F.abs(x))).cast("double") / 127.0
    )
    base = df.select(
        F.col(id_col), vec.alias("_v"), F.nullif(scale, F.lit(0.0)).alias("_scale")
    )
    q = F.transform(
        F.col("_v"),
        lambda x: F.round(x.cast("double") / F.col("_scale")).cast("int"),
    )
    with_q = base.withColumn("_q", q)
    err = F.array_max(
        F.zip_with(
            F.col("_v"),
            F.col("_q"),
            lambda x, qi: F.abs(x.cast("double") - qi * F.col("_scale")),
        )
    )
    l1 = F.aggregate(
        F.col("_q"), F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v)
    )
    return with_q.select(
        F.col(id_col),
        F.col("_scale").alias("scale"),
        F.col("_q").alias("q"),
        l1.alias("q_l1"),
        err.alias("max_abs_err"),
    )


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    codebook_id_col: str = "vec_id",
    codebook_vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
    codewords: list[tuple] | None = None,
) -> DataFrame:
    """Product quantization: split each vector into ``m`` contiguous
    blocks and code every block as its nearest codeword (scaled-int
    L2; ties → lowest codeword id). With k codewords and m blocks a
    d-dim float vector compresses to m small ints — the memory trick
    behind billion-vector IVF-PQ indexes. Emits ``codes``
    (array<int>, block order) and ``dist_scaled`` (total scaled-int
    distortion, exact and order-free).

    The codebook is k rows BY DEFINITION (k ≤ 256 in practice), so it
    is collected to the driver and inlined as literals — encoding
    becomes a pure narrow expression over the corpus: no join, no
    shuffle, embarrassingly parallel at any corpus size. Distances
    are Σ round((x_i−c_i)²·1e8) per block as BIGINT: elementwise IEEE
    ops are bit-identical everywhere and integer sums order-free, so
    codes hash-match any engine's oracle.
    """
    if codewords is None:
        # ``codewords`` lets a caller that needs the codebook for BOTH
        # encode and ADC (IVF-PQ composition) pay the bounded collect
        # once (r11: pq_collect_codewords) instead of per operator
        rows = codebook.select(codebook_id_col, codebook_vec_col).collect()
        codewords = sorted((r[0], list(r[1])) for r in rows)
    dim = len(codewords[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    w = dim // m
    vec = F.col(vec_col)

    # Per-block argmin via array_min over (dist, cid) structs computed
    # by ONE transform over a k×w codeword-block literal — struct
    # ordering gives lowest distance, ties to the lowest codeword id.
    # Two deliberate tree-size choices: (a) the earlier when/least
    # comparison chain re-referenced every prior distance expression
    # per codeword (O(k²) aggregate evaluations per block after
    # codegen); (b) even an argmin that INLINES one distance
    # expression per codeword makes the generated code grow O(k·w),
    # and janino compile time — a per-query constant — was the
    # dominant bench cost. The higher-order form keeps the tree
    # constant-size: one lambda, codewords as array literals.
    def block_argmin(b: int) -> Column:
        sub = F.slice(vec, b * w + 1, w)
        cb_blocks = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in cvec[b * w : (b + 1) * w]])
                for _cid, cvec in codewords
            ]
        )
        cids = F.array(*[F.lit(cid) for cid, _cvec in codewords])
        dists = F.transform(
            cb_blocks,
            lambda cv: F.aggregate(
                F.zip_with(
                    sub,
                    cv,
                    lambda x, y: F.round(
                        (x.cast("double") - y) * (x.cast("double") - y) * SCALE
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        return F.array_min(
            F.zip_with(
                dists, cids, lambda d, c: F.struct(d.alias("d"), c.alias("c"))
            )
        )

    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        *[block_argmin(b).alias(f"__pqb{b}__") for b in range(m)],
    )
    total = F.col("__pqb0__")["d"]
    for b in range(1, m):
        total = total + F.col(f"__pqb{b}__")["d"]
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.array(*[F.col(f"__pqb{b}__")["c"].cast("int") for b in range(m)]).alias(
            "codes"
        ),
        total.alias("dist_scaled"),
    )


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
    codebook_id_col: str = "vec_id",
    codebook_vec_col: str = "embedding",
    group_col: str | None = None,
    max_query_rows: int | None = DEFAULT_MAX_QUERY_ROWS,
    codewords: list[tuple] | None = None,
) -> DataFrame:
    """PQ search by Asymmetric Distance Computation (Jégou et al.
    2011): approximate squared-L2 from a query to a PQ-coded vector
    is Σ_b lut_b[code_b], where lut_b holds the exact distance from
    the query's b-th sub-vector to every codeword's b-th sub-vector.
    The search half of the ``pq_encode`` pair — together they are the
    memory layout behind billion-vector IVF-PQ indexes: the corpus
    side touches only ``m`` small ints per vector, never the floats.

    Output: (query_id, neighbor_id, rank, adc_scaled) ranked by ADC
    distance ascending, ties → lowest neighbor id. All arithmetic is
    scaled-int (round-then-sum, same contract as ``pq_encode``), so
    the result hash-matches any engine's oracle.

    Scale shape: the codebook (k·m sub-vectors, k ≤ 256 BY
    DEFINITION) is inlined as literals; each query row builds its
    m×k LUT as one narrow expression; the query relation (small BY
    DEFINITION — it is the online search batch) is broadcast to the
    codes relation, and the per-pair work is ``m`` map lookups — no
    float vector ever crosses the join. The only shuffle is the
    per-query top-k window, identical to ``cosine_topk_bruteforce``'s
    accepted survivor shape.

    The "small BY DEFINITION" query batch is PROBED, not assumed
    (``max_query_rows``): the broadcast — and with it each query
    row's m×k LUT literal — must stay bounded; an oversized batch
    fails fast with a pointer at splitting it or at per-cell IVF
    routing (``group_col``), where the corpus side of each join is a
    cell, not the relation.
    """
    _probe_query_rows(queries, max_query_rows, "pq_adc_topk")
    if codewords is None:
        rows = codebook.select(codebook_id_col, codebook_vec_col).collect()
        codewords = sorted((r[0], list(r[1])) for r in rows)
    dim = len(codewords[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    w = dim // m
    qvec = F.col(vec_col)

    # Per-block LUT as MAP<codeword id, exact scaled dist> — map keys
    # are the REAL codeword ids, so arbitrary (non-contiguous) id
    # spaces need no position bookkeeping at lookup time. Built with
    # ONE transform over a k×w codeword-block literal — same
    # constant-size-tree rationale as pq_encode: inlining one distance
    # expression per codeword made janino compile time (a per-query
    # constant) the dominant cost.
    def block_lut(b: int) -> Column:
        sub = F.slice(qvec, b * w + 1, w)
        cb_blocks = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in cvec[b * w : (b + 1) * w]])
                for _cid, cvec in codewords
            ]
        )
        cids = F.array(*[F.lit(cid) for cid, _cvec in codewords])
        dists = F.transform(
            cb_blocks,
            lambda cv: F.aggregate(
                F.zip_with(
                    sub,
                    cv,
                    lambda x, y: F.round(
                        (x.cast("double") - y) * (x.cast("double") - y) * SCALE
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        return F.map_from_arrays(cids, dists)

    lut_cols = [block_lut(b).alias(f"__lut{b}__") for b in range(m)]
    group = [group_col] if group_col else []
    q = queries.select(
        F.col(id_col).alias("query_id"), *[F.col(g) for g in group], *lut_cols
    )
    c = codes_df.select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(g) for g in group],
        F.col(code_col).alias("__codes__"),
    )
    adc = None
    for b in range(m):
        term = F.element_at(F.col(f"__lut{b}__"), F.element_at("__codes__", b + 1))
        adc = term if adc is None else adc + term
    # with a group column (IVF cell) the search joins per cell — the
    # corpus side is restricted to the probed bucket instead of the
    # whole relation, which is the IVF-PQ scale contract
    scored = (
        c.join(F.broadcast(q), group) if group else c.crossJoin(F.broadcast(q))
    ).withColumn("adc_scaled", adc)
    win = Window.partitionBy("query_id").orderBy(
        F.col("adc_scaled"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_scaled")
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    tau: float = 0.38,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_candidates: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space,
    then mark within-cluster semantic duplicates — items whose cosine
    to another item in the SAME cluster reaches ``tau``. Misses
    cross-cluster pairs by design; that locality is what removes the
    all-pairs join at corpus scale.

    Keep policy is deterministic keep-lowest-id: a row is a duplicate
    iff a LOWER-id cluster-mate is within ``tau`` (reported as
    ``dup_of`` = the smallest such id). This is the order-free variant
    of the paper's greedy sweep — independent per-pair marking, no
    sequential dependence, so a 1000-executor run reproduces the
    single-threaded result exactly.

    Scale audit: assignment is a broadcast argmax (corpus never
    shuffles); the within-cluster self-join is the only quadratic
    term and is bounded by cluster size, so pick k ∝ N/target so
    clusters stay ~constant-sized as the corpus grows (same knob as
    IVF cells). ``max_cluster_candidates`` is the runaway-cluster
    guard: the dup-SOURCE side of the self-join is capped to each
    cluster's lowest ids (dedup.cap_bucket_side), bounding work at
    |cluster|·cap; every member is still tested AGAINST those
    canonical low ids — and since ``dup_of`` reports the SMALLEST
    in-reach id, which concentrates in the retained prefix, the cap
    only loses marks whose sole τ-mates rank beyond it. Overflowing
    clusters ride the result as ``_spark_graft_truncated``
    (``__bucket__, bucket_size``). Output is one row per input vector.
    """
    base = corpus.select(F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__"))
    # Persisted: the assignment relation feeds BOTH self-join sides and
    # the final output projection — without the persist the broadcast-
    # argmax assignment (k×dim work per row) executes three times
    # (measured 2.5× slower at sf0.1). Released via the attached-cache
    # contract (dedup.release_cached).
    assigned = (
        assign_centroid(
            base,
            centroids,
            id_col="__id__",
            vec_col="__v__",
            centroid_id_col="__cid__",
            centroid_vec_col="__cvec__",
            bucket_col="__bucket__",
        )
        .withColumn("__n__", _norm_scaled(F.col("__v__")))
        .persist()
    )
    a_rel = assigned
    truncated = None
    if max_cluster_candidates is not None:
        from .dedup import cap_bucket_side

        a_rel, truncated = cap_bucket_side(
            assigned, ["__bucket__"], "__id__", max_cluster_candidates
        )
    a = a_rel.select(
        F.col("__bucket__"),
        F.col("__id__").alias("id_a"),
        F.col("__v__").alias("__va__"),
        F.col("__n__").alias("__na__"),
    )
    b = assigned.select(
        F.col("__bucket__"),
        F.col("__id__").alias("id_b"),
        F.col("__v__").alias("__vb__"),
        F.col("__n__").alias("__nb__"),
    )
    sims = (
        a.join(b, "__bucket__")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("__dot__", _dot_scaled(F.col("__va__"), F.col("__vb__")))
        .withColumn(
            "__cos__",
            F.col("__dot__")
            / F.sqrt(F.col("__na__").cast("double") * F.col("__nb__").cast("double")),
        )
    )
    dups = (
        sims.filter(F.col("__cos__") >= F.lit(float(tau)))
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    out = (
        assigned.select(
            F.col("__id__").alias(id_col),
            F.col("__bucket__").cast("long").alias("bucket"),
        )
        .join(dups, F.col(id_col) == F.col("id_b"), "left")
        .select(
            id_col,
            "bucket",
            F.col("dup_of").cast("long").alias("dup_of"),
            F.col("dup_of").isNotNull().alias("is_dup"),
        )
    )
    if truncated is not None:
        out._spark_graft_truncated = truncated  # type: ignore[attr-defined]
    from .dedup import attach_cache

    return attach_cache(out, assigned)
