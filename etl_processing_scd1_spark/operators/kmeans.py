"""Deterministic distributed k-means for IVF centroid training
(SURVEY.md §2.K K3 — the "k-means in production" step the round-1
`similarity_ivf` docstring deferred).

Iterative algorithms are where engine determinism usually dies:
float accumulation order changes centroids, changed centroids change
assignments, and the divergence compounds per iteration. This
implementation keeps every iteration EXACT, so a 1000-executor fit
reproduces a single-threaded oracle bit-for-bit:

- assignment uses the scaled-integer cosine (operators.similarity):
  argmax over exact BIGINT dot products, ties to the lowest centroid
  id — no float-order sensitivity;
- centroid update sums scaled-integer components per (cluster, dim)
  — BIGINT adds are order-free under any partitioning — and divides
  once at the end: component = sum_scaled / (SCALE * n), a single
  correctly-rounded double division both engines compute identically;
- init is the deterministic "first k by id" rule (portable, no RNG).

Scale design: one shuffle per iteration (the (cluster, dim) partial
aggregation — map-side combined, k·dim cells regardless of corpus
size). Only k·dim scaled sums ever reach the driver; the corpus
never moves. The iteration count is a fixed parameter (training for
ANN cells needs few passes; convergence is asserted in tests via the
monotone non-increasing assignment-change count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from .similarity import SCALE, assign_centroid


def _centroid_frame(spark, centroids: list[list[float]]):
    """centroid list → (cid, vec) DataFrame, cid = list position."""
    return spark.createDataFrame(
        [Row(__cid__=i, __cvec__=[float(x) for x in c]) for i, c in enumerate(centroids)],
        "`__cid__` int, `__cvec__` array<double>",
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Fit ``k`` cosine-space centroids with ``iters`` exact Lloyd
    iterations; returns the centroid component lists (k × dim — the
    only data that ever reaches the driver).

    Empty clusters keep their previous centroid (deterministic, no
    re-seeding RNG)."""
    spark = corpus.sparkSession
    base = corpus.select(F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__"))
    # deterministic seed: the k lowest-id vectors
    seeds = base.orderBy("__id__").limit(k).collect()
    centroids = [[float(x) for x in r["__v__"]] for r in seeds]

    for _ in range(iters):
        cf = _centroid_frame(spark, centroids)
        assigned = assign_centroid(
            base,
            cf,
            id_col="__id__",
            vec_col="__v__",
            centroid_id_col="__cid__",
            centroid_vec_col="__cvec__",
            bucket_col="__bucket__",
        )
        # exact per-(cluster, dim) update: BIGINT sums of scaled
        # components, one map-side-combined shuffle, k·dim result rows
        per_dim = (
            assigned.select(
                "__bucket__",
                F.posexplode(
                    F.transform(
                        "__v__",
                        lambda x: F.round(x.cast("double") * SCALE).cast("long"),
                    )
                ).alias("__dim__", "__s__"),
            )
            .groupBy("__bucket__", "__dim__")
            .agg(F.sum("__s__").alias("__sum__"), F.count(F.lit(1)).alias("__n__"))
            .collect()
        )
        dim = len(centroids[0])
        nxt = [list(c) for c in centroids]  # empty clusters keep position
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in per_dim:
            sums.setdefault(r["__bucket__"], [0] * dim)[r["__dim__"]] = r["__sum__"]
            counts[r["__bucket__"]] = r["__n__"]
        for cid, svec in sums.items():
            n = counts[cid]
            # one correctly-rounded division per component — the
            # oracle computes CAST(sum AS DOUBLE) / (SCALE * n)
            # identically
            nxt[cid] = [s / (SCALE * n) for s in svec]
        centroids = nxt
    return centroids


def assignment_changes(
    corpus: DataFrame,
    centroids_a: list[list[float]],
    centroids_b: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Rows whose nearest centroid differs between two centroid sets —
    the convergence metric (monotone non-increasing under Lloyd)."""
    spark = corpus.sparkSession
    base = corpus.select(F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__"))
    a = assign_centroid(
        base, _centroid_frame(spark, centroids_a),
        id_col="__id__", vec_col="__v__",
        centroid_id_col="__cid__", centroid_vec_col="__cvec__",
        bucket_col="__ba__",
    ).select("__id__", "__ba__")
    b = assign_centroid(
        base, _centroid_frame(spark, centroids_b),
        id_col="__id__", vec_col="__v__",
        centroid_id_col="__cid__", centroid_vec_col="__cvec__",
        bucket_col="__bb__",
    ).select("__id__", "__bb__")
    return a.join(b, "__id__").filter(F.col("__ba__") != F.col("__bb__")).count()
