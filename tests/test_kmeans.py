"""Exact k-means (IVF centroid training) gates: determinism across
partitionings, Lloyd convergence, and bit-compatibility of the
Pandas-UDF cosine path with the expression path."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_processing_scd1_spark.operators.kmeans import assignment_changes, kmeans_fit
from etl_processing_scd1_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_pandas,
)
from tests.conftest import SF0001


def _emb(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet")


def test_kmeans_deterministic_under_partitioning(spark):
    emb = _emb(spark)
    a = kmeans_fit(emb, k=4, iters=2)
    b = kmeans_fit(emb.repartition(7, "vec_id"), k=4, iters=2)
    assert a == b  # bit-identical centroids regardless of layout


def test_kmeans_lloyd_converges(spark):
    emb = _emb(spark)
    c1 = kmeans_fit(emb, k=4, iters=1)
    c2 = kmeans_fit(emb, k=4, iters=2)
    c3 = kmeans_fit(emb, k=4, iters=3)
    # assignment churn between successive iterates is non-increasing
    d12 = assignment_changes(emb, c1, c2)
    d23 = assignment_changes(emb, c2, c3)
    assert d23 <= d12
    # and the fit moves off the raw seeds
    seeds = kmeans_fit(emb, k=4, iters=0)
    assert assignment_changes(emb, seeds, c2) >= 0
    assert c1 != seeds


def test_ivf_cells_partition_prune(spark, tmp_path):
    """The IVF scale path: corpus stored partitioned by its trained
    cell id makes a cell-restricted query a directory-pruned scan —
    the plan must show a PartitionFilters entry on bucket, i.e. at
    billion-vector scale a probe reads only its probed cells."""
    from etl_processing_scd1_spark.operators.similarity import assign_centroid

    emb = _emb(spark)
    centroids = kmeans_fit(emb, k=4, iters=1)
    cf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "vec_id int, embedding array<double>"
    )
    assigned = assign_centroid(emb, cf, bucket_col="bucket")
    path = str(tmp_path / "ivf_cells")
    assigned.write.partitionBy("bucket").mode("overwrite").parquet(path)
    probe = spark.read.parquet(path).filter(F.col("bucket") == 1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan
    assert probe.count() > 0


def test_pandas_cosine_matches_expression_path(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    expr = cosine_topk_bruteforce(emb, q, k=4).orderBy("query_id", "rank").collect()
    arrow = cosine_topk_pandas(emb, q, k=4).orderBy("query_id", "rank").collect()
    assert [tuple(r) for r in expr] == [tuple(r) for r in arrow]


def test_multiprobe_recall_dominates_single_probe(spark):
    """n_probe=2 must recover at least as many true (brute-force)
    top-k neighbors as n_probe=1 for every query — more cells
    searched can only add candidates."""
    from etl_processing_scd1_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    emb = _emb(spark)
    queries = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 25))
    cents = emb.filter(F.col("vec_id") < 6)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    hits = []
    for n_probe in (1, 2):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk_ivf(
                emb, queries, centroids=cents, k=5, n_probe=n_probe
            ).collect()
        }
        hits.append(len(got & truth))
    assert hits[1] >= hits[0]
    assert hits[1] > 0


def test_pq_encode_codeword_is_its_own_code(spark):
    """Encoding a codebook vector must pick itself in every block with
    zero distortion; a perturbed copy picks the same codes with small
    positive distortion."""
    from etl_processing_scd1_spark.operators.similarity import pq_encode

    cb = _emb(spark).filter(F.col("vec_id") < 8)
    enc = {r["vec_id"]: r for r in pq_encode(_emb(spark).filter(F.col("vec_id") < 8), cb, m=4).collect()}
    for cid in range(8):
        assert enc[cid]["codes"] == [cid] * 4
        assert enc[cid]["dist_scaled"] == 0


def test_pq_adc_self_is_rank1_with_own_distortion(spark):
    """ADC(q, q's own codes) = Σ_b min_c lut_b[c] — the per-block
    argmin pq_encode took — so no corpus vector can beat a query's own
    codes: every query must rank ITSELF first (ties → lowest id), and
    that rank-1 adc_scaled must equal the query's pq_encode
    dist_scaled exactly."""
    from etl_processing_scd1_spark.operators.similarity import pq_adc_topk, pq_encode

    emb = _emb(spark)
    cb = emb.filter(F.col("vec_id") < 8)
    codes = pq_encode(emb, cb, m=4)
    queries = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105))
    top = pq_adc_topk(codes, queries, cb, k=3, m=4).collect()
    enc = {r["vec_id"]: r["dist_scaled"] for r in pq_encode(queries, cb, m=4).collect()}
    rank1 = {r["query_id"]: r for r in top if r["rank"] == 1}
    assert set(rank1) == set(range(100, 105))
    for qid, r in rank1.items():
        assert r["adc_scaled"] == enc[qid]
        # self achieves the minimum; rank-1 id can only be <= qid
        assert r["neighbor_id"] <= qid


def test_ivfpq_neighbors_share_cell_and_self_ranks_first(spark):
    """IVF-PQ composition: every returned neighbor must live in the
    query's own cell (the per-cell join IS the index contract), and —
    as with flat ADC — the query's own residual codes achieve the
    per-block minima, so each query ranks itself (or a lower-id
    exact tie) first."""
    from etl_processing_scd1_spark.registry import EXTRA_QUERIES, QUERIES
    from etl_processing_scd1_spark.operators.similarity import assign_centroid

    allq = {**QUERIES, **EXTRA_QUERIES}
    top = allq["similarity_ivfpq"](spark, SF0001).collect()
    emb = _emb(spark)
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in assign_centroid(emb, emb.filter(F.col("vec_id") < 8)).collect()
    }
    assert {r.query_id for r in top} == set(range(100, 105))
    for r in top:
        assert buckets[r.neighbor_id] == buckets[r.query_id]
        if r.rank == 1:
            assert r.neighbor_id <= r.query_id
