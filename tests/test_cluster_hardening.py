"""dedup_clusters hardening (VERDICT r3 #6/r4 #8): pointer-jumping
convergence on pathological chain topologies in O(log diameter)
rounds, reliable-checkpoint mode equivalence (explicit dir AND the
cluster-profile session default), and agreement with a plain
union-find reference model on arbitrary small graphs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_processing_scd1_spark.operators.dedup import consuming, dedup_clusters

CHAIN_N = 1024


def _chain(spark, n=CHAIN_N):
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    return docs, pairs


def _clusters(docs, pairs, **kw):
    with consuming(dedup_clusters(docs, pairs, **kw)) as out:
        rows = out.collect()
        return rows, out._spark_graft_rounds


def test_chain_converges_in_log_rounds(spark):
    """A 1024-node path is the worst diameter per node count: plain
    neighbor-min needs ~1024 rounds (far past max_iters=25); the
    pointer jump must close it in O(log n)."""
    docs, pairs = _chain(spark)
    rows, rounds = _clusters(docs, pairs, max_iters=25)
    assert len(rows) == CHAIN_N
    assert {r.cluster_id for r in rows} == {0}
    assert all(r.cluster_size == CHAIN_N for r in rows)
    assert rounds <= 15  # log2(1024)=10 + slack


def test_reliable_checkpoint_dir_matches_local(spark, tmp_path):
    sc = spark.sparkContext
    docs, pairs = _chain(spark, n=64)
    local, _ = _clusters(docs, pairs)
    try:
        explicit, _ = _clusters(docs, pairs, checkpoint_dir=str(tmp_path / "ckpt"))
        assert sorted(map(tuple, local)) == sorted(map(tuple, explicit))
        # reliable mode actually wrote checkpoint data to shared storage
        assert any((tmp_path / "ckpt").rglob("*"))
        # cluster-profile DEFAULT: with a session checkpoint dir set
        # (here: by the explicit call above), a bare call must pick the
        # reliable path on its own — executor loss mid-iteration on a
        # real cluster recovers from storage without any parameter
        n_files = sum(1 for _ in (tmp_path / "ckpt").rglob("*"))
        session_default, _ = _clusters(docs, pairs)
        assert sorted(map(tuple, local)) == sorted(map(tuple, session_default))
        assert sum(1 for _ in (tmp_path / "ckpt").rglob("*")) > n_files
    finally:
        # the checkpoint dir is documented global state — restore so
        # later tests exercise the localCheckpoint fast path again
        sc._jsc.sc().setCheckpointDir(None)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(
            lambda e: e[0] != e[1]
        ),
        max_size=40,
    )
)
@settings(max_examples=12, deadline=None)
def test_matches_union_find_model(spark, edges):
    n = 25
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for v in range(n):
        root = find(v)
        expected[v] = min(u for u in range(n) if find(u) == root)

    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
        "id_a long, id_b long",
    ).filter(F.col("id_a") != F.col("id_b"))
    with consuming(dedup_clusters(docs, pairs)) as out:
        got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == expected
