"""Data-mining query tests (registry module ``miningq``): semantic
invariants verified independently with duckdb/brute force at sf0.001 —
the oracle harness (tools/check.py) covers full value equality."""

from __future__ import annotations

import itertools

import duckdb

from etl_processing_scd1_spark.registry import miningq

from .conftest import SF0001

Q = miningq.QUERIES


def test_frequent_pairs_support_and_lift(spark):
    rows = Q["frequent_pairs"](spark, SF0001).collect()
    assert rows, "threshold 5 must fire at sf0.001"
    # independent brute force over the basket relation
    baskets = duckdb.sql(
        f"SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS br "
        f"FROM '{SF0001}/lineitem.parquet' l "
        f"JOIN '{SF0001}/part.parquet' p ON l.l_partkey = p.p_partkey"
    ).fetchall()
    by_order: dict = {}
    cnt: dict = {}
    for o, br in baskets:
        by_order.setdefault(o, set()).add(br)
        cnt[br] = cnt.get(br, 0) + 1
    support: dict = {}
    for brands in by_order.values():
        for a, b in itertools.combinations(sorted(brands), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    n = len(by_order)
    expected = {k: v for k, v in support.items() if v >= 5}
    got = {(r["brand_a"], r["brand_b"]): r for r in rows}
    assert set(got) == set(expected)
    for (a, b), r in got.items():
        s = expected[(a, b)]
        assert r["support"] == s
        assert r["lift_nanos"] == ((s * 1_000_000_000) // cnt[a]) * n // cnt[b]


def test_pareto_skyline_matches_bruteforce(spark):
    rows = Q["pareto_skyline"](spark, SF0001).collect()
    parts = duckdb.sql(
        f"SELECT p_brand, p_partkey, p_retailprice, p_size "
        f"FROM '{SF0001}/part.parquet'"
    ).fetchall()
    by_brand: dict = {}
    for br, pk, price, size in parts:
        by_brand.setdefault(br, []).append((pk, price, size))
    expected = set()
    for br, pts in by_brand.items():
        for pk, price, size in pts:
            dominated = any(
                p2 <= price and s2 >= size and (p2 < price or s2 > size)
                for _, p2, s2 in pts
            )
            if not dominated:
                expected.add((br, pk))
    got = {(r["brand"], r["partkey"]) for r in rows}
    assert got == expected
    assert expected, "skyline must be non-empty"


def test_rank_fusion_rrf_arithmetic(spark):
    rows = Q["rank_fusion"](spark, SF0001).collect()
    assert rows
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)), "one fused row per doc"
    lex_ranks = sorted(r["rank_lex"] for r in rows if r["rank_lex"] > 0)
    sem_ranks = sorted(r["rank_sem"] for r in rows if r["rank_sem"] > 0)
    # each leg contributes a contiguous 1..k prefix (k <= 20)
    assert lex_ranks == list(range(1, len(lex_ranks) + 1))
    assert sem_ranks == list(range(1, len(sem_ranks) + 1)) and len(sem_ranks) == 20
    for r in rows:
        want = (1_000_000_000 // (60 + r["rank_lex"]) if r["rank_lex"] else 0) + (
            1_000_000_000 // (60 + r["rank_sem"]) if r["rank_sem"] else 0
        )
        assert r["rrf_nanos"] == want
    # the semantic query doc itself ranks #1 on the semantic leg
    top_sem = next(r for r in rows if r["rank_sem"] == 1)
    assert top_sem["doc_id"] == 7


def test_bfs_distances_frontier_invariants(spark):
    rows = Q["bfs_distances"](spark, SF0001).collect()
    dist = {r["node_id"]: r["dist"] for r in rows}
    assert dist, "seed set must be non-empty"
    seeds = {n for n, d in dist.items() if d == 0}
    assert seeds and all(n >= 1_000_000 and (n - 1_000_000) % 10 == 0 for n in seeds)
    # triangle inequality over the edge relation: adjacent reached
    # nodes differ by at most 1 hop
    edges = duckdb.sql(
        f"SELECT DISTINCT l.l_suppkey + 1000000 AS s, o.o_custkey AS c "
        f"FROM '{SF0001}/lineitem.parquet' l "
        f"JOIN '{SF0001}/orders.parquet' o ON l.l_orderkey = o.o_orderkey"
    ).fetchall()
    for s, c in edges:
        if s in dist and c in dist:
            assert abs(dist[s] - dist[c]) <= 1
        elif s in dist:
            assert dist[s] >= 3  # c unreached within 3 rounds
        elif c in dist:
            assert dist[c] >= 3
    # bipartite parity: supplier seeds -> customers odd, suppliers even
    for n, d in dist.items():
        assert (d % 2 == 0) == (n >= 1_000_000)


def test_ivf_recall_bounds_and_scaling(spark):
    rows = Q["ivf_recall"](spark, SF0001).collect()
    assert {r["query_id"] for r in rows} == {100, 101, 102, 103, 104}
    for r in rows:
        assert 0 <= r["matched"] <= 5
        assert r["recall_milli"] == r["matched"] * 200
