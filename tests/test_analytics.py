"""Behavioral-analytics / corpus-indexing query tests (registry
module ``analyticsq``): invariants verified independently with
numpy/duckdb at sf0.001 — the oracle harness (tools/check.py) covers
full value equality; these tests pin the semantic properties."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_processing_scd1_spark.registry import analyticsq

from .conftest import SF0001

Q = analyticsq.QUERIES


def test_funnel_is_monotone_and_anchored(spark):
    rows = {r["stage"]: r["n_users"] for r in Q["funnel_analysis"](spark, SF0001).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3]
    signup_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF0001}/events.parquet' "
        "WHERE event_type='signup'"
    ).fetchone()[0]
    assert rows[1] == signup_users


def test_cohort_offset_zero_covers_whole_cohort(spark):
    out = Q["cohort_retention"](spark, SF0001).collect()
    assert all(r["offset_weeks"] >= 0 for r in out)
    # every user is active in their own first week -> offset-0 count
    # per cohort equals the cohort's size
    zero = {r["cohort_week"]: r["n_users"] for r in out if r["offset_weeks"] == 0}
    cohort_sizes = duckdb.sql(
        f"""WITH f AS (SELECT user_id, date_trunc('week', min(CAST(ts AS TIMESTAMP)))
            AS w FROM '{SF0001}/events.parquet' GROUP BY user_id)
            SELECT CAST(w AS TIMESTAMP), count(*) FROM f GROUP BY 1"""
    ).fetchall()
    for week, n in cohort_sizes:
        assert zero[week] == n


def test_markov_probabilities_floor_to_one_million(spark):
    out = Q["markov_transitions"](spark, SF0001).collect()
    by_prev: dict = {}
    for r in out:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rows in by_prev.items():
        total_ppm = sum(r["prob_ppm"] for r in rows)
        # floor-division loses < 1 ppm per curr_type
        assert 1_000_000 - len(rows) < total_ppm <= 1_000_000
    n_events, n_users = duckdb.sql(
        f"SELECT count(*), count(DISTINCT user_id) FROM '{SF0001}/events.parquet'"
    ).fetchone()
    assert sum(r["n_trans"] for r in out) == n_events - n_users


def test_chunks_reconstruct_documents(spark):
    chunks = Q["chunk_documents"](spark, SF0001).collect()
    texts = dict(
        duckdb.sql(f"SELECT doc_id, text FROM '{SF0001}/documents.parquet'").fetchall()
    )
    per_doc: dict = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == set(texts)
    for doc_id, rows in per_doc.items():
        text = texts[doc_id]
        for r in rows:
            assert r["chunk_text"] == text[r["chunk_start"] : r["chunk_start"] + 200]
        last = max(rows, key=lambda r: r["chunk_idx"])
        assert last["chunk_start"] + last["chunk_len"] == len(text)


def test_tfidf_top3_scores_are_exact_integers(spark):
    out = Q["tfidf_top_terms"](spark, SF0001).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF0001}/documents.parquet'"
    ).fetchone()[0]
    per_doc: dict = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
        expected = r["tf"] * round(math.log(n_docs / r["df"]) * 1e9)
        assert r["score_q"] == expected
    assert all(len(rows) <= 3 for rows in per_doc.values())


def test_entropy_bounds(spark):
    for r in Q["token_entropy"](spark, SF0001).collect():
        assert 0 <= r["entropy_micronats"] <= math.log(r["n_tokens"]) * 1e6 + 1
        if r["n_distinct"] == r["n_tokens"]:  # all tokens unique -> H = ln n
            assert r["entropy_micronats"] == round(math.log(r["n_tokens"]) * 1e9) // 1000


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_distances_verified(spark):
    out = Q["fuzzy_join_levenshtein"](spark, SF0001).collect()
    assert out, "expected at least one fuzzy pair"
    names = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_name FROM '{SF0001}/customer.parquet'"
        ).fetchall()
    )
    for r in out[:50]:
        assert r["custkey_a"] < r["custkey_b"]
        assert r["edit_dist"] == _lev(names[r["custkey_a"]], names[r["custkey_b"]])
        assert r["edit_dist"] <= 2


def test_group_quantiles_match_numpy(spark):
    out = Q["group_quantiles"](spark, SF0001).collect()
    for r in out:
        cents = duckdb.sql(
            f"SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS cents FROM "
            f"'{SF0001}/lineitem.parquet' WHERE l_returnflag = '{r['l_returnflag']}'"
        ).fetchnumpy()["cents"]
        assert r["q25"] == np.percentile(cents, 25, method="linear")
        assert r["q50"] == np.percentile(cents, 50, method="linear")
        assert r["q75"] == np.percentile(cents, 75, method="linear")


def test_ewma_warmup_and_bounds(spark):
    out = sorted(Q["ewma_smooth"](spark, SF0001).collect(), key=lambda r: r["day"])
    assert out[0]["ewma_cents"] == out[0]["daily_cents"]  # lag-0 only at warm-up
    window: list = []
    for r in out:
        window.append(r["daily_cents"])
        tail = window[-16:]
        assert min(tail) - 1 <= r["ewma_cents"] <= max(tail)  # convex combo (floor)


def test_anomaly_flags_match_numpy(spark):
    out = Q["anomaly_zscore"](spark, SF0001).collect()
    flagged = {r["o_orderkey"] for r in out}
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_orderpriority, CAST(round(o_totalprice*100) AS BIGINT) "
        f"FROM '{SF0001}/orders.parquet'"
    ).fetchall()
    by_grp: dict = {}
    for k, g, c in rows:
        by_grp.setdefault(g, []).append((k, c))
    expect = set()
    for g, pairs in by_grp.items():
        cents = np.array([c for _, c in pairs], dtype=object)  # exact int math
        n, s, q = len(cents), sum(cents.tolist()), sum(c * c for c in cents.tolist())
        for k, c in pairs:
            if 4 * (n * c - s) ** 2 > 9 * (n * q - s * s):
                expect.add(k)
    assert flagged == expect
    assert flagged, "expected some 1.5-sigma outliers"


def test_inverted_index_caps_and_sorts_postings(spark):
    out = Q["inverted_index"](spark, SF0001).collect()
    for r in out:
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r["df"], 20)
        assert r["df"] >= 50


def test_sessionize_splits_on_gap_boundary(spark):
    """Events 29:59 apart share a session; 30:01 apart split. Session
    stats must count and bound each island exactly."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_processing_scd1_spark.registry import EXTRA_QUERIES, QUERIES

    t0 = dt.datetime(2021, 3, 1, 12, 0, 0)
    rows = [
        (1, t0, 7), (2, t0 + dt.timedelta(minutes=29, seconds=59), 7),
        (3, t0 + dt.timedelta(minutes=60, seconds=1), 7),   # gap 30:02 -> new
        (4, t0, 8),
    ]
    spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")\
        .createOrReplaceTempView("__sess_in")
    e = spark.table("__sess_in").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    is_new = F.when(prev.isNull() | ((F.col("us") - prev) > 1_800_000_000), 1).otherwise(0)
    out = (
        e.withColumn("sid", F.sum(is_new).over(run))
        .groupBy("user_id", "sid").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sess = {(r.user_id, r.sid): r.n for r in out}
    assert sess == {(7, 1): 2, (7, 2): 1, (8, 1): 1}


def test_label_propagation_separates_cliques(spark):
    """Two 4-cliques joined by one bridge edge: after 3 rounds each
    clique converges to its lowest member's label, and the bridge
    does not merge them (a component algorithm WOULD merge — that is
    the communities-vs-components distinction)."""
    from etl_processing_scd1_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    edges = spark.createDataFrame(c1 + c2 + bridge, "u long, v long")
    out = {r.node: r.community for r in label_propagation(edges, iters=3).collect()}
    assert {out[n] for n in range(4)} == {0}
    assert {out[n] for n in range(10, 14)} == {10}
