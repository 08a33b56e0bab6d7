"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"} (plus an
"oracle" block with the SAME-SESSION DuckDB replay of the identical
workloads — the honest baseline comparison; a stale oracle measurement
compounds staleness every round).

Each query executes to completion through the noop sink — full
computation on the executors, zero driver-side collect, which is how
these plans would run on a real cluster (driver collect would be the
anti-pattern SURVEY §2 calls out in the reference's fetchall loop).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "groupby_agg",          # TPC-H Q1 shape: scan + partial agg
    "star_join_chain",      # broadcast star join, zero fact shuffles
    "velocity_fraud_rule",  # window lag + filter (the flagship H3)
    "scd1_merge_full",      # full-outer-join SCD1 recompute
    "fact_append_dedup",    # anti-join idempotent append
    "fraud_blacklist_semi", # star join + semi join
    "orderby_limit",        # TakeOrderedAndProject top-k
    "exact_dedup",          # hash-key dedup window
    "text_stats",           # string-function scan
    "near_dedup_minhash",   # shingle → MinHash → LSH → Jaccard verify
    "similarity_topk",      # brute-force cosine top-k (scaled-int dot)
    "simhash_fingerprint",  # per-doc 32-bit SimHash
    "multimodal_features",  # Arrow mapInPandas binary-payload extract
    "analytic_top_orders",  # TPC-H Q3 shape: filter→join→agg→top-k
    "analytic_regional_revenue",  # TPC-H Q5 shape: 5-way join
    "embedding_near_dup",   # hyperplane-LSH cosine near-dup pairs
    # round-6 additions: tracked from their first driver-checked round
    "containment_dedup",    # asymmetric containment over LSH candidates
    "unigram_logprob_quality",  # corpus LM scoring (explode+join)
    "dedup_apply",          # pairs → clusters → keep-decision
    "kl_domain_shift",      # per-language KL vs corpus mixture
    # mid-round-6 additions
    "containment_dedup_full",  # exact prefix-filter containment join
    "ngram_diversity",      # trigram type/token ratio per slice
    "winsorize_stats",      # exact order-stat clipped aggregates
    "bpe_train_merges",     # iterative BPE tokenizer training
    "triangle_count",       # compact-forward triangles on support graph
    "similarity_pq_adc",    # PQ ADC search over m-int codes
    "edit_distance_dedup",  # LSH screen + exact Levenshtein verify
    "phrase_search",        # positional-postings anchor aggregation
    "corpus_overlap_kmv",   # mergeable KMV slice-overlap estimates
    "sessionize_events",    # gaps-and-islands one-shuffle sessions
    "benford_screen",       # leading-digit chi-squared forensic
    "label_propagation_communities",  # 3-round modal-label graph
    "multimodal_decode_gif",  # real LZW decode via mapInPandas
    "text_clean",           # NFC pandas_udf + JVM regex cleanup
    "similarity_ivfpq",     # cell assign + residual PQ + per-cell ADC
    "bigram_lm_quality",    # add-one bigram LM scoring
]

#: parquet tables the oracle side registers as DuckDB views (same list
#: as tools/check.py — the driver pre-registers these for oracle_sql)
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_bench(spark, sf_dir: str, runs: int) -> dict[str, float]:
    """Per-query best-of-``runs`` wall seconds for the headline set at
    ``sf_dir``. Shared by the CLI entry below and tools/bench_scaling."""
    from etl_processing_scd1_spark.operators.dedup import release_cached
    from etl_processing_scd1_spark.registry import EXTRA_QUERIES, QUERIES

    all_queries = {**QUERIES, **EXTRA_QUERIES}

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not first-touch costs.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(runs):
            # isolate queries from each other: no cross-query cache or
            # shuffle-reuse effects in the measured numbers
            spark.catalog.clearCache()
            # the BUILD is inside the timed window (round-6 change):
            # iterative operators (dedup_clusters) and size probes
            # (jaccard_verify) do real cluster work at build time —
            # timing only the final write would hide it
            t0 = time.perf_counter()
            df = all_queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # release attach_cache'd intermediates (clearCache misses
            # RDD-level checkpoint persists) — 20 queries × N runs of
            # leaked caches would distort later measurements
            release_cached(df)
        timings[name] = round(best, 4)
        print(f"  engine {name}: {best:.3f}s", file=sys.stderr)
    return timings


def run_oracles(sf_dir: str, runs: int) -> dict[str, float]:
    """Same-session DuckDB replay of the headline queries' oracle SQL
    over the identical parquet — best-of-``runs`` wall seconds each."""
    import duckdb

    from etl_processing_scd1_spark.registry import EXTRA_ORACLES, ORACLES

    all_oracles = {**ORACLES, **EXTRA_ORACLES}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = all_oracles.get(name)
        if sql is None:
            continue
        best = float("inf")
        for i in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
            # adaptive repeats: a minutes-heavy oracle (recursive-CTE
            # clustering, LSH replay) gets ONE run — repetition only
            # de-noises cheap queries, and 2× of a 75 s replay would
            # dominate the whole bench wall-clock
            if best > 5.0:
                break
        timings[name] = round(best, 4)
        print(f"  oracle {name}: {best:.3f}s", file=sys.stderr)
    con.close()
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from etl_processing_scd1_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # The host carries ±50% ambient load; per-query min over N runs
    # keeps round-over-round regressions attributable to plan changes
    # rather than noise. Default raised 3→5: round 4 proved min-of-3
    # does NOT suppress the ambient noise (a no-code-change round
    # moved four queries +80..150%).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    timings = run_bench(spark, sf_dir, runs)
    total = round(sum(timings.values()), 4)
    # The oracle side is a baseline yardstick, not a regression
    # detector — min-of-2 bounds the replay cost (several DuckDB
    # oracles — recursive-CTE clustering, unrolled BPE iterations —
    # are minutes-heavy at sf0.1, and 5 runs of each would dominate
    # the whole bench wall-clock).
    oracle_runs = int(os.environ.get("SPARK_GRAFT_ORACLE_RUNS", str(min(runs, 2))))
    oracle = run_oracles(sf_dir, oracle_runs)
    oracle_total = round(sum(oracle.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "oracle": {
                    "engine": "duckdb",
                    "queries": oracle,
                    "total": oracle_total,
                    "engine_vs_oracle": (
                        round(total / oracle_total, 4) if oracle_total else None
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
