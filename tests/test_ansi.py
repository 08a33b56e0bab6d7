"""ANSI-mode compatibility gate: the driver runs queries()/entry() in
ITS OWN SparkSession, where Spark 4 defaults ANSI on — every query
must execute without ANSI cast/arithmetic errors. This test flips the
shared session to ANSI and runs the queries whose expressions do the
riskiest casting (string→decimal/timestamp, double→long, JSON parse,
hex decode, array indexing)."""

from __future__ import annotations

import pytest

from etl_processing_scd1_spark.registry import EXTRA_QUERIES, QUERIES
from tests.conftest import SF0001

ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}

RISKY = [
    "csv_scan",              # string → decimal via regexp_replace
    "excel_serial_dates",    # int arithmetic on dates
    "filename_date_extract", # to_date with format
    "groupby_agg",           # round()*100 → long casts
    "dataset_split",         # conv(hex,16,10) → long % n
    "json_extract_props",    # JSON parse + cast
    "embedding_passthrough", # array element_at + round casts
    "median_agg",            # percentile over casted longs
    "text_quality",          # guarded divisions
    "embedding_quantize",    # round(x/scale) → int with nullif(scale,0) guard
    "repetition_stats",      # basis-point floor divisions, array indexing
    "pii_scrub",             # regexp_count/replace over injected text
    "dedup_clusters",        # iterative joins + localCheckpoint under ANSI
    # round-3 additions with ANSI-sensitive expressions
    "substring_dedup",       # sequence + substring with computed positions
    "bm25_score",            # ln + chained divisions
    "hll_cardinality",       # conv(hex) → BIGINT, shiftleft, computed substr pos
    "hll_merge_proof",       # same derivation, grouped
    "cms_heavy_hitters",     # conv(hex) buckets, min over joined cells
    "bloom_membership",      # conv(hex) % bits, boolean algebra
    "histogram_quantiles",   # integer DIV, rank arithmetic, interpolation
    "pagerank",              # BIGINT DIV chains per iteration
    "gap_fill_interpolate",  # datediff ratios, ignorenulls windows
    "moving_window_agg",     # RANGE frame over casted day numbers
    "order_streaks",         # row_number anchor arithmetic
    "cube_agg",              # GROUPING() bitmask casts
    "scd2_merge_full",       # timestamp literals + null-safe diffs
    "decontaminate",         # 0-based array subscripts in transform()
    "pandas_scalar_udf",     # Arrow scalar UDF round-trip
    "jsonl_scan",            # explicit-schema JSON parse
    "orc_scan",              # ORC round-trip + cents casts
    "incremental_agg_merge", # partial-state sums
    "dq_checks",             # anti-join counts, guarded domains
    "promo_revenue_share",   # conditional cent sums, share division
    "semantic_dedup",        # kmeans fit + within-cluster cosine under ANSI
    "grouped_ols",           # n·Σxy cross terms near the int64 bound
    "pca_power_component",   # exact-integer matvecs + DIV renormalize
    "acf_daily_counts",      # m·Σxy Pearson pieces in BIGINT
    "mutual_nn_align",       # scaled-int dot/norm sums under ANSI
    "geo_cell_radius_join",  # conv() hex parse + squared distances
    "bootstrap_mean_ci",     # conv() md5 uniforms, weighted cent sums
    "seasonal_naive_forecast",  # date-shift abs-error sums
    "item_item_topk",        # co-occurrence counts + cosine ranking
    "dbscan_clusters",       # grid join + star contraction under ANSI
    # round-8 product-analytics + lakehouse-interop additions
    "exact_quantiles_price", # DIV bucketing + driver rank arithmetic
    "heavy_hitters_exact",   # Arrow partition counts + broadcast semi
    "delta_scan",            # partition-column string<->long casts
    "delta_time_travel",     # version-pinned snapshot aggregate
    "xlsx_scan_distributed", # executor parse + string->long casts
]


@pytest.mark.parametrize("name", RISKY)
def test_query_runs_under_ansi(spark, name):
    from etl_processing_scd1_spark.operators.dedup import consuming

    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        with consuming(ALL_QUERIES[name](spark, SF0001)) as df:
            assert df.count() >= 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
