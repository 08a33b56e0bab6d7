"""sf1 determinism evidence for the heavy dedup family (r8 verdict
item 2 / r7 brief item 8).

The six queries with the biggest engine-vs-oracle wins
(near_dedup_minhash, dedup_apply, containment_dedup_full,
edit_distance_dedup, dedup_keep_best, golden_record) have sf1 TIMING
rows in BENCH_scaling.md but no sf1 VALUE evidence: their DuckDB
oracles are quadratic / recursive-CTE replays that are
wall-clock-infeasible at sf1. This tool produces the two evidence
kinds the verdict asks for, in one run:

1. **Measured oracle infeasibility**: one capped DuckDB replay per
   query at sf1 (cap $SPARK_GRAFT_ORACLE_CAP, default 300 s) —
   records either the real wall seconds or the ">= cap" lower bound
   that justifies skipping the hash comparison.

2. **Engine-side sf1 determinism**: each query runs THREE times —
   (a) baseline session config, (b) an independent second run
   (cache-cleared), (c) a PERTURBED run with different scan split
   sizes and shuffle partition count (spark.sql.files
   .maxPartitionBytes 32m, spark.sql.shuffle.partitions 17 vs the
   engine default 32) — and all three canonical frame digests must be
   identical. The perturbed run changes both the scan partitioning
   and every shuffle's layout, so digest equality demonstrates the
   result is independent of physical partitioning — the property the
   oracle hash would have certified.

The canonical digest matches the driver's comparison contract:
columns sorted by name, rows sorted by their full value tuple,
sha256 over the rendered rows.

Usage:  python tools/sf1_determinism.py [--sf .scratch/sf1] [names...]
Writes SF1_DETERMINISM.json at the repo root and prints one summary
line per query.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILY = [
    "near_dedup_minhash",
    "dedup_apply",
    "containment_dedup_full",
    "edit_distance_dedup",
    "dedup_keep_best",
    "golden_record",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def frame_digest(df) -> tuple[str, int]:
    """Driver-contract canonical hash: sort columns by name, sort rows
    by full value tuple, sha256 the rendered rows."""
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    rendered = sorted(
        tuple("\0" if v is None else repr(v) for v in row) for row in rows
    )
    h = hashlib.sha256()
    for r in rendered:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest(), len(rendered)


def oracle_probe(sf_dir: str, names: list[str], cap: float) -> dict:
    import duckdb

    from etl_processing_scd1_spark.registry import EXTRA_ORACLES, ORACLES

    all_oracles = {**ORACLES, **EXTRA_ORACLES}
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out = {}
    for name in names:
        sql = all_oracles[name]
        import threading

        interrupter = threading.Timer(cap, con.interrupt)
        interrupter.start()
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
            elapsed = time.perf_counter() - t0
            out[name] = {"oracle_sec": round(elapsed, 1), "capped": False}
            print(f"  oracle {name}: {elapsed:.1f}s", file=sys.stderr)
        except duckdb.Error:
            elapsed = time.perf_counter() - t0
            out[name] = {"oracle_sec": round(elapsed, 1), "capped": True}
            print(f"  oracle {name}: CAPPED >= {elapsed:.1f}s", file=sys.stderr)
        finally:
            interrupter.cancel()
    con.close()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--sf", default=os.path.join(REPO, ".scratch/sf1"))
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()
    names = args.names or FAMILY
    cap = float(os.environ.get("SPARK_GRAFT_ORACLE_CAP", "300"))

    from etl_processing_scd1_spark.operators.dedup import release_cached
    from etl_processing_scd1_spark.registry import EXTRA_QUERIES, QUERIES
    from etl_processing_scd1_spark.session import get_spark

    all_queries = {**QUERIES, **EXTRA_QUERIES}
    spark = get_spark("sf1-determinism")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {
        "sf_dir": args.sf,
        "oracle_cap_sec": cap,
        "perturbation": {
            "spark.sql.files.maxPartitionBytes": "32m",
            "spark.sql.shuffle.partitions": "17",
        },
        "queries": {},
    }
    ok = True
    for name in names:
        digests = []
        for run, perturb in ((1, False), (2, False), (3, True)):
            spark.catalog.clearCache()
            if perturb:
                spark.conf.set("spark.sql.files.maxPartitionBytes", "32m")
                spark.conf.set("spark.sql.shuffle.partitions", "17")
            try:
                t0 = time.perf_counter()
                df = all_queries[name](spark, args.sf)
                digest, n = frame_digest(df)
                release_cached(df)
                digests.append(
                    {"digest": digest, "rows": n,
                     "sec": round(time.perf_counter() - t0, 1),
                     "perturbed": perturb}
                )
            finally:
                if perturb:
                    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
                    spark.conf.set("spark.sql.shuffle.partitions", "32")
        same = len({d["digest"] for d in digests}) == 1
        ok = ok and same
        report["queries"][name] = {"runs": digests, "deterministic": same}
        print(
            f"  {name}: rows={digests[0]['rows']} "
            f"{'DETERMINISTIC' if same else 'DIGEST MISMATCH'} "
            f"(run secs: {[d['sec'] for d in digests]})",
            file=sys.stderr,
        )

    if not args.skip_oracle:
        report["oracle_probe"] = oracle_probe(args.sf, names, cap)

    out_path = os.path.join(REPO, "SF1_DETERMINISM.json")
    if args.names and os.path.exists(out_path):
        # explicit-subset run: MERGE into the standing report instead
        # of clobbering the other queries' evidence
        with open(out_path) as fh:
            standing = json.load(fh)
        standing["queries"].update(report["queries"])
        if "oracle_probe" in report:
            standing.setdefault("oracle_probe", {}).update(
                report["oracle_probe"]
            )
        report = standing
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(
        {
            "deterministic": ok,
            "queries": {
                n: q["deterministic"] for n, q in report["queries"].items()
            },
        },
        separators=(",", ":"),
    ))
    return 0 if ok else 1


if __name__ == "__main__":
    main()
