"""Scale-curve harness: run the headline bench at every available
scale factor and write BENCH_scaling.md — the evidence that per-query
cost grows ~linearly in data size (the property that predicts 100 TB
behavior from local runs; fixed JVM/task constants dominate the small
SFs and amortize away as data grows).

Usage: python tools/bench_scaling.py [--runs N] [--out BENCH_scaling.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = [0.001, 0.01, 0.1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="BENCH_scaling.md")
    args = ap.parse_args()

    from bench import HEADLINE, run_bench
    from etl_processing_scd1_spark.session import get_spark

    spark = get_spark("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[float, dict[str, float]] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        if not os.path.isdir(sf_dir):
            continue
        results[sf] = run_bench(spark, sf_dir, args.runs)
        print(json.dumps({"sf": sf, "total": round(sum(results[sf].values()), 3)}))

    sfs = sorted(results)
    lines = [
        "# BENCH_scaling — headline queries across scale factors",
        "",
        f"Best-of-{args.runs} wall seconds per query on local[32]; rows grow",
        "100× across the sweep (sf0.001 → sf0.1). The interesting column is",
        "the growth ratio t(sf0.1)/t(sf0.001): a scan-bound linear query on",
        "100× data with a fixed per-query constant c shows",
        "(c + 100·w)/(c + w) ≪ 100 — small ratios mean the constant (JVM",
        "task launch, plan compile, Python worker spin-up) dominates at",
        "test scale and AMORTIZES at the 100 TB design point; a ratio",
        "materially ABOVE the data growth would flag super-linear work",
        "(the skew/quadratic failure modes the plan gates guard against).",
        "",
        "| query | " + " | ".join(f"sf{sf}" for sf in sfs) + " | ratio hi/lo |",
        "|---|" + "---|" * (len(sfs) + 1),
    ]
    for name in HEADLINE:
        vals = [results[sf][name] for sf in sfs]
        ratio = vals[-1] / vals[0] if vals[0] > 0 else float("inf")
        lines.append(
            f"| {name} | "
            + " | ".join(f"{v:.3f}" for v in vals)
            + f" | {ratio:.1f}× |"
        )
    totals = [sum(results[sf].values()) for sf in sfs]
    lines.append(
        "| **total** | "
        + " | ".join(f"{t:.3f}" for t in totals)
        + f" | {totals[-1] / totals[0]:.1f}× |"
    )
    lines.append("")
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
