"""Dump ``explain("formatted")`` for named headline queries to files —
the optimization round's before/after plan evidence
(``plans/r11/<query>_<tag>.txt``).

Usage: python tools/plan_dump.py --tag before [--sf DIR] [--out plans/r11] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", default="plans/r11")
    args = ap.parse_args()

    from etl_processing_scd1_spark.operators.dedup import release_cached
    from etl_processing_scd1_spark.registry import EXTRA_QUERIES, QUERIES
    from etl_processing_scd1_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    allq = {**QUERIES, **EXTRA_QUERIES}
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = allq[name](spark, args.sf)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        dest = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(dest, "w") as fh:
            fh.write(text)
        release_cached(df)
        print(f"wrote {dest} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
