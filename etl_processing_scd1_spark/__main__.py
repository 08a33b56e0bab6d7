"""CLI entry point — the engine's spelling of the reference's cron
command (`55 23 * * * ./main.py`, main.cron:2):

    python -m etl_processing_scd1_spark \
        --warehouse /data/wh --drop-dir /data/incoming \
        [--archive-dir /data/archive] [--day 2021-03-01] \
        [--bank-url jdbc:postgresql://...]

Runs one daily batch (or a multi-day backlog when --day is omitted)
and prints the run report as one JSON line.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_processing_scd1_spark")
    ap.add_argument("--warehouse", required=True, help="warehouse root directory")
    ap.add_argument("--drop-dir", help="incoming file directory")
    ap.add_argument("--archive-dir", help="post-ingest archive directory")
    ap.add_argument("--day", help="business date YYYY-MM-DD (default: all pending)")
    ap.add_argument("--bank-url", help="JDBC url for clients/accounts/cards extract")
    ap.add_argument("--master", default=None, help="spark master (default local[*])")
    args = ap.parse_args(argv)

    from .pipeline import run_day
    from .session import get_spark
    from .sources import read_jdbc_table
    from .storage import Warehouse

    spark = get_spark("etl-daily-run", master=args.master)
    bank = None
    if args.bank_url:
        bank = {
            name: read_jdbc_table(spark, args.bank_url, f"info.{name}")
            for name in ("clients", "accounts", "cards")
        }
    report = run_day(
        spark,
        Warehouse(spark, args.warehouse),
        drop_dir=args.drop_dir,
        archive_dir=args.archive_dir,
        bank_sources=bank,
        day=dt.date.fromisoformat(args.day) if args.day else None,
    )
    print(
        json.dumps(
            {
                "day": str(report.day),
                "dims": report.dim_counts,
                "facts_appended": report.fact_appended,
                "fraud_events": report.fraud_events,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
