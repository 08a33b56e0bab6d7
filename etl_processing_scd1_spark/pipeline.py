"""Daily pipeline driver — the engine's EP-1 (SURVEY.md §3).

Reproduces the reference's nightly run (main.py top-to-bottom) as a
functional recompute over a Parquet warehouse:

  ingest files + bank extracts → SCD1-merge 4 dims → append-dedup
  2 facts → advance watermarks → run fraud rules 1-3 appending to
  the accumulating report → atomic multi-table publish.

Differences from the reference, all documented in SURVEY §7:
intended (not bugged) file routing and rule-1 predicate; one
``processed_dt`` literal captured per run (deterministic replays);
watermarks actually consumed for incremental extracts.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas
from .operators import append_dedup, scd1_merge, upsert_watermark, watermark_of
from .operators.meta import empty_meta
from .plans import fraud_type1, fraud_type2, fraud_type3
from .sources import read_blacklist_excel, read_transactions_csv, read_xlsx
from .sources.readers import archive_file, scan_drop_dir
from .storage import Warehouse


@dataclass
class RunReport:
    day: dt.date
    dim_counts: dict[str, dict[str, int]] = field(default_factory=dict)
    fact_appended: dict[str, int] = field(default_factory=dict)
    fraud_events: dict[str, int] = field(default_factory=dict)


def _with_audit(df: DataFrame, business_date: dt.date, processed_dt) -> DataFrame:
    """B2: file snapshots carry no technical columns — default
    create_dt := file business date, update_dt := NULL
    (main.py:121-125)."""
    return df.select(
        "*",
        F.lit(str(business_date)).cast("timestamp").alias("create_dt"),
        F.lit(None).cast("timestamp").alias("update_dt"),
        processed_dt.alias("processed_dt"),
    )


def _load_terminals_file(spark: SparkSession, path: str) -> DataFrame:
    raw = read_xlsx(spark, path)
    return schemas.align_positional(
        raw, ["terminal_id", "terminal_type", "terminal_city", "terminal_address"]
    )


def run_day(
    spark: SparkSession,
    warehouse: Warehouse,
    drop_dir: str | None = None,
    archive_dir: str | None = None,
    bank_sources: dict[str, DataFrame] | None = None,
    run_ts: dt.datetime | None = None,
    day: dt.date | None = None,
) -> RunReport:
    """One daily batch. ``bank_sources`` supplies clients/accounts/
    cards frames (JDBC in production — sources.read_jdbc_table);
    ``drop_dir`` supplies the day's files. Either may be absent.
    """
    run_ts = run_ts or dt.datetime.now()
    processed = F.lit(run_ts.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    report = RunReport(day=day or run_ts.date())
    meta = warehouse.read("meta", schemas.META) if warehouse.exists("meta") else empty_meta(spark)

    # ---- extract: drop-dir files (EP-2) ---------------------------------
    # Backlog semantics (day=None, several days of files pending):
    # increment-style files (transactions, accumulating blacklist)
    # UNION across days; full-snapshot dims keep only the LATEST
    # business date — merging an older snapshot after a newer one
    # would resurrect deleted rows. scan_drop_dir sorts by date, so
    # "last wins" is the latest for snapshots.
    staged: dict[str, DataFrame] = {}
    processed_files = []
    for f in scan_drop_dir(drop_dir) if drop_dir else []:
        if day is not None and f.business_date != day:
            continue
        if f.kind == "transactions":
            df = read_transactions_csv(spark, f.path)
            staged["transactions"] = (
                staged["transactions"].unionByName(df)
                if "transactions" in staged
                else df
            )
        elif f.kind == "terminals":
            staged["terminals"] = _with_audit(
                _load_terminals_file(spark, f.path), f.business_date, processed
            )
        elif f.kind == "blacklist":
            df = read_blacklist_excel(spark, f.path)
            staged["blacklist"] = (
                staged["blacklist"].unionByName(df) if "blacklist" in staged else df
            )
        processed_files.append(f)

    # ---- extract: bank tables (A4) --------------------------------------
    for name in ("clients", "accounts", "cards"):
        if bank_sources and name in bank_sources:
            src = bank_sources[name]
            if "processed_dt" not in src.columns:
                src = src.select("*", processed.alias("processed_dt"))
            staged[name] = src

    # ---- transform: SCD1 merge per dimension (G1-G3) --------------------
    for dim_name in ("terminals", "clients", "accounts", "cards"):
        if dim_name not in staged:
            continue
        dim = warehouse.read(dim_name, schemas.WAREHOUSE[dim_name])
        res = scd1_merge(
            dim,
            staged[dim_name],
            key=schemas.DIM_KEYS[dim_name],
            compare_cols=schemas.compare_cols(dim_name),
            processed_dt=processed,
        )
        report.dim_counts[dim_name] = res.counts()
        warehouse.stage(dim_name, res.merged)
        # counts + stage materialized every leg — release the shared
        # classification cache (leaks one dim-sized cache per merge
        # otherwise)
        res.unpersist()
        # watermark per staging table (G5) — and unlike the reference,
        # consumed next run to bound the extract.
        meta = upsert_watermark(
            spark, meta, "warehouse", dim_name, watermark_of(staged[dim_name])
        )

    # ---- facts: append-dedup (G4) ---------------------------------------
    # Only NEW rows are written (stage_append): the daily fact write
    # is O(batch) — the full-history union+overwrite a naive port
    # would do is the one thing that cannot survive a 100 TB fact.
    fact_specs = {"transactions": "trans_id", "blacklist": "passport_num"}
    for fact_name, id_col in fact_specs.items():
        if fact_name not in staged:
            continue
        fact = warehouse.read(fact_name, schemas.WAREHOUSE[fact_name])
        # Incremental dedup: the anti join's fact side is pruned to
        # the staged batch's day range (directory-level partition
        # pruning on p_day). Exact under the source protocol —
        # re-deliveries carry the same business dates (pdf p.5); a
        # same-id-different-date corruption would bypass this prune.
        fact_filter = None
        if fact_name == "transactions" and "p_day" in fact.columns:
            rng = staged[fact_name].agg(
                F.min(F.to_date("trans_date")).alias("lo"),
                F.max(F.to_date("trans_date")).alias("hi"),
            ).first()
            if rng["lo"] is not None:
                fact_filter = F.col("p_day").between(rng["lo"], rng["hi"])
        new_rows = append_dedup(
            fact, staged[fact_name], id_col=id_col, fact_filter=fact_filter
        )
        report.fact_appended[fact_name] = new_rows.count()
        if fact_name == "transactions":
            # day-partitioned fact: scans filtered on p_day prune at
            # the directory level (rule windows, incremental dedup)
            warehouse.stage_append(
                fact_name,
                new_rows.withColumn("p_day", F.to_date("trans_date")),
                partition_cols=["p_day"],
            )
        else:
            warehouse.stage_append(fact_name, new_rows)

    warehouse.stage("meta", meta)

    # ---- report: fraud rules over the POST-merge state (H1-H3) ----------
    # The reference queries the freshly-merged warehouse inside the
    # same transaction; here the staged frames play that role.
    def current(name: str) -> DataFrame:
        base = warehouse.staged_view(name)
        if base is None:
            base = warehouse.read(name, schemas.WAREHOUSE[name])
        appended = warehouse.staged_view(f"{name}@append")
        if appended is not None:
            base = base.unionByName(appended, allowMissingColumns=True)
        return base

    tx, cards, accounts, clients, terminals, blacklist = (
        current("transactions"),
        current("cards"),
        current("accounts"),
        current("clients"),
        current("terminals"),
        current("blacklist"),
    )
    new_events = (
        fraud_type1(tx, cards, accounts, clients, blacklist)
        .unionByName(fraud_type2(tx, cards, accounts, clients))
        .unionByName(fraud_type3(tx, cards, accounts, clients, terminals))
    )
    for row in new_events.groupBy("event_type").count().collect():
        report.fraud_events[row["event_type"]] = row["count"]
    # accumulating report: append-only, O(new events) per run (A10)
    warehouse.stage_append("rep_fraud", new_events)

    # ---- commit (G6) -----------------------------------------------------
    warehouse.publish(run_id=run_ts.strftime("%Y%m%d%H%M%S"))
    if archive_dir:
        for f in processed_files:
            archive_file(f.path, archive_dir)
    return report
