"""End-to-end 3-day replay (SURVEY.md §5, FIXTURES.md §2): a scaled-
down analog of the reference's real 3-day fixture with the same
planted trajectory — terminal insert/update/delete, accumulating
blacklist, idempotent fact re-ingestion, daily city-hop pairs — and
assertions mirroring the verified invariants."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from etl_processing_scd1_spark.pipeline import run_day
from etl_processing_scd1_spark.storage import Warehouse
from .xlsx_util import write_xlsx

DAYS = [dt.date(2021, 3, 1), dt.date(2021, 3, 2), dt.date(2021, 3, 3)]

BASE_TERMINALS = [
    ["A1", "ATM", "Moscow", "addr1"],
    ["A2", "ATM", "Kazan", "addr2"],
    ["P3", "POS", "Moscow", "addr3"],
    ["P4", "POS", "Omsk", "addr4"],
    ["A5", "ATM", "Tver", "addr5"],
]
HEADER = ["terminal_id", "terminal_type", "terminal_city", "terminal_address"]


def _terminals_for_day(day_idx: int) -> list[list[str]]:
    rows = [list(r) for r in BASE_TERMINALS]
    if day_idx >= 1:
        rows[1][3] = "addr2-NEW"        # A2 address change on day 2
        rows[2][3] = "addr3-NEW"        # P3 address change on day 2
    if day_idx == 1:
        rows.append(["P9", "POS", "Sochi", "addr9"])  # appears day 2 only
    if day_idx >= 2:
        rows[2][3] = "addr3-NEWER"      # P3 changes again on day 3
    return [HEADER] + rows


def _transactions_for_day(day: dt.date, start_id: int) -> str:
    """10 rows/day; one Moscow→Kazan hop pair (<1h) per day."""
    lines = ["transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal"]
    for i in range(8):
        lines.append(
            f"{start_id + i};{day} 0{i}:15:00;10{i},4{i};1111 2222 3333 4444;PAYMENT;SUCCESS;A1"
        )
    # the hop pair: same card, A1 (Moscow) then A2 (Kazan), 30 min apart
    lines.append(f"{start_id + 8};{day} 12:00:00;50,00;5555 6666 7777 8888;WITHDRAW;SUCCESS;A1")
    lines.append(f"{start_id + 9};{day} 12:30:00;60,00;5555 6666 7777 8888;WITHDRAW;SUCCESS;A2")
    return "\n".join(lines) + "\n"


def _blacklist_for_day(day_idx: int) -> list[list[object]]:
    # accumulating: 2 → 4 → 6 entries; serial 44256 = 2021-03-01
    rows: list[list[object]] = [["date", "passport"]]
    for k in range(2 * (day_idx + 1)):
        rows.append([44256 + k, f"9{k:03d} 00000{k}"])
    if day_idx < 2:
        rows.append([None, None])  # dirty trailing empty row (day 1-2 files)
    return rows


@pytest.fixture(scope="module")
def bank(spark):
    clients = spark.createDataFrame(
        [
            ("C1", "Ivanov", "Ivan", "I", dt.date(1980, 1, 1), "1111 111111",
             dt.date(2020, 1, 1), "+7 111", dt.datetime(2021, 1, 1), None),
            ("C2", "Petrov", "Petr", "P", dt.date(1990, 2, 2), "9000 000000",
             dt.date(2030, 1, 1), "+7 222", dt.datetime(2021, 1, 1), None),
        ],
        "client_id string, last_name string, first_name string, patronymic string, "
        "date_of_birth date, passport_num string, passport_valid_to date, phone string, "
        "create_dt timestamp, update_dt timestamp",
    )
    accounts = spark.createDataFrame(
        [
            ("ACC1", dt.date(2030, 1, 1), "C1", dt.datetime(2021, 1, 1), None),
            ("ACC2", dt.date(2020, 6, 1), "C2", dt.datetime(2021, 1, 1), None),
        ],
        "account_num string, valid_to date, client string, create_dt timestamp, update_dt timestamp",
    )
    cards = spark.createDataFrame(
        [
            ("1111 2222 3333 4444", "ACC1", dt.datetime(2021, 1, 1), None),
            ("5555 6666 7777 8888", "ACC2", dt.datetime(2021, 1, 1), None),
        ],
        "card_num string, account_num string, create_dt timestamp, update_dt timestamp",
    )
    return {"clients": clients, "accounts": accounts, "cards": cards}


def _write_day_files(drop: str, day_idx: int) -> None:
    day = DAYS[day_idx]
    tag = day.strftime("%d%m%Y")
    with open(os.path.join(drop, f"transactions_{tag}.txt"), "w") as fh:
        fh.write(_transactions_for_day(day, start_id=1000 + 100 * day_idx))
    write_xlsx(os.path.join(drop, f"terminals_{tag}.xlsx"), _terminals_for_day(day_idx))
    write_xlsx(
        os.path.join(drop, f"passport_blacklist_{tag}.xlsx"), _blacklist_for_day(day_idx)
    )


def test_three_day_replay(spark, tmp_path, bank):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    drop, archive = str(tmp_path / "drop"), str(tmp_path / "archive")
    os.makedirs(drop)

    reports = []
    for i, day in enumerate(DAYS):
        _write_day_files(drop, i)
        reports.append(
            run_day(
                spark, wh, drop_dir=drop, archive_dir=archive, bank_sources=bank,
                run_ts=dt.datetime.combine(day, dt.time(23, 55)), day=day,
            )
        )

    # dim_terminals trajectory: 5 → 6 → 5 (FIXTURES: insert day2, delete day3)
    assert [r.dim_counts["terminals"]["rows"] for r in reports] == [5, 6, 5]
    assert reports[1].dim_counts["terminals"]["inserted"] == 1   # P9
    assert reports[1].dim_counts["terminals"]["updated"] == 2    # A2, P3
    assert reports[2].dim_counts["terminals"]["deleted"] == 1    # P9 gone
    assert reports[2].dim_counts["terminals"]["updated"] == 1    # P3 again

    # final terminal state = day-3 values; create_dt = first-seen file date
    terms = {r["terminal_id"]: r for r in wh.read("terminals").collect()}
    assert terms["P3"]["terminal_address"] == "addr3-NEWER"
    assert terms["A2"]["terminal_address"] == "addr2-NEW"
    assert "P9" not in terms
    assert terms["A1"]["create_dt"] == dt.datetime(2021, 3, 1)
    assert terms["A1"]["update_dt"] is None  # files carry no update_dt

    # facts accumulate 10/day; blacklist 2 → 4 → 6 (anti-join dedup)
    assert wh.read("transactions").count() == 30
    assert [r.fact_appended["blacklist"] for r in reports] == [2, 2, 2]
    assert wh.read("blacklist").count() == 6

    # watermark equals the day's file date (files carry no update_dt)
    meta = {r["table_name"]: r["max_update_dt"] for r in wh.read("meta").collect()}
    assert meta["terminals"] == dt.datetime(2021, 3, 3)

    # fraud: rule 1 (C1 expired passport) & rule 2 (ACC2 expired) flag rows;
    # rule 3 re-scans full history → 1/2/3 cumulative hop events per day
    assert [r.fraud_events.get("3", 0) for r in reports] == [1, 2, 3]
    rep = wh.read("rep_fraud")
    assert rep.filter("event_type = '3'").count() == 1 + 2 + 3  # accumulation by design
    # later transaction of each pair is the flagged one
    flagged3 = {r["event_dt"] for r in rep.filter("event_type = '3'").collect()}
    assert flagged3 == {dt.datetime.combine(d, dt.time(12, 30)) for d in DAYS}

    # all inputs archived with .backup suffix (pdf p.5 protocol)
    assert len(os.listdir(archive)) == 9
    assert all(n.endswith(".backup") for n in os.listdir(archive))
    assert os.listdir(drop) == []


def test_rerun_same_day_is_idempotent(spark, tmp_path, bank):
    wh = Warehouse(spark, str(tmp_path / "wh2"))
    drop = str(tmp_path / "drop2")
    os.makedirs(drop)
    _write_day_files(drop, 0)
    r1 = run_day(spark, wh, drop_dir=drop, bank_sources=bank,
                 run_ts=dt.datetime(2021, 3, 1, 23, 55), day=DAYS[0])
    # re-deliver the same files (no archive_dir → files still present)
    r2 = run_day(spark, wh, drop_dir=drop, bank_sources=bank,
                 run_ts=dt.datetime(2021, 3, 2, 23, 55), day=DAYS[0])
    assert r1.fact_appended["transactions"] == 10
    assert r2.fact_appended["transactions"] == 0   # G4 idempotence
    assert r2.dim_counts["terminals"]["updated"] == 0
    assert wh.read("transactions").count() == 10


def test_backlog_single_run_processes_all_days(spark, tmp_path, bank):
    """day=None with a 3-day backlog: transaction/blacklist increments
    union across days; the terminals snapshot merge uses only the
    LATEST day (an older snapshot must not resurrect deleted rows)."""
    wh = Warehouse(spark, str(tmp_path / "wh3"))
    drop = str(tmp_path / "drop3")
    os.makedirs(drop)
    for i in range(3):
        _write_day_files(drop, i)
    rep = run_day(spark, wh, drop_dir=drop, bank_sources=bank,
                  run_ts=dt.datetime(2021, 3, 3, 23, 55), day=None)
    assert rep.fact_appended["transactions"] == 30   # all 3 days unioned
    assert wh.read("blacklist").count() == 6          # accumulating dedup
    terms = {r["terminal_id"]: r for r in wh.read("terminals").collect()}
    assert len(terms) == 5 and "P9" not in terms      # day-3 snapshot wins
    assert terms["P3"]["terminal_address"] == "addr3-NEWER"
    # velocity rule sees the full 3-day history in one pass
    assert rep.fraud_events.get("3", 0) == 3
