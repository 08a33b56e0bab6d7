"""Fraud rules on a reference-shaped synthetic warehouse (FIXTURES.md
§1.4 planted events): expired passport, blacklisted passport, expired
account contract, city-hop velocity — including the trim/space join-key
normalization and NULL-propagating fio."""

from __future__ import annotations

import datetime as dt
import functools

from pyspark.sql import functions as F

from etl_processing_scd1_spark.plans import fraud_type1, fraud_type2, fraud_type3

D = dt.datetime
TX = functools.partial(D, 2021, 3, 1)


def _warehouse(spark):
    clients = spark.createDataFrame(
        [
            # client, names, dob, passport, valid_to, phone
            ("C1", "Ivanov", "Ivan", "Ivanovich", dt.date(1980, 1, 1),
             "1111 111111", dt.date(2020, 1, 1), "+7 111"),   # expired passport
            ("C2", "Petrov", "Petr", None, dt.date(1990, 2, 2),
             "2222 222222", dt.date(2030, 1, 1), "+7 222"),   # blacklisted; NULL patronymic
            ("C3", "Sidorov", "S", "S", dt.date(1970, 3, 3),
             "3333 333333", None, "+7 333"),                  # clean (NULL valid_to → never flagged)
        ],
        "client_id string, last_name string, first_name string, patronymic string, "
        "date_of_birth date, passport_num string, passport_valid_to date, phone string",
    )
    accounts = spark.createDataFrame(
        [
            ("ACC1              ", dt.date(2030, 1, 1), "C1"),  # BPCHAR padding
            ("ACC2", dt.date(2030, 1, 1), "C2"),
            ("ACC3", dt.date(2021, 1, 1), "C3"),                # expired contract
        ],
        "account_num string, valid_to date, client string",
    )
    cards = spark.createDataFrame(
        [
            ("1111 2222 3333 4444", "ACC1"),
            ("5555 6666 7777 8888   ", "ACC2"),  # BPCHAR trailing padding (trim key)
            ("9999 0000 1111 2222", "ACC3"),
        ],
        "card_num string, account_num string",
    )
    terminals = spark.createDataFrame(
        [("A1", "ATM", "Moscow", "a"), ("A2", "ATM", "Kazan", "b"), ("A3", "ATM", "Moscow", "c")],
        "terminal_id string, terminal_type string, terminal_city string, terminal_address string",
    )
    transactions = spark.createDataFrame(
        [
            ("T1", TX(10, 0, 0), 100.0, "1111 2222 3333 4444", "PAYMENT", "SUCCESS", "A1"),
            ("T2", TX(11, 0, 0), 100.0, "5555 6666 7777 8888", "PAYMENT", "SUCCESS", "A1"),
            ("T3", TX(12, 0, 0), 100.0, "9999 0000 1111 2222", "PAYMENT", "SUCCESS", "A1"),
            # city-hop pair for card C2 within 30 min (A1 Moscow → A2 Kazan)
            ("T4", TX(11, 30, 0), 50.0, "5555 6666 7777 8888", "WITHDRAW", "SUCCESS", "A2"),
            # same-city pair within the hour → NOT flagged (A1 → A3 both Moscow)
            ("T5", TX(10, 20, 0), 50.0, "1111 2222 3333 4444", "WITHDRAW", "SUCCESS", "A3"),
        ],
        "trans_id string, trans_date timestamp, amt double, card_num string, "
        "oper_type string, oper_result string, terminal string",
    ).withColumn("amt", F.col("amt").cast("decimal(18,5)"))
    blacklist = spark.createDataFrame(
        [(D(2021, 2, 1), "2222 222222")], "entry_dt timestamp, passport_num string"
    )
    return transactions, cards, accounts, clients, terminals, blacklist


def test_rule1_expired_or_blacklisted(spark):
    tx, cards, accounts, clients, terminals, blacklist = _warehouse(spark)
    rows = fraud_type1(tx, cards, accounts, clients, blacklist).collect()
    by_passport = {}
    for r in rows:
        by_passport.setdefault(r["passport"], []).append(r)
    # C1: expired passport → T1 and T5; C2: blacklisted → T2 and T4; C3 clean.
    assert sorted(by_passport) == ["1111 111111", "2222 222222"]
    assert len(by_passport["1111 111111"]) == 2
    assert len(by_passport["2222 222222"]) == 2
    # NULL patronymic → NULL fio (D3 concat semantics preserved)
    assert all(r["fio"] is None for r in by_passport["2222 222222"])
    assert by_passport["1111 111111"][0]["fio"] == "Ivanov Ivan Ivanovich"
    assert all(r["event_type"] == "1" for r in rows)


def test_rule2_expired_contract(spark):
    tx, cards, accounts, clients, terminals, _ = _warehouse(spark)
    rows = fraud_type2(tx, cards, accounts, clients).collect()
    assert [r["passport"] for r in rows] == ["3333 333333"]  # only ACC3/T3
    assert rows[0]["report_dt"] == D(2021, 3, 1)  # day-truncated (D6)


def test_rule3_city_velocity_flags_later_tx(spark):
    tx, cards, accounts, clients, terminals, _ = _warehouse(spark)
    rows = fraud_type3(tx, cards, accounts, clients, terminals).collect()
    # Only the Moscow→Kazan hop, flagged on the LATER transaction (T4 11:30).
    assert len(rows) == 1
    assert rows[0]["event_dt"] == TX(11, 30, 0)
    assert rows[0]["passport"] == "2222 222222"
    assert rows[0]["event_type"] == "3"
