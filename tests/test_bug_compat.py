"""As-written bug-compat modes (VERDICT r4 'What's missing' #3): the
reference ships three well-documented quirks — the rule-1
``WHERE 1=1 OR`` vacuous truth (main.py:412-413), the file-dispatch
truthiness (main.py:106-133), and report_dt = transaction day
(main.py:404, already the engine default). The intended semantics
stay the default; these tests pin that the opt-in compat modes
reproduce the as-written behavior exactly, so a migrating user can
replay the old outputs bit-for-bit before switching.
"""

from __future__ import annotations

import datetime as dt

from etl_processing_scd1_spark.plans import fraud_type1
from etl_processing_scd1_spark.sources.readers import scan_drop_dir

from .test_fraud import _warehouse


class TestRule1AsWritten:
    def test_every_transaction_flagged(self, spark):
        tx, cards, accounts, clients, _, blacklist = _warehouse(spark)
        rows = fraud_type1(
            tx, cards, accounts, clients, blacklist, as_written=True
        ).collect()
        # 1=1 OR ... is vacuously true: all 5 transactions land in the
        # report, vs 4 under the intended predicate
        assert len(rows) == 5
        intended = fraud_type1(tx, cards, accounts, clients, blacklist).collect()
        assert len(intended) == 4

    def test_unmatched_rows_keep_null_attributes(self, spark):
        tx, cards, accounts, clients, _, blacklist = _warehouse(spark)
        from decimal import Decimal

        orphan = spark.createDataFrame(
            [("TX", dt.datetime(2021, 3, 1), Decimal("1.0"), "0000", "P", "S", "A1")],
            tx.schema,
        )
        rows = fraud_type1(
            tx.unionByName(orphan), cards, accounts, clients, blacklist,
            as_written=True,
        ).collect()
        # the orphan card matches no dim: as written it is STILL
        # reported, with NULL passport/fio/phone from the left joins
        assert len(rows) == 6
        null_rows = [r for r in rows if r.passport is None]
        assert len(null_rows) == 1
        assert null_rows[0].fio is None and null_rows[0].phone is None


class TestDispatchAsWritten:
    def _scan(self, tmp_path, names, **kw):
        for n in names:
            (tmp_path / n).write_text("x")
        return {f.kind: f.path.split("/")[-1] for f in
                scan_drop_dir(str(tmp_path), **kw)}

    def test_txt_anywhere_routes_to_transactions(self, tmp_path):
        got = self._scan(tmp_path, ["cards_01032021.txt"], as_written=True)
        # ANY .txt file is a transactions file as written ('transactions'
        # and ('.txt' or '.csv') in file ≡ '.txt' in file)
        assert got == {"transactions": "cards_01032021.txt"}
        assert self._scan(tmp_path, ["cards_01032021.txt"]) == {}

    def test_csv_branch_unreachable(self, tmp_path):
        # transactions_*.csv NEVER matches the as-written branch 1
        # (no '.txt' substring) and falls through to skip
        got = self._scan(tmp_path, ["transactions_01032021.csv"], as_written=True)
        assert got == {}
        intended = self._scan(tmp_path, ["transactions_01032021.csv"])
        assert intended == {"transactions": "transactions_01032021.csv"}

    def test_any_other_xlsx_becomes_blacklist(self, tmp_path):
        got = self._scan(tmp_path, ["clients_01032021.xlsx"], as_written=True)
        # 'passport_blacklist' and '.xlsx' in file ≡ '.xlsx' in file
        assert got == {"blacklist": "clients_01032021.xlsx"}
        assert self._scan(tmp_path, ["clients_01032021.xlsx"]) == {}

    def test_terminals_branch_still_wins_for_terminals(self, tmp_path):
        got = self._scan(tmp_path, ["terminals_01032021.xlsx"], as_written=True)
        assert got == {"terminals": "terminals_01032021.xlsx"}

    def test_first_dot_extension_gate(self, tmp_path):
        # format = name.split('.')[1]: 'daily.v2.txt' has "format" v2
        # → skipped even though it ends in .txt
        got = self._scan(tmp_path, ["daily.v2.txt"], as_written=True)
        assert got == {}

    def test_dotless_name_raises_as_written(self, tmp_path):
        # format = file.split('.')[1] → IndexError on 'README';
        # intended mode just skips it
        import pytest

        assert self._scan(tmp_path, ["README"]) == {}
        with pytest.raises(IndexError):
            self._scan(tmp_path, ["README"], as_written=True)

    def test_date_parses_before_routing_as_written(self, tmp_path):
        # main.py:110-111 parses the ddMMyyyy stamp for EVERY
        # allowed-extension file before any branch: 'data.csv' matches
        # no branch but still raises ValueError on its bad stamp
        # (intended mode: silently skipped)
        import pytest

        assert self._scan(tmp_path, ["data.csv"]) == {}
        with pytest.raises(ValueError):
            self._scan(tmp_path, ["data.csv"], as_written=True)
