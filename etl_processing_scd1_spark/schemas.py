"""Schema registry (SURVEY.md §1.2-1.3).

The reference declares fixed DDL schemas (main.ddl) but discovers
them at runtime from information_schema and aligns pandas frames to
them positionally (main.py:48-62). Here the registry is explicit
``StructType``s; positional alignment is ``align_positional`` below.

Type mapping (SURVEY §1.3): VARCHAR/BPCHAR → StringType (length
unenforced; blank-padding handled at join time by trim_key),
DECIMAL(18,5) → DecimalType(18,5), DATE → DateType,
TIMESTAMP(0) → TimestampType (second precision, truncated on write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DateType,
    DecimalType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_S = StringType()
_D = DateType()
_TS = TimestampType()
_AMT = DecimalType(18, 5)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


TECHNICAL_COLS = ("create_dt", "update_dt", "processed_dt")
_TECH = [(c, _TS) for c in TECHNICAL_COLS]

# Staging/dim pairs share business columns (main.ddl:7-142); dims add
# nothing beyond staging, so one schema serves both layers.
TERMINALS = _st(
    ("terminal_id", _S), ("terminal_type", _S), ("terminal_city", _S),
    ("terminal_address", _S), *_TECH,
)
CLIENTS = _st(
    ("client_id", _S), ("last_name", _S), ("first_name", _S), ("patronymic", _S),
    ("date_of_birth", _D), ("passport_num", _S), ("passport_valid_to", _D),
    ("phone", _S), *_TECH,
)
ACCOUNTS = _st(("account_num", _S), ("valid_to", _D), ("client", _S), *_TECH)
CARDS = _st(("card_num", _S), ("account_num", _S), *_TECH)
TRANSACTIONS = _st(
    ("trans_id", _S), ("trans_date", _TS), ("amt", _AMT), ("card_num", _S),
    ("oper_type", _S), ("oper_result", _S), ("terminal", _S),
)
BLACKLIST = _st(("entry_dt", _TS), ("passport_num", _S))
REP_FRAUD = _st(
    ("event_dt", _TS), ("passport", _S), ("fio", _S), ("phone", _S),
    ("event_type", _S), ("report_dt", _TS),
)
META = _st(("schema_name", _S), ("table_name", _S), ("max_update_dt", _TS))

# Raw file schemas (pre-alignment): transactions CSV carries the
# amount as a comma-decimal STRING (main.py:116); blacklist XLSX
# carries the date as an Excel serial number (main.py:129).
TRANSACTIONS_CSV_RAW = _st(
    ("transaction_id", _S), ("transaction_date", _TS), ("amount", _S),
    ("card_num", _S), ("oper_type", _S), ("oper_result", _S), ("terminal", _S),
)
BLACKLIST_RAW = _st(("date", StringType()), ("passport", _S))

WAREHOUSE: dict[str, StructType] = {
    "terminals": TERMINALS,
    "clients": CLIENTS,
    "accounts": ACCOUNTS,
    "cards": CARDS,
    "transactions": TRANSACTIONS,
    "blacklist": BLACKLIST,
    "rep_fraud": REP_FRAUD,
    "meta": META,
}

# SCD1 merge configuration per dimension: natural key + the columns
# the null-safe diff compares (all business cols except the key),
# mirroring the reference's per-dim UPDATE statements (main.py:183-324).
DIM_KEYS: dict[str, str] = {
    "terminals": "terminal_id",
    "clients": "client_id",
    "accounts": "account_num",
    "cards": "card_num",
}


def business_cols(name: str) -> list[str]:
    """Schema columns minus the technical audit columns (B3)."""
    return [f.name for f in WAREHOUSE[name].fields if f.name not in TECHNICAL_COLS]


def compare_cols(name: str) -> list[str]:
    """Columns the SCD1 diff inspects: business cols minus the key."""
    return [c for c in business_cols(name) if c != DIM_KEYS[name]]


def align_positional(df: DataFrame, target_cols: list[str]) -> DataFrame:
    """Rename-by-position then reorder — the reference's
    ``df.columns = catalog_cols`` alignment (B1, main.py:61-62).

    Narrow (no shuffle); purely a projection, so Catalyst still
    prunes unused columns upstream of it.
    """
    if len(df.columns) != len(target_cols):
        raise ValueError(
            f"positional alignment arity mismatch: {len(df.columns)} -> {len(target_cols)}"
        )
    return df.toDF(*target_cols).select(*target_cols)
