from .readers import (
    read_blacklist_excel,
    read_jdbc_table,
    read_parquet_table,
    read_transactions_csv,
    read_xlsx,
    scan_drop_dir,
)

__all__ = [
    "read_blacklist_excel",
    "read_jdbc_table",
    "read_parquet_table",
    "read_transactions_csv",
    "read_xlsx",
    "scan_drop_dir",
]
