from .scalars import (
    comma_decimal,
    day_of,
    excel_serial_to_date,
    fio,
    filename_business_date,
    hours_between,
    normalize_card_num,
    null_safe_differs,
    trim_key,
)

__all__ = [
    "comma_decimal",
    "day_of",
    "excel_serial_to_date",
    "fio",
    "filename_business_date",
    "hours_between",
    "normalize_card_num",
    "null_safe_differs",
    "trim_key",
]
