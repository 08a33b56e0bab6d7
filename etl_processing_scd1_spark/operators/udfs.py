"""Arrow scalar pandas UDFs (§2.J third shape, next to applyInPandas
and mapInPandas).

NOTE: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` resolves the function's type hints at decoration time,
and PEP 563 stringified annotations (``'pd.Series'``) are rejected
with UNSUPPORTED_SIGNATURE. Keeping the UDF definitions in this
module isolates that constraint from the rest of the codebase.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized normalization: lowercase, collapse space runs,
    strip — executes per Arrow batch, never row-at-a-time."""
    return s.str.lower().str.replace(r" +", " ", regex=True).str.strip()
