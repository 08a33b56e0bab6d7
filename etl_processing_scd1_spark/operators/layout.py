"""Data-layout operators: multi-dimensional clustering (Z-order) for
write-side file skipping.

Parquet scans prune twice: directory-level on hive partitions, then
row-group-level on column min/max statistics. Partitioning handles
ONE dimension; when queries filter on a second high-cardinality
column (custkey within day, user within hour), natural append order
leaves every file's min/max spanning the whole key domain — stats
prune nothing. Z-ordering interleaves the bits of the filter columns
into one sort key, so each written file covers a small rectangle of
the key space and most files are skipped by their footer stats alone.

This is the layout layer under Delta/Iceberg OPTIMIZE ZORDER BY,
implemented with plain DataFrame ops: compute the interleaved key,
range-repartition on it (contiguous key rectangles per output file),
and drop the key before writing. At 100 TB the rewrite is one range
shuffle of the table — scheduled like compaction, not per-ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative
    integral) column into one BIGINT Morton key — built-in bit
    expressions only, JVM codegen end to end.

    Columns are taken modulo 2^bits (callers bucket or rank values
    first if their domain exceeds it); total key width
    ``bits * len(cols)`` must fit 63 bits."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError("interleaved key exceeds 63 bits")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Return ``df`` arranged so each of ``n_files`` output partitions
    covers a contiguous Z-order rectangle of ``cols`` (write with
    ``.write.parquet`` afterwards; each partition becomes one file).

    Range partitioning on the Morton key gives equi-sized contiguous
    key ranges; the within-partition sort tightens per-row-group
    stats as well. The key column is internal and dropped."""
    key = zorder_key([F.col(c) for c in cols], bits=bits)
    return (
        df.withColumn("__z__", key)
        .repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
    )
