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


def hilbert_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """2-D Hilbert-curve clustering — same write-side contract as
    :func:`zorder_layout`, better locality: the Hilbert curve is
    CONTINUOUS (consecutive keys are always grid neighbors, where
    Morton order takes long diagonal jumps at power-of-two
    boundaries), so equal-size key ranges cover tighter rectangles
    and footer min/max stats prune more files for the same file
    count. This is why Delta chose Hilbert for liquid clustering.

    The classic per-level rotate/reflect recurrence is data-dependent
    state, unrollable but EXPONENTIAL as one nested expression — so
    each of the ``bits`` levels is materialized as real columns via a
    select (linear codegen, still zero shuffles until the final range
    partition). Two columns only; taken modulo 2^bits like Z-order.
    """
    if len(cols) != 2:
        raise ValueError("hilbert_layout is 2-D; use zorder_layout for other arities")
    mask = (1 << bits) - 1
    out = df.withColumn("__hx__", F.col(cols[0]).cast("long").bitwiseAND(F.lit(mask)))
    out = out.withColumn("__hy__", F.col(cols[1]).cast("long").bitwiseAND(F.lit(mask)))
    out = out.withColumn("__hd__", F.lit(0).cast("long"))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.shiftright("__hx__", level).bitwiseAND(F.lit(1))
        ry = F.shiftright("__hy__", level).bitwiseAND(F.lit(1))
        d2 = F.col("__hd__") + F.lit(s).cast("long") * F.lit(s) * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        ).cast("long")
        # rotation: when ry == 0, optionally reflect then swap x/y
        flip = (ry == 0) & (rx == 1)
        x_ref = F.when(flip, F.lit(s - 1) - F.col("__hx__")).otherwise(F.col("__hx__"))
        y_ref = F.when(flip, F.lit(s - 1) - F.col("__hy__")).otherwise(F.col("__hy__"))
        new_x = F.when(ry == 0, y_ref).otherwise(F.col("__hx__"))
        new_y = F.when(ry == 0, x_ref).otherwise(F.col("__hy__"))
        out = out.select(
            *[c for c in out.columns if c not in ("__hx__", "__hy__", "__hd__")],
            new_x.alias("__hx__"),
            new_y.alias("__hy__"),
            d2.alias("__hd__"),
        )
    return (
        out.repartitionByRange(n_files, "__hd__")
        .sortWithinPartitions("__hd__")
        .drop("__hx__", "__hy__", "__hd__")
    )


def hilbert_index(x: int, y: int, bits: int = 16) -> int:
    """Reference scalar implementation of the same xy→d mapping (for
    tests and documentation parity with the column version)."""
    d = 0
    xx, yy = x, y
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (xx & s) > 0 else 0
        ry = 1 if (yy & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                xx = s - 1 - xx
                yy = s - 1 - yy
            xx, yy = yy, xx
        s >>= 1
    return d
