"""Z-order layout tests: the written files must cover small
rectangles of the key space (measured from real parquet footer
stats), and a selective filter must touch far fewer files than under
natural order."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_processing_scd1_spark.operators.layout import zorder_key, zorder_layout


def _file_spans(path: str, col: str) -> list[tuple[int, int]]:
    """Per-parquet-file (min, max) of ``col`` read from the footers —
    the exact statistics a scan's row-group pruning consults."""
    import pyarrow.parquet as pq

    spans = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        if lo is not None:
            spans.append((lo, hi))
    return spans


def test_zorder_key_interleaves_bits(spark):
    rows = spark.createDataFrame([(3, 5)], "x long, y long").select(
        zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
    )
    # x=0b0011, y=0b0101 -> interleaved (y bit above x bit per level):
    # bit pairs low->high: (x0=1,y0=1),(x1=1,y1=0),(x2=0,y2=1),(x3=0,y3=0)
    # z = 0b..(y2 x2)(y1 x1)(y0 x0) = 0b100111 = 39
    assert rows.collect()[0]["z"] == 0b100111


def test_zorder_files_cover_small_rectangles(spark, tmp_path):
    """16 files over a 256x256 uniform grid: natural (row-id) order
    leaves every file spanning ~the whole x domain; Z-order files
    must each span a small fraction, and a point filter on x must
    match few files by their footer stats."""
    n, n_files = 1 << 14, 16
    base = spark.range(n).select(
        (F.col("id") % 256).alias("x"),
        ((F.col("id") * 2654435761) % 256).alias("y"),
        F.col("id").alias("payload"),
    )
    nat_dir, z_dir = str(tmp_path / "nat"), str(tmp_path / "zord")
    base.repartition(n_files).write.parquet(nat_dir)
    zorder_layout(base, ["x", "y"], n_files=n_files, bits=8).write.parquet(z_dir)

    nat_spans = _file_spans(nat_dir, "x")
    z_spans = _file_spans(z_dir, "x")
    assert len(z_spans) == n_files
    nat_avg = sum(hi - lo for lo, hi in nat_spans) / len(nat_spans)
    z_avg = sum(hi - lo for lo, hi in z_spans) / len(z_spans)
    # natural order: every file spans ~255 of x; z-order: small boxes
    # (range-partition sampling jitters the exact boundaries, so the
    # margin is 2x, and the point-filter assertion below is the hard
    # evidence of skipping)
    assert nat_avg > 200
    assert z_avg < nat_avg / 2
    # a scan filtering x == 17 consults footer stats: count the files
    # whose [min,max] admits the value
    nat_hits = sum(1 for lo, hi in nat_spans if lo <= 17 <= hi)
    z_hits = sum(1 for lo, hi in z_spans if lo <= 17 <= hi)
    assert nat_hits == len(nat_spans)  # no skipping possible
    assert z_hits <= len(z_spans) // 2  # most files skipped
    # and the rearrangement is lossless
    got = spark.read.parquet(z_dir)
    assert got.count() == n
    assert got.agg(F.sum("payload")).collect()[0][0] == n * (n - 1) // 2


def test_hilbert_column_matches_reference_and_is_continuous(spark):
    """The unrolled column recurrence must reproduce the scalar
    reference for every cell of an 8×8 grid — and that mapping is a
    continuous bijection (consecutive keys are grid neighbors), the
    locality property Morton order lacks."""
    from etl_processing_scd1_spark.operators.layout import hilbert_index, hilbert_layout

    grid = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    )
    # run the layout with 1 file and re-derive d by position: the
    # written order IS the curve order
    out = hilbert_layout(grid, ["x", "y"], n_files=1, bits=3)
    rows = [(r.x, r.y) for r in out.collect()]
    expect = sorted(
        ((x, y) for x in range(8) for y in range(8)),
        key=lambda p: hilbert_index(p[0], p[1], bits=3),
    )
    assert rows == expect
    for (x1, y1), (x2, y2) in zip(rows, rows[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # continuity


def test_hilbert_files_cover_small_rectangles(spark, tmp_path):
    """Same pruning bar as Z-order: each of 16 Hilbert files spans a
    small fraction of the x domain on a uniform 256×256 grid."""
    from etl_processing_scd1_spark.operators.layout import hilbert_layout

    n, n_files = 1 << 14, 16
    base = spark.range(n).select(
        (F.col("id") % 256).alias("x"),
        ((F.col("id") * 2654435761) % 256).alias("y"),
        F.col("id").alias("payload"),
    )
    h_dir = str(tmp_path / "hil")
    hilbert_layout(base, ["x", "y"], n_files=n_files, bits=8).write.parquet(h_dir)
    spans = _file_spans(h_dir, "x")
    assert len(spans) == n_files
    avg = sum(hi - lo for lo, hi in spans) / len(spans)
    assert avg < 100  # natural order would be ~255
