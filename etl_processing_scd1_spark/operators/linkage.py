"""Probabilistic record linkage (Fellegi & Sunter 1969): score
blocked candidate pairs by per-field agreement weights and classify
into match / possible / non-match.

Reference parity: the reference engine has no linkage operator — this
is part of the beyond-reference §2.K curation tier (entity resolution
is the record-level sibling of document dedup: same block → compare →
decide shape as `operators/dedup.py`, over typed fields instead of
shingles).

Scale design: the FS decision model is O(1) per pair — ALL the scale
risk lives in pair generation, so blocking must come from a bounded
generator (the band join's value-bucket equi-join, an LSH family, a
sorted-neighborhood window), never a low-cardinality attribute alone:
blocks on a constant-cardinality key grow linearly with data and
their pair counts quadratically. Scoring itself is a narrow
projection: agreement bits are plain column expressions and the
log-likelihood weights are PYTHON-side integer literals (milli-bits),
so the score is an exact integer sum — a 1000-executor run classifies
every pair bit-identically to a single-threaded oracle, and there is
no engine-side float log anywhere.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FsField:
    """One comparison field: a boolean agreement expression over the
    candidate-pair frame plus the Fellegi–Sunter conditional
    probabilities m = P(agree | match) and u = P(agree | non-match).
    Weights derive as log2(m/u) on agreement and log2((1-m)/(1-u))
    on disagreement."""

    name: str
    agree: Column
    m: float
    u: float

    def weights_milli(self) -> tuple[int, int]:
        """(agree, disagree) weights in integer MILLI-bits — computed
        driver-side with Python floats and embedded as literals, so
        executor arithmetic is pure integer addition."""
        return fs_weights_milli(self.m, self.u, name=self.name)


def fs_weights_milli(m: float, u: float, name: str = "?") -> tuple[int, int]:
    """The (agree, disagree) FS log-likelihood weights for one field
    in integer milli-bits: round(log2(m/u)*1000) and
    round(log2((1-m)/(1-u))*1000). Exposed standalone so an oracle can
    embed the SAME integer literals the Spark plan uses."""
    if not (0.0 < u < m < 1.0):
        raise ValueError(f"field {name!r}: need 0 < u < m < 1, got m={m} u={u}")
    agree = round(math.log2(m / u) * 1000)
    disagree = round(math.log2((1.0 - m) / (1.0 - u)) * 1000)
    return agree, disagree


def fs_score_pairs(
    pairs: DataFrame,
    fields: list[FsField],
    match_threshold_milli: int,
    possible_threshold_milli: int,
) -> DataFrame:
    """Score every candidate pair: one ``agr_<field>`` bit per field,
    the total ``score_milli`` (sum of per-field agree/disagree
    weights), and ``link_class`` — 'match' at or above the match
    threshold, 'non_match' below the possible threshold, 'possible'
    between (the FS clerical-review band). Pure projection: no
    shuffle, no UDF — appends columns to whatever blocking produced
    ``pairs``."""
    if possible_threshold_milli > match_threshold_milli:
        raise ValueError("possible threshold must not exceed match threshold")
    out = pairs
    score = F.lit(0).cast("long")
    for f in fields:
        agree_w, disagree_w = f.weights_milli()
        bit = f.agree.cast("long")
        out = out.withColumn(f"agr_{f.name}", bit)
        score = score + F.when(
            F.col(f"agr_{f.name}") == 1, F.lit(agree_w)
        ).otherwise(F.lit(disagree_w)).cast("long")
    out = out.withColumn("score_milli", score)
    return out.withColumn(
        "link_class",
        F.when(F.col("score_milli") >= match_threshold_milli, F.lit("match"))
        .when(F.col("score_milli") < possible_threshold_milli, F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )


def incremental_band_candidates(
    batch: DataFrame,
    reference: DataFrame,
    id_col: str,
    val_col: str,
    tolerance: int,
    extra_key: str | None = None,
    suffix: str = "_b",
) -> DataFrame:
    """Candidate pairs for INCREMENTAL linkage: every (batch row,
    reference row) band-join pair plus every intra-batch pair exactly
    once — the blocking contract ``streaming_fs_linkage_sink`` needs
    so that streamed admission emits the same pair set as a one-shot
    batch run over the union (parity-tested). Right-side columns are
    renamed with ``suffix``; ids are canonicalized to
    (least, greatest) AFTER pairing, which is sound because FS
    comparison fields are symmetric (equality, absolute difference,
    edit distance) — batch and reference ids interleave arbitrarily
    in arrival order, so no orientation can be assumed.

    Scale: both legs are the bucketed band join — per-batch cost is
    O(batch × bucket occupancy), never O(reference²); the reference
    side rescans but never reshuffles (its 3-bucket replication is a
    narrow map), matching the near-dedup admission sink's contract
    that per-trigger work is output-bound, not corpus-bound."""
    from .rangejoin import band_join

    def renamed(df: DataFrame) -> DataFrame:
        return df.select([F.col(c).alias(f"{c}{suffix}") for c in df.columns])

    ek = (extra_key, f"{extra_key}{suffix}") if extra_key else None
    vs_ref = band_join(
        batch, renamed(reference), val_col, f"{val_col}{suffix}",
        tolerance=tolerance, extra_key=ek,
    )
    intra = band_join(
        batch, renamed(batch), val_col, f"{val_col}{suffix}",
        tolerance=tolerance, extra_key=ek,
    ).filter(F.col(id_col) < F.col(f"{id_col}{suffix}"))
    both = vs_ref.unionByName(intra)
    ida, idb = F.col(id_col), F.col(f"{id_col}{suffix}")
    return both.withColumn("__id_a__", F.least(ida, idb)).withColumn(
        "__id_b__", F.greatest(ida, idb)
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number under a TOTAL order — without
    the naive ``row_number() OVER (ORDER BY ...)`` whose empty
    partitionBy funnels the whole relation through ONE task (the
    single-partition plan the audit hard-gates). Three-phase, all
    bounded:

    1. range-partition on ``order_cols`` and sort within partitions —
       the scalable global sort (``Exchange rangepartitioning``);
    2. per-partition local row_number (window keyed by
       ``spark_partition_id()`` — each partition is one group, so the
       window processes range-partition-sized chunks in parallel);
    3. per-partition row counts collected to the driver — BOUNDED at
       ``num_partitions`` rows, the documented exception to the
       no-driver-collect rule — turned into cumulative offsets and
       re-embedded as a literal map; global rn = offset[pid] + local.

    The result is EXACTLY the global rank regardless of where range
    sampling placed the partition boundaries (offsets absorb the
    split), so the output is deterministic for any total order —
    callers must include a unique tiebreaker in ``order_cols``.

    The ranged relation is PERSISTED before its two consumers, and
    that persist is CORRECTNESS, not caching: range boundaries come
    from a sampling pass whose seed folds in the fresh-per-action RDD
    id, so the counts job and the rank job would otherwise see
    DIFFERENT partition boundaries and the offsets would misalign
    with the local ranks (observed at sf0.1: 285 duplicate ranks from
    exactly this). The cache pins one materialized partitioning that
    both jobs read. Released via the ``attach_cache`` contract —
    consumers materialize under ``dedup.consuming(...)``.
    """
    from itertools import accumulate

    from .dedup import attach_cache

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid__", F.spark_partition_id())
        .persist()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__pid__").orderBy(*order_cols)
    local = ranged.withColumn("__lrn__", F.row_number().over(w))
    counts = sorted(
        (r["__pid__"], r["cnt"])
        for r in ranged.groupBy("__pid__").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets = dict(
        zip([p for p, _ in counts], accumulate([0] + [c for _, c in counts[:-1]]))
    )
    omap = F.create_map(
        *[F.lit(x) for pc in offsets.items() for x in pc]
    ) if offsets else F.create_map()
    out = (
        local.withColumn(
            out_col, (omap[F.col("__pid__")] + F.col("__lrn__")).cast("long")
        )
        .drop("__pid__", "__lrn__")
    )
    return attach_cache(out, ranged)


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    order_cols: list[str],
    window: int,
    suffix: str = "_b",
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995), the
    classic complement to value-band blocking: sort the corpus by a
    composite key and emit every pair whose GLOBAL sort ranks differ
    by less than ``window`` — robust where band blocking fails
    (sparse regions get far-apart values paired; dense regions stay
    bounded at window-1 partners per record regardless of value
    density, so the output is O(n·window) by construction, never
    Ω(pairs-in-band)). Rank distance rides along as ``rank_dist``.

    Built on :func:`global_row_number` (scale-correct global sort)
    plus the band join ON THE RANK column (tolerance window-1):
    neighbors in rank space land in the same or adjacent rank bucket,
    so the pair join stays an equi-join. Deterministic for any total
    ``order_cols`` (include a unique tiebreaker)."""
    from .rangejoin import band_join

    if window < 2:
        raise ValueError("window must be >= 2 (window-1 rank neighbors)")
    from .dedup import attach_cache

    ranked = global_row_number(df, order_cols, out_col="__grn__")
    right = ranked.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in ranked.columns]
    )
    out = (
        band_join(ranked, right, "__grn__", f"__grn__{suffix}", tolerance=window - 1)
        .filter(F.col("__grn__") < F.col(f"__grn__{suffix}"))
        .withColumn(
            "rank_dist",
            (F.col(f"__grn__{suffix}") - F.col("__grn__")).cast("long"),
        )
        .drop("__grn__", f"__grn__{suffix}")
    )
    # ride global_row_number's correctness persist to THIS result
    return attach_cache(out, *getattr(ranked, "_spark_graft_cached", ()))
