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
