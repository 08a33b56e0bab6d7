"""Fact-table append with anti-join dedup (SURVEY.md §2.G G4).

Reference: ``INSERT INTO fact SELECT ... FROM stg LEFT JOIN fact ON
stg.id = fact.id WHERE fact.dt IS NULL`` (main.py:376-391) — the
idempotence mechanism that absorbs re-delivered files and the
accumulating blacklist (verified trajectory 7 → 15 → 24 rows).

Scale design: the naive anti join rescans the WHOLE fact per batch —
fine at 47k rows, catastrophic at 100 TB. The operator therefore
prunes the fact side before joining:

- ``fact_filter``: when ids are time-correlated (trans_id batches
  arrive per day), restrict the anti-join's right side to the fact
  partitions that could contain the incoming ids (partition pruning
  on the date-partition column).
- the incoming batch is typically ≪ fact, so the *staged* side
  broadcasts; the fact side streams through without a shuffle.
  (Spark chooses broadcast-anti automatically under the threshold;
  the explicit hint covers the statistics-less staging frame.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def append_dedup(
    fact: DataFrame,
    stg: DataFrame,
    id_col: str,
    fact_filter: Column | None = None,
    broadcast_new: bool = True,
) -> DataFrame:
    """Rows of ``stg`` whose ``id_col`` is not yet in ``fact``,
    deduplicated within the batch; union with ``fact`` for the new
    table state.

    Returns only the NEW rows (caller appends / unions), matching the
    reference's INSERT-SELECT shape and keeping the write incremental.
    """
    existing = fact.filter(fact_filter) if fact_filter is not None else fact
    existing_ids = existing.select(id_col)
    batch = stg.dropDuplicates([id_col])
    if broadcast_new:
        # Anti join with the (small) id set broadcast: no shuffle of
        # the batch; at scale flip to broadcasting the batch instead.
        existing_ids = F.broadcast(existing_ids)
    return batch.join(existing_ids, on=id_col, how="left_anti")


def accumulate(fact: DataFrame, stg: DataFrame, id_col: str, **kw) -> DataFrame:
    """fact ∪ new-rows — the full post-append table state."""
    return fact.unionByName(append_dedup(fact, stg, id_col, **kw))
