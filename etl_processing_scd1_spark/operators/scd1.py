"""SCD Type 1 merge as a functional recompute (SURVEY.md §2.G).

The reference mutates PostgreSQL tables in place with three
statements per dimension — INSERT new keys (G1, main.py:139-161),
UPDATE null-safely-changed rows (G2, main.py:183-324), DELETE keys
absent from the day's snapshot (G3, main.py:329-343). On immutable
columnar storage the same transition is one deterministic recompute:

    new_dim = kept ∪ changed' ∪ new

where ``kept``    = dim rows whose key is in the snapshot and whose
                    business columns all null-safe-equal staging,
      ``changed'``= staged values for keys present in both sides with
                    any null-safe difference (overwrite semantics —
                    history destroyed, the defining SCD1 property),
      ``new``     = staged keys absent from the dim.

Scale design: one shuffle on the natural key serves all three legs —
the dim⋈stg full-outer join below computes insert/update/delete
classification in a single pass instead of the reference's three
separate scans. Duplicate staging keys (undefined in the reference —
Postgres UPDATE-from-join picks an arbitrary match) are resolved by
an explicit deterministic policy: highest ``coalesce(update_dt,
create_dt)``, then arbitrary-but-stable max over remaining columns.
At 100 TB: the dim and snapshot co-shuffle on the key; with bucketed
dim storage the exchange on the dim side disappears entirely.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import null_safe_differs

_MARKER = "__scd1_action__"


def _dedup_staging(stg: DataFrame, key: str, order_col: Column) -> DataFrame:
    """Deterministic duplicate-key policy for staging input.

    ``row_number`` over (key / order desc) keeps exactly one row per
    key — the freshest by effective-change timestamp, tie-broken by
    all remaining columns descending so the result is stable across
    runs and partitionings.
    """
    others = [F.col(c).desc_nulls_last() for c in stg.columns]
    w = Window.partitionBy(key).orderBy(order_col.desc_nulls_last(), *others)
    return (
        stg.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


@dataclass
class Scd1Result:
    """Merged dimension plus per-leg row classification.

    ``cached`` is the persisted classification frame all four legs
    share; callers MUST call :meth:`unpersist` once the legs are
    materialized (counts read, merged frame written) — otherwise each
    merge leaks one dim-sized cache for the session lifetime, which
    under a streaming foreachBatch sink accumulates per micro-batch.
    """

    merged: DataFrame
    inserted: DataFrame
    updated: DataFrame
    deleted: DataFrame
    cached: DataFrame | None = None

    def counts(self) -> dict[str, int]:
        return {
            "inserted": self.inserted.count(),
            "updated": self.updated.count(),
            "deleted": self.deleted.count(),
            "rows": self.merged.count(),
        }

    def unpersist(self) -> None:
        """Release the shared classification cache (idempotent)."""
        if self.cached is not None:
            self.cached.unpersist()
            self.cached = None


def scd1_changes(
    dim: DataFrame,
    stg: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key into insert/update/delete/keep in ONE
    full-outer join (one shuffle on ``key``).

    Returns dim-side and stg-side columns prefixed ``dim__``/``stg__``
    plus the classification marker column. ``compare_cols`` are
    diffed with null-safe equality (B4: the reference hand-expands
    the three-clause NULL expansion per column; ``eqNullSafe`` is the
    Spark-native collapse).
    """
    d = dim.select([F.col(c).alias(f"dim__{c}") for c in dim.columns])
    s = stg.select([F.col(c).alias(f"stg__{c}") for c in stg.columns])
    joined = d.join(s, d[f"dim__{key}"] == s[f"stg__{key}"], "full_outer")

    differs = null_safe_differs(
        [(F.col(f"dim__{c}"), F.col(f"stg__{c}")) for c in compare_cols]
    )
    action = (
        F.when(F.col(f"dim__{key}").isNull(), F.lit("insert"))
        .when(F.col(f"stg__{key}").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("keep"))
    )
    return joined.withColumn(_MARKER, action)


def scd1_merge(
    dim: DataFrame,
    stg: DataFrame,
    key: str,
    compare_cols: list[str],
    processed_dt: Column | None = None,
    delete_missing: bool = True,
) -> Scd1Result:
    """Full SCD1 transition dim ⊕ staging-snapshot → new dim.

    Audit-column semantics follow the reference exactly:
    - insert: ``create_dt := coalesce(stg.update_dt, stg.create_dt)``,
      ``update_dt := NULL`` (G1, main.py:146-161);
    - update: business cols overwritten, ``update_dt := stg.update_dt``,
      ``create_dt`` preserved from the dim (G2);
    - both stamp ``processed_dt`` — pass a literal captured once per
      run for deterministic replays (SURVEY §4.3), else
      ``current_timestamp()``.
    - delete: physical removal of keys absent from the snapshot (G3);
      ``delete_missing=False`` for increment-style staging where
      absence does not mean deletion.

    Idempotence (tested property): merging the same snapshot twice is
    a no-op on business columns.
    """
    if processed_dt is None:
        processed_dt = F.current_timestamp()

    has_tech = "create_dt" in stg.columns
    order_col = (
        F.coalesce(F.col("update_dt"), F.col("create_dt"))
        if has_tech
        else F.lit(None).cast("timestamp")
    )
    stg = _dedup_staging(stg, key, order_col)

    changes = scd1_changes(dim, stg, key, compare_cols)
    # One wide classification frame feeds all four legs; cache it so
    # the join executes once even though four outputs consume it.
    changes = changes.persist()

    business = [key] + compare_cols

    def stg_side(extra: list[Column]) -> list[Column]:
        return [F.col(f"stg__{c}").alias(c) for c in business] + extra

    inserted = changes.filter(F.col(_MARKER) == "insert").select(
        stg_side(
            [
                (
                    F.coalesce(F.col("stg__update_dt"), F.col("stg__create_dt"))
                    if has_tech
                    else F.lit(None).cast("timestamp")
                ).alias("create_dt"),
                F.lit(None).cast("timestamp").alias("update_dt"),
                processed_dt.alias("processed_dt"),
            ]
        )
    )
    updated = changes.filter(F.col(_MARKER) == "update").select(
        stg_side(
            [
                F.col("dim__create_dt").alias("create_dt"),
                (
                    F.col("stg__update_dt")
                    if has_tech
                    else F.lit(None).cast("timestamp")
                ).alias("update_dt"),
                processed_dt.alias("processed_dt"),
            ]
        )
    )
    kept = changes.filter(F.col(_MARKER) == "keep").select(
        [F.col(f"dim__{c}").alias(c) for c in dim.columns]
    )
    deleted = changes.filter(F.col(_MARKER) == "delete").select(
        [F.col(f"dim__{c}").alias(c) for c in dim.columns]
    )

    out_cols = dim.columns
    merged = kept.select(out_cols).unionByName(updated.select(out_cols)).unionByName(
        inserted.select(out_cols)
    )
    if not delete_missing:
        merged = merged.unionByName(deleted.select(out_cols))
    return Scd1Result(
        merged=merged,
        inserted=inserted,
        updated=updated,
        deleted=deleted,
        cached=changes,
    )
