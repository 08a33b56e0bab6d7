"""As-of (point-in-time) join — an operator Spark's DataFrame API
lacks natively (SURVEY.md §2.C notes the reference has no as-of
either; its lag-window velocity rule is the closest shape). Training
-data and event pipelines need it constantly: enrich every event
with the latest dimension/quote state at or before the event time.

Implementation is the union-and-window formulation, which Catalyst
executes as ONE shuffle + ONE sort over the combined stream:

    tag left rows (probe) and right rows (state) → union → window
    last_value(state cols) over (partition by key order by ts, side)
    → keep probe rows with the carried state.

Why not a range/theta join: ``l.ts >= r.ts`` joins explode to
|probe| × |state-per-key| pairs before taking the max — quadratic in
per-key history. The union-window form is linear in input size and
partitions by key, so it scales to arbitrarily long histories as
long as single keys fit a partition (salt keys if a single entity's
history is itself huge).

DuckDB's native ASOF JOIN is the oracle for the registry query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the latest right
    row with the same ``key`` and ``right_ts <= left_ts``
    (``< left_ts`` when ``strict``). Left rows with no prior right row
    keep NULLs (left-outer as-of semantics).

    State rows must be unique per (key, right_ts) — pre-dedup with an
    explicit policy upstream; ties between probe and state at the
    same instant follow ``strict``.
    """
    # Sort order encodes the tie rule: non-strict → state before probe
    # at equal ts (same-instant state visible); strict → probe first.
    probe_side, state_side = (1, 0) if not strict else (0, 1)
    lcols = left.columns
    # All value columns ride ONE struct per state row, carried with a
    # single last(ignorenulls). Carrying each column independently
    # would (a) treat a genuine NULL inside a state row as "no state"
    # and resurrect an older value, and (b) let different columns come
    # from DIFFERENT state rows — both diverging from ASOF JOIN
    # semantics (and from the DuckDB oracle) the moment state rows
    # contain NULLs. The struct is atomic: every output column comes
    # from the single latest state row, including its NULLs.
    state_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts__"),
        F.lit(probe_side).alias("__side__"),
        F.lit(None).cast(state_type).alias("__state__"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("__ts__"),
        F.lit(state_side).alias("__side__"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__state__"),
    ).select(*l.columns)  # align column order

    unioned = l.unionByName(r)
    w_carry = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts__"), F.col("__side__"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    carried = unioned.select(
        "*",
        F.last(F.col("__state__"), ignorenulls=True).over(w_carry).alias("__asof__"),
    )
    out = carried.filter(F.col("__side__") == probe_side).select(
        *lcols, *[F.col("__asof__").getField(c).alias(c) for c in value_cols]
    )
    return out
