"""Interval (range) join — point-in-interval matching, an operator
Spark has no native strategy for (a bare ``BETWEEN`` predicate plans
as BroadcastNestedLoop / cartesian).

The scalable formulation buckets both sides by a fixed time grain:
each interval is exploded to the buckets it overlaps, points join on
their bucket equi-key, and the exact BETWEEN predicate filters
within the bucket. The cross product is bounded per bucket instead
of global — the standard time-binning trick (cf. interval joins in
stream processors).

Grain choice trades replication for bucket size: intervals spanning
B buckets are replicated B times; points never replicate. Pick the
grain near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    grain_seconds: int = 86400,
    extra_key: tuple[str, str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_ts <= point_ts < end_ts`` (optionally also matching
    ``extra_key``), via grain-bucket equi-join + exact filter.
    """

    def bucket_of(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / grain_seconds).cast("long")

    p = points.withColumn("__bucket__", bucket_of(F.col(point_ts)))
    i = intervals.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                bucket_of(F.col(start_ts)),
                # end-exclusive: a boundary-landing end stays in its bucket
                bucket_of(F.col(end_ts) - F.expr("INTERVAL 1 SECOND")),
            )
        ),
    )
    on = [p["__bucket__"] == i["__bucket__"]]
    if extra_key:
        on.append(p[extra_key[0]] == i[extra_key[1]])
    joined = p.join(i, on[0] if len(on) == 1 else on[0] & on[1], how)
    exact = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    return joined.filter(exact).drop("__bucket__")


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    tolerance: int,
    extra_key: tuple[str, str] | None = None,
) -> DataFrame:
    """Tolerance (band) join: every (left, right) pair with
    ``|left_val - right_val| <= tolerance``, where both value columns
    are INTEGER-scaled longs (callers quantize doubles to cents first
    — the predicate then evaluates in exact integer arithmetic, so a
    distributed run hash-matches a single-threaded oracle; a raw
    double band is one ulp away from nondeterministic edge rows).

    Same strategy as :func:`interval_join`: a bare ``abs(a-b) <= t``
    predicate plans as a nested loop, so bucket both sides on
    ``value DIV tolerance`` — any within-band partner lands in the
    same or an adjacent bucket, so the RIGHT side registers in its
    three neighbor buckets (3× replication, points-vs-points — there
    is no interval side to blow up) and the exact band predicate
    filters inside the bucket equi-join. Comparisons are bounded per
    bucket instead of global; note the OUTPUT itself is inherently
    Ω(pairs) — with a fixed band and growing value density the match
    count grows superlinearly, which is a property of the query, not
    the plan (same as any similarity self-join; cap the band or
    pre-aggregate when that bites).
    """
    lb = F.floor(F.col(left_val) / tolerance).cast("long")
    l = left.withColumn("__bucket__", lb)
    r = right.withColumn(
        "__bucket__",
        F.explode(
            F.array(
                F.floor(F.col(right_val) / tolerance).cast("long") - 1,
                F.floor(F.col(right_val) / tolerance).cast("long"),
                F.floor(F.col(right_val) / tolerance).cast("long") + 1,
            )
        ),
    )
    on = l["__bucket__"] == r["__bucket__"]
    if extra_key:
        on = on & (l[extra_key[0]] == r[extra_key[1]])
    return (
        l.join(r, on)
        .filter(F.abs(F.col(left_val) - F.col(right_val)) <= tolerance)
        .drop("__bucket__")
    )
