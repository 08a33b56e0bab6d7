"""Property-based skyline tests: the O(n log n) level-prefix-max
skyline must equal the quadratic dominance spec on arbitrary inputs —
including the edge cases the sf0.001 data can't force (duplicate
points, whole-group ties on one dimension, single-row groups)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_processing_scd1_spark.operators.mining import pareto_skyline_2d

POINT = st.tuples(
    st.sampled_from(["g1", "g2"]),
    st.integers(min_value=0, max_value=5),   # min-dimension (price-like)
    st.integers(min_value=0, max_value=5),   # max-dimension (size-like)
)
POINTS = st.lists(POINT, min_size=1, max_size=18)

_spark = None


def _model_skyline(rows: list[tuple[str, int, int]]) -> set[tuple]:
    """Quadratic spec: id survives iff no same-group row strictly
    dominates it. Dominance between duplicate points is vacuous, so
    duplicates survive (or fall) together."""
    out = set()
    for i, (g, x, y) in enumerate(rows):
        dominated = any(
            g2 == g and x2 <= x and y2 >= y and (x2 < x or y2 > y)
            for g2, x2, y2 in rows
        )
        if not dominated:
            out.add((i, g, x, y))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(POINTS)
def test_skyline_matches_quadratic_spec(spark, rows):
    global _spark
    _spark = spark
    df = _spark.createDataFrame(
        [(i, g, x, y) for i, (g, x, y) in enumerate(rows)],
        "id long, g string, x long, y long",
    )
    got = {
        (r["id"], r["g"], r["x"], r["y"])
        for r in pareto_skyline_2d(df, "g", "x", "y").collect()
    }
    assert got == _model_skyline(rows)


MEMBERSHIP = st.tuples(
    st.integers(min_value=0, max_value=4),     # basket id
    st.sampled_from(["a", "b", "c", "d"]),     # item
)
FEED = st.lists(MEMBERSHIP, min_size=1, max_size=16, unique=True)
SPLIT = st.lists(st.integers(min_value=0, max_value=2), min_size=16, max_size=16)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(FEED, SPLIT)
def test_cooccurrence_deltas_sum_to_batch(spark, rows, split):
    """The sink's exactness claim, over arbitrary 3-way batch splits
    of arbitrary membership sets: summed incremental deltas == batch
    pair counts, for every way a basket can straddle batches."""
    from etl_processing_scd1_spark.operators.mining import (
        cooccurrence_pairs,
        incremental_cooccurrence_counts,
    )

    global _spark
    _spark = spark
    schema = "o long, br string"
    batches = [[], [], []]
    for i, r in enumerate(rows):
        batches[split[i % len(split)] % 3].append(r)

    def df(data):
        return _spark.createDataFrame(data, schema) if data else _spark.createDataFrame([], schema)

    totals: dict = {}
    seen_rows: list = []
    for b in batches:
        new = [r for r in b if r not in seen_rows]
        if not new:
            continue
        delta = incremental_cooccurrence_counts(df(new), df(seen_rows), "o", "br")
        for r in delta.collect():
            k = (r["item_a"], r["item_b"])
            totals[k] = totals.get(k, 0) + r["support"]
        seen_rows.extend(new)
    batch_counts = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in cooccurrence_pairs(df(seen_rows), "o", "br").collect()
    }
    assert totals == batch_counts
