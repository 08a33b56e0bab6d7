"""Property-based SCD2 tests: a sequence of randomized snapshots is
applied through scd2_merge and checked against a plain-Python
reference model of version chaining, plus structural invariants that
must hold for ANY history — at most one current version per key,
closed versions never mutate, intervals ordered and non-overlapping,
and the current version always equals the latest snapshot."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etl_processing_scd1_spark.operators.scd2 import scd2_merge

KEYS = st.sampled_from(["K1", "K2", "K3", "K4"])
VALS = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
SNAPSHOT = st.dictionaries(KEYS, VALS, max_size=4)

T = [dt.datetime(2021, m, 1) for m in (1, 2, 3, 4)]
FAR = dt.datetime(9999, 12, 31)

_spark = None


def _dim_df(rows):
    return _spark.createDataFrame(
        rows, "k string, v string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )


def _apply(dim_rows, snap: dict, eff: dt.datetime):
    stg = _spark.createDataFrame(
        sorted(snap.items()), "k string, v string"
    ) if snap else _spark.createDataFrame([], "k string, v string")
    res = scd2_merge(
        _dim_df(dim_rows), stg, key="k", compare_cols=["v"],
        effective_ts=F.lit(eff.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"),
    )
    rows = [
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in res.merged.collect()
    ]
    res.unpersist()
    return rows


def _model(snapshots):
    """Reference semantics: per key, chain a version for every change
    between consecutive snapshots (including appearing/disappearing)."""
    versions = {}  # k -> list of [v, from_i, to_i or None(open)]
    for i, snap in enumerate(snapshots):
        live = {k: vs[-1] for k, vs in versions.items() if vs and vs[-1][2] is None}
        for k, v in snap.items():
            if k in live:
                if live[k][0] != v:  # changed -> close + open
                    live[k][2] = i
                    versions[k].append([v, i, None])
            else:
                versions.setdefault(k, []).append([v, i, None])
        for k, cur in live.items():
            if k not in snap and cur[2] is None:  # missing -> soft close
                cur[2] = i
    return versions


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snaps=st.lists(SNAPSHOT, min_size=2, max_size=3))
def test_scd2_chain_matches_model(spark, snaps):
    global _spark
    _spark = spark

    # bootstrap from empty dim; snapshot i becomes effective at T[i]
    rows = []
    for i, snap in enumerate(snaps):
        rows = _apply(rows, snap, T[i])

    model = _model([{}] + snaps)  # model counts from an empty epoch

    by_key: dict = {}
    for k, v, vf, vt, cur in rows:
        by_key.setdefault(k, []).append((vf, vt, v, cur))
    for k in by_key:
        by_key[k].sort()

    # model equivalence: same version values in the same order
    model_versions = {
        k: [v for v, _f, _t in vs] for k, vs in model.items() if vs
    }
    got_versions = {k: [v for _f, _t, v, _c in vs] for k, vs in by_key.items()}
    assert got_versions == model_versions

    for k, vs in by_key.items():
        # at most one current version; it must be the last one
        currents = [x for x in vs if x[3]]
        assert len(currents) <= 1
        if currents:
            assert vs[-1][3] and currents[0] == vs[-1]
            assert currents[0][1] == FAR
        # intervals ordered, non-overlapping, closed rows end where
        # the next begins (contiguous chain while the key is live)
        for (f1, t1, _v1, c1), (f2, _t2, _v2, _c2) in zip(vs, vs[1:]):
            assert not c1
            assert t1 <= f2
        # the open version (if any) mirrors the last snapshot value
        last_live = model[k][-1]
        if last_live[2] is None:
            assert vs[-1][3] and vs[-1][2] == last_live[0]
        else:
            assert not vs[-1][3]
