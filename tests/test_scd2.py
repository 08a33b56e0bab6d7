"""SCD2 merge semantics: version chaining over successive snapshots,
soft deletes, idempotent replay, history immutability."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_processing_scd1_spark.operators.scd2 import END_OF_TIME, scd2_merge

T0, T1, T2 = "2021-01-01 00:00:00", "2021-02-01 00:00:00", "2021-03-01 00:00:00"


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k int, v string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )


def _stg(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _merge(spark, dim, stg, eff, **kw):
    res = scd2_merge(dim, stg, key="k", compare_cols=["v"], effective_ts=F.lit(eff).cast("timestamp"), **kw)
    merged = res.merged.collect()
    res.unpersist()
    return merged


def test_scd2_legs_one_snapshot(spark):
    import datetime as dt

    dim = _dim(spark, [(1, "a", dt.datetime(2021, 1, 1), dt.datetime(9999, 12, 31), True),
                       (2, "b", dt.datetime(2021, 1, 1), dt.datetime(9999, 12, 31), True)])
    stg = _stg(spark, [(1, "a2"), (3, "c")])  # 1 changed, 2 missing, 3 new
    rows = {(r["k"], r["is_current"]): r for r in _merge(spark, dim, stg, T1)}
    assert len(rows) == 4
    # changed key 1: closed old + open new
    assert rows[(1, False)]["v"] == "a" and str(rows[(1, False)]["valid_to"]).startswith("2021-02-01")
    assert rows[(1, True)]["v"] == "a2" and str(rows[(1, True)]["valid_from"]).startswith("2021-02-01")
    # missing key 2: soft-closed, no new version
    assert rows[(2, False)]["v"] == "b"
    assert (2, True) not in rows
    # new key 3: open-ended current version
    assert rows[(3, True)]["v"] == "c" and str(rows[(3, True)]["valid_to"]).startswith("9999-12-31")


def test_scd2_two_snapshots_chain_history(spark):
    import datetime as dt

    dim = _dim(spark, [(1, "a", dt.datetime(2021, 1, 1), dt.datetime(9999, 12, 31), True)])
    r1 = _merge(spark, dim, _stg(spark, [(1, "b")]), T1)
    dim2 = spark.createDataFrame(r1, dim.schema)
    r2 = {(str(r["valid_from"])[:10], r["is_current"]): r["v"]
          for r in _merge(spark, dim2, _stg(spark, [(1, "c")]), T2)}
    # three chained versions: a [Jan,Feb), b [Feb,Mar), c [Mar,∞)
    assert r2 == {("2021-01-01", False): "a",
                  ("2021-02-01", False): "b",
                  ("2021-03-01", True): "c"}


def test_scd2_replay_is_idempotent(spark):
    import datetime as dt

    dim = _dim(spark, [(1, "a", dt.datetime(2021, 1, 1), dt.datetime(9999, 12, 31), True)])
    stg = _stg(spark, [(1, "b")])
    r1 = _merge(spark, dim, stg, T1)
    dim2 = spark.createDataFrame(r1, dim.schema)
    r2 = _merge(spark, dim2, stg, T1)  # same snapshot, same effective ts
    assert sorted(map(str, r1)) == sorted(map(str, r2))


def test_scd2_delete_missing_false_keeps_open(spark):
    import datetime as dt

    dim = _dim(spark, [(1, "a", dt.datetime(2021, 1, 1), dt.datetime(9999, 12, 31), True)])
    rows = _merge(spark, dim, _stg(spark, [(2, "b")]), T1, delete_missing=False)
    by_key = {(r["k"], r["is_current"]): r for r in rows}
    assert by_key[(1, True)]["v"] == "a"  # absence is not deletion
    assert str(by_key[(1, True)]["valid_to"]).startswith("9999-12-31")
    assert by_key[(2, True)]["v"] == "b"


def test_scd2_no_cached_rdd_leak(spark):
    import datetime as dt

    def n_persistent(s):
        return s.sparkContext._jsc.sc().getPersistentRDDs().size()

    dim = _dim(spark, [(1, "a", dt.datetime(2021, 1, 1), dt.datetime(9999, 12, 31), True)])
    before = n_persistent(spark)
    res = scd2_merge(dim, _stg(spark, [(1, "b")]), key="k", compare_cols=["v"],
                     effective_ts=F.lit(T1).cast("timestamp"))
    res.merged.count()
    res.unpersist()
    res.unpersist()  # idempotent
    assert n_persistent(spark) == before
