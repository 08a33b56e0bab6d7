from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


def persistent_rdd_ids(spark) -> set[int]:
    """Ids of currently persisted RDDs. Tests compare SETS of new ids,
    never counts: the async ContextCleaner GC-unpersists dead RDDs at
    arbitrary times, so a count delta races it while a new-id set
    difference cannot be perturbed by concurrent removals."""
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


@pytest.fixture(scope="session")
def spark():
    from etl_processing_scd1_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(autouse=True)
def no_cache_leaks(request):
    """Structural enforcement of the cache-release contract
    (operators.dedup.attach_cache/consuming): any test that leaves new
    persisted RDDs behind on the shared session fails HERE, instead of
    flaking an unrelated later test's hygiene assertion."""
    if "spark" not in request.fixturenames:
        yield
        return
    spark = request.getfixturevalue("spark")
    before = persistent_rdd_ids(spark)
    yield
    leaked = persistent_rdd_ids(spark) - before
    assert not leaked, (
        f"test left persisted RDDs {sorted(leaked)} on the shared session — "
        "materialize cache-attached results under dedup.consuming(...) or "
        "call dedup.release_cached after the consuming action"
    )
