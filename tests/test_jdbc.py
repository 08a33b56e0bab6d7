"""JDBC extract (SURVEY §2.A A4, reference main.py:76-85) executed for
real against an embedded Apache Derby database (bundled with Spark).

The reference pulls whole source tables through one psycopg2 cursor;
the engine's ``read_jdbc_table`` replaces that with Spark's JDBC source
— these tests prove the three capabilities the verdict flagged as
unexecuted code paths: full extract, partition-ranged parallel extract,
and watermark-pushdown incremental extract.

Derby notes: Spark's JDBC writer CREATEs columns as quoted lowercase
identifiers, so pushdown subqueries must quote them too (unquoted names
fold to uppercase in Derby).
"""

from __future__ import annotations

import pytest

from etl_processing_scd1_spark.sources.readers import read_jdbc_table

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """An embedded Derby DB seeded with a 1000-row source table."""
    home = tmp_path_factory.mktemp("derby")
    # keep derby.log inside the test tmpdir, not the repo root
    spark._jvm.System.setProperty("derby.system.home", str(home))
    url = f"jdbc:derby:{home}/db;create=true"
    src = spark.range(0, 1000).selectExpr(
        "id AS cust_id",
        "CAST(id % 7 AS INT) AS seg",
        "date_add(DATE'2021-01-01', CAST(id % 90 AS INT)) AS update_dt",
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "src_customer")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_full_table_extract(spark, derby):
    df = read_jdbc_table(spark, derby, "src_customer", driver=DERBY_DRIVER)
    assert df.count() == 1000
    assert set(df.columns) == {"cust_id", "seg", "update_dt"}


def test_partition_ranged_extract_parallel_and_complete(spark, derby):
    """partitionColumn/bounds split the extract into N concurrent range
    scans — the 100 TB shape (N executors each pull a key range). The
    union of ranges must be exactly the table: no dropped or doubled
    rows at range boundaries."""
    df = read_jdbc_table(
        spark,
        derby,
        "src_customer",
        partition_column="cust_id",
        num_partitions=8,
        lower_bound=0,
        upper_bound=1000,
        driver=DERBY_DRIVER,
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    assert df.selectExpr("sum(cust_id) AS s").first()["s"] == 999 * 1000 // 2


def test_watermark_pushdown_incremental_extract(spark, derby):
    """The incremental form the reference never wired up (it records
    watermarks but always full-extracts, SURVEY §4): push the
    ``update_dt > watermark`` predicate into the source DB via a
    dbtable subquery so only new rows cross the wire."""
    inc = read_jdbc_table(
        spark,
        derby,
        "(SELECT * FROM src_customer WHERE \"update_dt\" > DATE('2021-03-01')) t",
        driver=DERBY_DRIVER,
    )
    # days 2021-03-02..2021-03-31 = 30 of the 90 modulo days → 1/3 of rows
    assert inc.count() == 330
    got = {r["update_dt"].isoformat() for r in inc.select("update_dt").distinct().collect()}
    assert min(got) == "2021-03-02" and max(got) == "2021-03-31"
