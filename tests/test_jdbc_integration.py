"""End-to-end JDBC integration over embedded Apache Derby.

No external DB ships in this container, but Spark's distribution bundles
Derby (its metastore dependency) — a real JDBC driver on the session
classpath. These tests exercise the actual ``spark.read.format("jdbc")``
path (reference S3–S8 extract semantics): Spark JDBC write → JdbcSource
partitioned read-back, proving option plumbing, driver resolution, and
the parallel-scan spec against a live database rather than option dicts.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from extract_transform_load_template_multidb_spark.sources.jdbc import JdbcSource

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{os.path.join(str(tmp_path), name)};create=true"


@pytest.fixture(scope="module")
def seeded(spark, tmp_path_factory):
    """A Derby database seeded through Spark's own JDBC writer."""
    url = _derby_url(tmp_path_factory.mktemp("derby"), "etl_db")
    rows = [
        Row(id=i, amount=float(i) * 1.5, category=f"c{i % 3}")
        for i in range(100)
    ]
    (
        spark.createDataFrame(rows)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "sales")
        # Derby's default StringType mapping is CLOB, which rejects pushed
        # equality predicates — pin a comparable VARCHAR.
        .option(
            "createTableColumnTypes",
            "id BIGINT, amount DOUBLE, category VARCHAR(10)",
        )
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_source_reads_live_table(spark, seeded):
    src = JdbcSource(url=seeded, table="sales", driver=DERBY_DRIVER)
    df = src.read(spark)
    assert df.count() == 100
    assert set(df.columns) == {"id", "amount", "category"}
    total = df.agg(F.sum("id").alias("s")).collect()[0]["s"]
    assert total == sum(range(100))


def test_jdbc_source_partitioned_parallel_read(spark, seeded):
    """The S3–S8 scale path: range-partitioned scan issues N concurrent
    bounded queries instead of one full-table pull."""
    src = JdbcSource(
        url=seeded,
        table="sales",
        driver=DERBY_DRIVER,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    df = src.read(spark)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100


def test_jdbc_pushdown_reaches_database(spark, seeded):
    """A filter on the frame must be pushed into the remote query
    (reference S2/S4-style windowed extract, server-side)."""
    src = JdbcSource(url=seeded, table="sales", driver=DERBY_DRIVER)
    df = src.read(spark).filter(F.col("category") == "c1").select("id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "category" in plan
    assert df.count() == 33


def test_jdbc_subquery_table(spark, seeded):
    """dbtable as a parenthesised subquery — the reference's custom-SQL
    extract shape (SQLServer-to-MySQL-Method-1.py:58). Identifiers are
    quoted because Spark's JDBC writer creates case-sensitive lowercase
    columns while Derby folds unquoted names to uppercase; the alias is
    mandatory for Derby's derived-table grammar."""
    src = JdbcSource(
        url=seeded,
        table='(SELECT "id", "amount" FROM sales WHERE "id" < 10) t',
        driver=DERBY_DRIVER,
    )
    assert src.read(spark).count() == 10
