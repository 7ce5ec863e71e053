"""Bucketed-table co-located join: the shuffle-elimination path for
repeated large⋈large joins (SURVEY.md scale posture).

Writing both sides bucketed by the join key lets Spark plan the join with
ZERO exchanges — at 100 TB this converts every repeated fact⋈fact join
from a full-network shuffle into a local merge per bucket.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    for name, df in (("t_bleft", left), ("t_bright", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "t_bleft", "t_bright"
    for name in ("t_bleft", "t_bright"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    lname, rname = bucketed_pair
    # disable auto-broadcast so the large⋈large path (the one bucketing
    # exists for) is what gets planned
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(lname).join(spark.table(rname), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    lname, _ = bucketed_pair
    agg = spark.table(lname).groupBy("k").agg(F.sum("a").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
