"""Co-located bucketed joins: the write-once shuffle buys exchange-free
equi-joins on the bucket key forever after."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.plans.bucketing import co_located_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = spark.range(5000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 97).alias("o_custkey"),
        (F.col("id") * 3 % 1000).cast("double").alias("o_totalprice"),
    )
    lineitem = spark.range(20000).select(
        (F.col("id") % 5000).alias("o_orderkey"),
        (F.col("id") % 7 + 1).alias("l_quantity"),
    )
    write_bucketed(orders, "bkt_orders", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "bkt_lineitem", "o_orderkey", n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """Both sides bucketed on the join key with equal bucket counts:
    the sort-merge join runs with ZERO exchanges (and zero per-task
    sorts, because the buckets are written sorted)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, "bkt_lineitem", "bkt_orders", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # correctness: same result as the plain (shuffled) join
        n = j.count()
        assert n == 20000  # every lineitem row matches exactly one order
        # and an aggregation on the bucket key is exchange-free too
        agg = spark.table("bkt_lineitem").groupBy("o_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_baseline_does_shuffle(spark, bucketed):
    """Sanity: the same join over unbucketed data DOES exchange — the
    bucketed plan's advantage is real, not a planner default."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("bkt_lineitem").repartition(5)
        b = spark.table("bkt_orders").repartition(5)
        plan = a.join(b, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
