"""Bucketed co-located joins: the shuffle must disappear."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.catalog import load
from rsyslog_nginx_clickhouse_spark.plans.bucketing import (
    bucketed_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(li, "b_lineitem", "o_orderkey", buckets=8)
    # at test scale the planner would (correctly) broadcast instead;
    # disable that to exercise the both-sides-huge path bucketing is for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        # co-partitioned + co-sorted: no shuffle, no sort before the join
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        # and the result is the same as the shuffled join
        expected = orders.join(li, "o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
