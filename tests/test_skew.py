"""Salted two-phase aggregation: same answer, two exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.operators.skew import (
    salted_count,
    salted_sum,
)


def test_salted_count_matches_plain(spark):
    # one heavy-hitter key ('hot' = 90% of rows) + a long tail
    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {r["k"]: r["cnt"]
           for r in salted_count(df, ["k"], ["v"], salt_buckets=8).collect()}
    want = {r["k"]: r["cnt"]
            for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert got == want
    assert got["hot"] == 900


def test_salted_sum_matches_plain_and_two_phases(spark):
    rows = [("hot", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = salted_sum(df, ["k"], "v", ["v"], salt_buckets=8)
    assert out.collect()[0]["total"] == sum(range(1000))
    # both aggregation phases present: (k, salt) then (k)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial+final × 2 phases
