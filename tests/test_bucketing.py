"""Bucketed co-located joins: the shuffle must disappear."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.catalog import load
from rsyslog_nginx_clickhouse_spark.plans.bucketing import (
    bucketed_join,
    write_bucketed,
)


def test_scaled_bucket_count_formula():
    """buckets = max(16, next-pow2(n/target)) (VERDICT r7 item 6):
    floors at the legacy 16 through every bench SF, then doubles with
    the data so per-bucket size stays in [target/2, target]."""
    from rsyslog_nginx_clickhouse_spark.plans.bucketing import (
        ROWS_PER_BUCKET as T,
        scaled_bucket_count,
    )

    assert scaled_bucket_count(1) == 16
    assert scaled_bucket_count(600_000) == 16      # lineitem sf0.1
    assert scaled_bucket_count(16 * T) == 16       # exact boundary
    assert scaled_bucket_count(16 * T + 1) == 32
    assert scaled_bucket_count(6_000_000) == 128   # sf1 probe scale
    assert scaled_bucket_count(100 * T) == 128
    # powers of two only — the bucket-coalescing requirement
    for n in (1, 10**5, 10**6, 10**7, 10**8):
        b = scaled_bucket_count(n)
        assert b & (b - 1) == 0 and b >= 16
        # per-bucket load bounded by the target once above the floor
        if b > 16:
            assert n / b <= T


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


def test_ensure_bucketed_reregister_keeps_bucket_plan(spark, sf_dir, tmp_path):
    """The cross-process path of ensure_bucketed (VERDICT r6 item 3):
    fresh files on disk + empty catalog → the table is RE-REGISTERED
    over the existing bucket files (no rewrite), and the join still
    plans with no Exchange; a stale fingerprint forces a rewrite."""
    import os

    from rsyslog_nginx_clickhouse_spark.plans.bucketing import (
        _table_location,
        bucketed_fresh,
        ensure_bucketed,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    orders = load(spark, sf_dir, "orders").select("o_orderkey",
                                                  "o_totalprice")
    try:
        ensure_bucketed(spark, orders, "eb_orders", "o_orderkey", src,
                        buckets=8)
        assert bucketed_fresh(spark, "eb_orders", src, "o_orderkey", 8)
        # different params → stale (a silent reuse would join wrong)
        assert not bucketed_fresh(spark, "eb_orders", src, "o_orderkey", 16)
        loc = _table_location(spark, "eb_orders")
        mtime_before = max(os.path.getmtime(os.path.join(loc, f))
                           for f in os.listdir(loc))
        # simulate a NEW process: catalog forgets, files remain
        spark.sql("DROP TABLE eb_orders")
        ensure_bucketed(spark, orders, "eb_orders", "o_orderkey", src,
                        buckets=8)
        mtime_after = max(os.path.getmtime(os.path.join(loc, f))
                          for f in os.listdir(loc))
        assert mtime_after == mtime_before  # re-registered, NOT rewritten
        li = load(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
        ensure_bucketed(spark, li, "eb_lineitem", "o_orderkey",
                        os.path.join(sf_dir, "lineitem.parquet"), buckets=8)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "eb_orders", "eb_lineitem",
                                   "o_orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert joined.count() == orders.join(li, "o_orderkey").count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        for t in ("eb_orders", "eb_lineitem"):
            from rsyslog_nginx_clickhouse_spark.plans.bucketing import (
                _table_location as _loc,
            )
            import shutil

            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(_loc(spark, t), ignore_errors=True)
