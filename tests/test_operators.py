"""Relational operator semantics: as-of join, sessionize, top-k, buckets."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.operators.asof import asof_join
from rsyslog_nginx_clickhouse_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from rsyslog_nginx_clickhouse_spark.operators.timeseries import (
    time_bucket,
    timeseries_count,
)
from rsyslog_nginx_clickhouse_spark.operators.topk import topk, topk_per_group


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_backward_with_exact_match(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 12:00:00")),
         (2, _ts("2024-01-01 09:00:00"))],
        "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "a"),   # exact match allowed
         (1, _ts("2024-01-01 11:30:00"), "b"),
         (1, _ts("2024-01-01 13:00:00"), "c"),   # after both lefts → never
         (2, _ts("2024-01-01 09:30:00"), "d")],  # after left → no match
        "k int, ts timestamp, val string")
    got = {(r["k"], r["ts"]): r["val_asof"]
           for r in asof_join(left, right, on="k", time_col="ts").collect()}
    assert got[(1, _ts("2024-01-01 10:00:00"))] == "a"
    assert got[(1, _ts("2024-01-01 12:00:00"))] == "b"
    assert got[(2, _ts("2024-01-01 09:00:00"))] is None


def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:00")), ("u", _ts("2024-01-01 10:10:00")),
         ("u", _ts("2024-01-01 11:30:00")),  # 80 min gap → new session
         ("v", _ts("2024-01-01 10:00:00"))],
        "user string, ts timestamp")
    s = sessionize(df, "user", "ts", gap_s=1800)
    got = {(r["user"], r["ts"]): r["session_id"] for r in s.collect()}
    assert got[("u", _ts("2024-01-01 10:00:00"))] == 0
    assert got[("u", _ts("2024-01-01 10:10:00"))] == 0
    assert got[("u", _ts("2024-01-01 11:30:00"))] == 1
    assert got[("v", _ts("2024-01-01 10:00:00"))] == 0

    stats = {(r["user"], r["session_id"]): r
             for r in session_stats(df, "user", "ts", gap_s=1800).collect()}
    assert stats[("u", 0)]["n_events"] == 2
    assert stats[("u", 0)]["duration_s"] == 600
    assert stats[("u", 1)]["n_events"] == 1


def test_topk_global_and_per_group(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8)], "g string, x int")
    top = topk(df, 2, F.col("x").desc(), F.col("g")).collect()
    assert [r["x"] for r in top] == [9, 8]
    per = topk_per_group(df, ["g"], 1, F.col("x").desc()).collect()
    assert {(r["g"], r["x"]) for r in per} == {("a", 3), ("b", 9)}
    # global top-k must plan as TakeOrderedAndProject, not a global sort
    plan = topk(df, 2, F.col("x").desc())._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_time_bucket_and_timeseries_count(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 10:04:59"),), (_ts("2024-01-01 10:05:00"),),
         (_ts("2024-01-01 10:09:59"),)], "ts timestamp")
    b = df.select(time_bucket("ts", 300).alias("t")).collect()
    assert str(b[0]["t"]) == "2024-01-01 10:00:00"
    assert str(b[1]["t"]) == "2024-01-01 10:05:00"
    rows = timeseries_count(df, "ts", interval_s=300).collect()
    assert [(str(r["t"]), r["cnt"]) for r in rows] == [
        ("2024-01-01 10:00:00", 1), ("2024-01-01 10:05:00", 2)]


def test_approx_aggregates_close_to_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from rsyslog_nginx_clickhouse_spark.catalog import load
    from rsyslog_nginx_clickhouse_spark.queries import load_all

    from rsyslog_nginx_clickhouse_spark.queries.reference import (
        approx_daily_users_hll,
    )

    reg = load_all()
    exact = {r["d"]: r["u"] for r in
             load(spark, sf_dir, "events")
             .groupBy(F.to_date("ts").alias("d"))
             .agg(F.count_distinct("user_id").alias("u")).collect()}
    # registry KMV form: EXACT below k=1024 distinct users per day
    approx = {r["d"]: r["approx_users"] for r in
              reg["approx_daily_users"].spark(spark, sf_dir).collect()}
    for d, u in exact.items():
        assert approx[d] == u
    # production HLL++ form: bounded relative error vs the exact twin
    hll = {r["d"]: r["approx_users"] for r in
           approx_daily_users_hll(spark, sf_dir).collect()}
    for d, u in exact.items():
        assert abs(hll[d] - u) <= max(2, 0.05 * u)

    aq = {r["event_type"]: (r["p50"], r["p99"]) for r in
          reg["approx_latency_quantiles"].spark(spark, sf_dir).collect()}
    eq = {r["event_type"]: (r["p50"], r["p99"]) for r in
          reg["latency_quantiles"].spark(spark, sf_dir).collect()}
    for et, (p50, p99) in eq.items():
        assert abs(aq[et][0] - p50) <= max(1.0, 0.05 * p50)


def test_kmv_estimator_branch_above_k(spark, tmp_path):
    """Above k distinct users the KMV estimate (not the exact count)
    fires; bound its relative error at ~3/sqrt(k)."""
    from pyspark.sql import functions as F

    from rsyslog_nginx_clickhouse_spark.queries import load_all
    from rsyslog_nginx_clickhouse_spark.queries.reference import _KMV_K

    n = 5000  # >> k=1024
    (spark.range(n)
     .select(F.lit(1).alias("event_id"),
             F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
             F.col("id").alias("user_id"),
             F.lit("view").alias("event_type"),
             F.lit(1.0).alias("value"), F.lit("{}").alias("props"))
     .write.parquet(str(tmp_path / "events.parquet")))
    rows = load_all()["approx_daily_users"].spark(
        spark, str(tmp_path)).collect()
    assert len(rows) == 1
    est = rows[0]["approx_users"]
    assert abs(est - n) <= 3.0 / (_KMV_K ** 0.5) * n


def test_range_join_buckets_and_boundaries(spark):
    from rsyslog_nginx_clickhouse_spark.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:00")),   # == interval start (incl.)
         ("u", _ts("2024-01-01 11:59:59")),   # inside, different bin
         ("u", _ts("2024-01-01 12:00:00")),   # == interval end (incl.)
         ("u", _ts("2024-01-01 12:00:01")),   # just outside
         ("v", _ts("2024-01-01 10:30:00"))],  # right key, no interval
        "k string, ts timestamp")
    intervals = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00"), "A")],
        "k string, s timestamp, e timestamp, label string")
    got = range_join(points, intervals, on="k", time_col="ts",
                     start_col="s", end_col="e", bin_s=600)
    matched = {str(r["ts"]) for r in got.collect()}
    assert matched == {"2024-01-01 10:00:00", "2024-01-01 11:59:59",
                       "2024-01-01 12:00:00"}
    # no duplicate matches even though the interval spans 13 bins
    assert got.count() == 3


def test_kmv_rollup_merge_equals_direct_sketch(spark, sf_dir, tmp_path):
    """AggregatingMergeTree analog: per-part KMV states merged at read
    must be BIT-EQUAL to the direct single-pass sketch (bottom-k merge
    is exact), and each persisted part must be state-sized (<= k rows'
    worth of hashes per key), not data-sized."""
    from pyspark.sql import functions as F

    from rsyslog_nginx_clickhouse_spark.catalog import load
    from rsyslog_nginx_clickhouse_spark.plans.agg_rollup import (
        append_kmv_partial,
        read_kmv_merged,
    )
    from rsyslog_nginx_clickhouse_spark.queries import load_all

    k = 64  # small k so the estimator branch (n >= k) is exercised
    hashed = (load(spark, sf_dir, "events")
              .select(F.to_date("ts").alias("d"),
                      F.conv(F.substring(
                          F.md5(F.col("user_id").cast("string")), 1, 8),
                          16, 10).cast("bigint").alias("h"),
                      F.col("event_id")))
    path = str(tmp_path / "rollup")
    for part in range(3):
        append_kmv_partial(hashed.where(F.col("event_id") % 3 == part),
                           path, ["d"], "h", k)
    # state-sized parts: every per-key state array holds <= k hashes
    states = spark.read.parquet(path)
    assert states.where(F.size("state") > k).count() == 0
    merged = {(r["d"], r["approx_users"])
              for r in read_kmv_merged(spark, path, ["d"], k).collect()}
    # direct single-pass sketch at the same k
    from pyspark.sql import Window
    w = Window.partitionBy("d").orderBy("h")
    direct = (hashed.select("d", "h").distinct()
              .withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= k).groupBy("d")
              .agg(F.count("*").alias("n"), F.max("h").alias("hk"))
              .select("d", F.when(F.col("n") < k, F.col("n"))
                      .otherwise(F.floor(F.lit(float(k - 1))
                                         * 4294967296.0 / F.col("hk")))
                      .cast("bigint").alias("approx_users")))
    assert merged == {(r["d"], r["approx_users"])
                      for r in direct.collect()}
    # registry query agrees with the direct full-k sketch
    reg = load_all()
    a = {tuple(r) for r in
         reg["kmv_rollup_users"].spark(spark, sf_dir).collect()}
    b = {tuple(r) for r in
         reg["approx_daily_users"].spark(spark, sf_dir).collect()}
    assert a == b


def test_topk_rollup_exact_when_capacity_covers(spark, sf_dir, tmp_path):
    """topKState/topKMerge analog: with capacity >= distinct items per
    (part, key), truncation never fires, so the merged top-k must be
    BIT-EQUAL to the exact top-k over raw data regardless of the part
    split; and each persisted part must be state-sized (<= capacity
    rows per key), not data-sized."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rsyslog_nginx_clickhouse_spark.catalog import load
    from rsyslog_nginx_clickhouse_spark.plans.agg_rollup import (
        append_topk_partial,
        read_topk_merged,
    )

    ev = (load(spark, sf_dir, "events")
          .select(F.to_date("ts").alias("d"), "user_id", "event_id"))
    cap = ev.select("user_id").distinct().count()  # covers every part
    path = str(tmp_path / "topk")
    # 5 parts vs the registry's 3: exactness must not depend on split
    for part in range(5):
        append_topk_partial(ev.where(F.col("event_id") % 5 == part),
                            path, ["d"], "user_id", cap)
    states = spark.read.parquet(path)
    assert (states.groupBy("d").count()
            .where(F.col("count") > 5 * cap).count()) == 0
    merged = {tuple(r) for r in
              read_topk_merged(spark, path, ["d"], "user_id", 5).collect()}
    w = Window.partitionBy("d").orderBy(F.desc("cnt"), "user_id")
    direct = {tuple(r) for r in
              (ev.groupBy("d", "user_id").agg(F.count("*").alias("cnt"))
                 .withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= 5)).collect()}
    assert merged == direct


def test_topk_rollup_truncation_semantics(spark, tmp_path):
    """The documented Space-Saving-style miss: an item below every
    part's capacity cut is absent from the merge even if its GLOBAL
    count would rank — deterministic, and exactly what the registry
    oracle replays. Item 'c' has global count 4 (> any other) but is
    rank 3 in both parts at capacity 2, so the merged top-1 is 'a'."""
    from pyspark.sql import functions as F

    from rsyslog_nginx_clickhouse_spark.plans.agg_rollup import (
        append_topk_partial,
        read_topk_merged,
    )

    rows = []
    # part 0: a=3, b=3, c=2 ; part 1: a=3, b=3, c=2  (ties break
    # alphabetically, so capacity 2 keeps a,b in both parts)
    for part in (0, 1):
        rows += [(part, "a")] * 3 + [(part, "b")] * 3 + [(part, "c")] * 2
    df = spark.createDataFrame(rows, "part int, item string")
    path = str(tmp_path / "topk")
    for part in (0, 1):
        append_topk_partial(
            df.where(F.col("part") == part).select(
                F.lit(1).alias("g"), "item"),
            path, ["g"], "item", capacity=2)
    got = [(r["item"], r["cnt"], r["rank"]) for r in
           read_topk_merged(spark, path, ["g"], "item", 3)
           .orderBy("rank").collect()]
    assert got == [("a", 6, 1), ("b", 6, 2)]  # c truncated in every part


def test_quantile_rollup_merge_equals_direct(spark, sf_dir, tmp_path):
    """quantileState/quantileMerge analog: per-part exact histograms
    merged at read must be BIT-EQUAL to the direct quantile at the
    same explicit rank rule, regardless of how the data was split into
    parts; and each part must be histogram-sized (one row per
    (key, value)), not data-sized."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rsyslog_nginx_clickhouse_spark.catalog import load
    from rsyslog_nginx_clickhouse_spark.plans.agg_rollup import (
        append_quantile_partial,
        read_quantile_merged,
    )

    ev = (load(spark, sf_dir, "events")
          .select("event_type", "value", "event_id"))
    path = str(tmp_path / "qroll")
    # 5 parts here vs the registry's 3: merge-exactness must not
    # depend on the split
    for part in range(5):
        append_quantile_partial(ev.where(F.col("event_id") % 5 == part),
                                path, ["event_type"], "value")
    states = spark.read.parquet(path)
    assert (states.groupBy("event_type", "value").count()
            .where(F.col("count") > 5).count()) == 0  # <=1 row/part/key/value
    merged = {tuple(r) for r in read_quantile_merged(
        spark, path, ["event_type"], "value",
        {"p50": 0.5, "p99": 0.99}).collect()}
    w = Window.partitionBy("event_type").orderBy("value")
    wt = Window.partitionBy("event_type")
    s = (ev.withColumn("rn", F.row_number().over(w))
           .withColumn("n", F.count("*").over(wt)))
    direct = {tuple(r) for r in s.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") >= F.ceil(F.lit(0.5) * F.col("n")),
                     F.col("value"))).alias("p50"),
        F.min(F.when(F.col("rn") >= F.ceil(F.lit(0.99) * F.col("n")),
                     F.col("value"))).alias("p99")).collect()}
    assert merged == direct


def test_streaming_kmv_rollup_equals_direct_sketch(spark, sf_dir):
    """The streaming uniqState writer (per-EPOCH KMV partials via the
    idempotent epoch writer) must merge to the bit-identical direct
    single-pass sketch — the materialized-view equivalence; and a
    SECOND invocation (fresh scratch + fresh checkpoint) must
    reproduce it, guarding the cleared-path-but-stale-checkpoint
    failure mode that would silently return an empty rollup."""
    from rsyslog_nginx_clickhouse_spark.queries.reference import (
        approx_daily_users,
    )
    from rsyslog_nginx_clickhouse_spark.queries.stream_q import (
        streaming_kmv_rollup,
    )

    direct = [tuple(r) for r in approx_daily_users(spark, sf_dir).collect()]
    assert direct
    once = [tuple(r) for r in streaming_kmv_rollup(spark, sf_dir).collect()]
    again = [tuple(r) for r in streaming_kmv_rollup(spark, sf_dir).collect()]
    assert once == direct
    assert again == direct


def test_argmax_rollup_merge_equals_direct(spark, sf_dir, tmp_path):
    """argMaxState/argMaxMerge analog: the merged latest-row-per-key
    must be BIT-EQUAL to the direct single-pass argmax regardless of
    how the data was split into parts (max is associative), and each
    persisted part must be state-sized (exactly one row per key per
    part), not data-sized."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rsyslog_nginx_clickhouse_spark.catalog import load
    from rsyslog_nginx_clickhouse_spark.plans.agg_rollup import (
        append_argmax_partial,
        read_argmax_merged,
    )

    ev = (load(spark, sf_dir, "events")
          .select("event_type",
                  F.unix_micros("ts").alias("last_ts_us"),
                  F.col("event_id").alias("last_event_id"),
                  F.col("user_id").alias("last_user_id"),
                  F.col("value").alias("last_value")))
    path = str(tmp_path / "argmax")
    # 5 parts vs the registry's 3: exactness must not depend on split
    for part in range(5):
        append_argmax_partial(
            ev.where(F.col("last_event_id") % 5 == part),
            path, ["event_type"], ["last_ts_us", "last_event_id"],
            ["last_user_id", "last_value"])
    states = spark.read.parquet(path)
    n_keys = ev.select("event_type").distinct().count()
    assert states.count() == 5 * n_keys  # one row per key per part
    merged = {tuple(r) for r in read_argmax_merged(
        spark, path, ["event_type"], ["last_ts_us", "last_event_id"],
        ["last_user_id", "last_value"]).collect()}
    w = (Window.partitionBy("event_type")
         .orderBy(F.desc("last_ts_us"), F.desc("last_event_id")))
    direct = {tuple(r) for r in
              (ev.withColumn("rn", F.row_number().over(w))
                 .where(F.col("rn") == 1).drop("rn")).collect()}
    assert merged == direct


def test_streaming_quantile_rollup_equals_batch(spark, sf_dir):
    """The streaming quantileState writer must merge to the identical
    answer as the batch 3-part rollup AND the direct quantile (all
    three share the explicit rank rule); re-invocation (fresh scratch
    + checkpoint) must reproduce it — the stale-checkpoint guard the
    kmv twin also carries."""
    from rsyslog_nginx_clickhouse_spark.queries.reference import (
        quantile_rollup_latency,
    )
    from rsyslog_nginx_clickhouse_spark.queries.stream_q import (
        streaming_quantile_rollup,
    )

    direct = [tuple(r) for r in
              quantile_rollup_latency(spark, sf_dir).collect()]
    assert direct
    once = [tuple(r) for r in
            streaming_quantile_rollup(spark, sf_dir).collect()]
    again = [tuple(r) for r in
             streaming_quantile_rollup(spark, sf_dir).collect()]
    assert once == direct
    assert again == direct
