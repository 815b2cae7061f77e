"""Regressions for the round-1 external-advice findings (ADVICE.md).

1. range_join(how='left') duplicated matched point rows that carried a
   NULL in any column: the anti-join used plain equality over all
   columns, which is never true against NULL.
2. idempotent_epoch_writer replayed onto a HALF-STAGED epoch without
   clearing the staging dir, so an append-mode write_fn doubled the
   epoch's rows (the summing rollup's append_partial is exactly that).
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.operators.rangejoin import range_join
from rsyslog_nginx_clickhouse_spark.streaming.ingest import (
    idempotent_epoch_writer,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_range_join_left_null_column_no_duplicate(spark):
    # the matched point carries a NULL payload column: it must appear
    # exactly once (matched), not again with null interval columns
    points = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:30:00"), None),
         ("u", _ts("2024-01-01 20:00:00"), "x")],
        "k string, ts timestamp, payload string")
    intervals = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "A")],
        "k string, s timestamp, e timestamp, label string")
    got = range_join(points, intervals, on="k", time_col="ts",
                     start_col="s", end_col="e", bin_s=600, how="left")
    rows = sorted((str(r["ts"]), r["label"]) for r in got.collect())
    assert rows == [("2024-01-01 10:30:00", "A"),
                    ("2024-01-01 20:00:00", None)]


def test_range_join_left_all_null_point_row(spark):
    # a point whose key itself is NULL never matches any interval, and
    # must survive the left join exactly once
    points = spark.createDataFrame(
        [(None, _ts("2024-01-01 10:30:00"))], "k string, ts timestamp")
    intervals = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "A")],
        "k string, s timestamp, e timestamp, label string")
    got = range_join(points, intervals, on="k", time_col="ts",
                     start_col="s", end_col="e", bin_s=600, how="left")
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["label"] is None


def test_cosine_lsh_banded_finds_identical_vectors(spark):
    # identical vectors agree on every plane, hence on every band — the
    # banded formulation must always emit exact duplicates
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        cosine_dedup_pairs,
    )

    vecs = [(1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in
           cosine_dedup_pairs(emb, threshold=0.99, dim=4,
                              use_lsh=True).collect()}
    assert (1, 2) in got


def test_cosine_dedup_exact_respects_string_ids(spark):
    # output id columns must inherit the INPUT id type (regression: a
    # hardcoded 'id_a long' broke non-long ids)
    from rsyslog_nginx_clickhouse_spark.operators.similarity import (
        cosine_dedup_pairs,
    )

    vecs = [("a", [1.0, 0.0]), ("b", [1.0, 0.0]), ("c", [0.0, 1.0])]
    emb = spark.createDataFrame(vecs, "vec_id string, embedding array<float>")
    got = cosine_dedup_pairs(emb, threshold=0.99, dim=2)
    assert dict(got.dtypes)["id_a"] == "string"
    assert {(r["id_a"], r["id_b"]) for r in got.collect()} == {("a", "b")}


def test_kafka_record_transform_feeds_parse_chain(spark):
    # a batch DataFrame with Kafka's wire schema runs the SAME
    # record→line→parse chain the live source uses (recorded-protocol
    # test; no broker in the sandbox)
    from rsyslog_nginx_clickhouse_spark.sources.nginx_log import parse_lines
    from rsyslog_nginx_clickhouse_spark.streaming.ingest import (
        kafka_records_to_lines,
    )

    line = ('9.9.9.9 - - [06/Apr/2020:09:01:00 +0000] "GET /k HTTP/1.1" '
            '200 77 "-" "kafka-ua" "-"')
    records = spark.createDataFrame(
        [(b"k1", line.encode(), "nginx", 0, 42)],
        "key binary, value binary, topic string, partition int, "
        "offset long")
    parsed = parse_lines(kafka_records_to_lines(records)).collect()
    assert len(parsed) == 1
    row = parsed[0]
    assert row["clientip"] == "9.9.9.9" and row["request"] == "/k"


def test_kafka_source_missing_connector_raises_actionable_error(spark):
    import pytest

    from rsyslog_nginx_clickhouse_spark.streaming.ingest import (
        stream_access_log_kafka,
    )

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        stream_access_log_kafka(spark, "localhost:9092", "nginx")


def test_compact_versioned_cutover_keeps_old_readers_alive(spark, tmp_path):
    from rsyslog_nginx_clickhouse_spark.plans.storage import (
        compact,
        write_mergetree_like,
    )

    df = spark.range(100).select(
        F.lit("2024-01-01").cast("date").alias("logdate"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double")))
        .alias("logdatetime"))
    path = str(tmp_path / "t")
    write_mergetree_like(df, path)
    compact(spark, path)  # migrate to versioned layout (v0 + v1)
    assert os.path.islink(path)
    # snapshot reader opened BEFORE the next compaction, materialized
    # AFTER: read_table pins the version at open, and keep_old retains
    # it, so the in-flight reader finishes consistently (the old layout
    # deleted the files out from under it)
    from rsyslog_nginx_clickhouse_spark.plans.storage import read_table
    pre_snapshot = read_table(spark, path)
    pre_raw = spark.read.parquet(path)  # follows the symlink per-file
    compact(spark, path)  # pure atomic flip, no migration path
    assert pre_snapshot.count() == 100
    assert spark.read.parquet(path).count() == 100
    # the raw-path reader must fail CLEANLY (stale file list), never
    # silently mix versions
    import pytest

    with pytest.raises(Exception, match="FILE_NOT_EXIST|does not exist"):
        pre_raw.count()
    # retention: current + previous only (v0 pruned by the 2nd compact)
    import glob as g
    vers = sorted(g.glob(path + ".compact-v*"))
    assert [v.rsplit("-v", 1)[1] for v in vers] == ["1", "2"]


def test_compact_keep_old_false_removes_previous_version(spark, tmp_path):
    from rsyslog_nginx_clickhouse_spark.plans.storage import (
        compact,
        write_mergetree_like,
    )

    df = spark.range(10).select(
        F.lit("2024-01-01").cast("date").alias("logdate"),
        F.current_timestamp().alias("logdatetime"))
    path = str(tmp_path / "t")
    write_mergetree_like(df, path)
    compact(spark, path)           # migrate: v0 (prev) + v1 (current)
    compact(spark, path, keep_old=False)   # v2 only; v0+v1 pruned
    import glob as g
    vers = sorted(g.glob(path + ".compact-v*"))
    assert [v.rsplit("-v", 1)[1] for v in vers] == ["2"]
    assert spark.read.parquet(path).count() == 10


def test_compact_preserves_epoch_markers_for_replay(spark, tmp_path):
    from rsyslog_nginx_clickhouse_spark.plans.storage import compact

    table = str(tmp_path / "table")
    os.makedirs(table)
    batch = spark.createDataFrame(
        [("2024-01-01", "2024-01-01 00:00:01", i) for i in range(6)],
        "logdate string, logdatetime string, v long").select(
        F.col("logdate").cast("date"), F.col("logdatetime").cast("timestamp"),
        "v")
    sink = idempotent_epoch_writer(table)
    sink(batch, 0)
    n = spark.read.parquet(table).count()
    compact(spark, table)
    # the compacted version must carry the epoch marker: a checkpoint
    # replay of epoch 0 has to short-circuit, or its rows (already
    # folded into the compacted files) would be ingested twice
    sink(batch, 0)
    assert spark.read.parquet(table).count() == n


def test_epoch_replay_clears_half_staged_append(spark, tmp_path):
    table = str(tmp_path / "table")
    os.makedirs(table)
    batch = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)],
                                  "k string, v long")

    def append_write(df, staging):
        df.write.mode("append").parquet(staging)

    sink = idempotent_epoch_writer(table, write_fn=append_write)
    # simulate a crashed first attempt that staged the epoch but never
    # published: leftover staged files exist when the replay arrives
    append_write(batch, os.path.join(table, "_staging_0"))
    sink(batch, 0)
    got = (spark.read.parquet(table).groupBy("k")
           .agg(F.sum("v").alias("s")).collect())
    assert {r["k"]: r["s"] for r in got} == {"a": 3, "b": 3}
