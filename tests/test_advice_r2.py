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
