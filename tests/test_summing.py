"""SummingMergeTree-analog rollup: partial appends merge exactly."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.plans.summing import (
    append_partial,
    compact_summed,
    read_summed,
)


def test_partial_appends_merge_and_compact(spark, tmp_path):
    path = str(tmp_path / "rollup")
    epoch1 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, v double")
    epoch2 = spark.createDataFrame(
        [("a", 10.0), ("c", 7.0)], "k string, v double")

    append_partial(epoch1, path, ["k"], ["v"])
    append_partial(epoch2, path, ["k"], ["v"])

    got = {r["k"]: (r["v"], r["_n"]) for r in
           read_summed(spark, path, ["k"], ["v"]).collect()}
    assert got == {"a": (13.0, 3), "b": (5.0, 1), "c": (7.0, 1)}

    # parts on disk hold partials (2 rows for 'a'), not merged state
    raw = spark.read.parquet(path)
    assert raw.where("k = 'a'").count() == 2

    compact_summed(spark, path, ["k"], ["v"])
    raw = spark.read.parquet(path)
    assert raw.count() == 3  # one row per key after the "merge"
    got2 = {r["k"]: (r["v"], r["_n"]) for r in
            read_summed(spark, path, ["k"], ["v"]).collect()}
    assert got2 == got  # serving result unchanged by compaction
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 1
