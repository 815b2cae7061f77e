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


def test_replacing_latest_wins_and_compaction(spark, tmp_path):
    import os

    from pyspark.sql import functions as F
    from rsyslog_nginx_clickhouse_spark.plans.replacing import (
        append_versions,
        compact_replacing,
        read_latest,
    )

    path = str(tmp_path / "repl")
    rows_v0 = [(1, "a", 0), (2, "b", 0), (3, "c", 0)]
    rows_v1 = [(2, "B", 1)]
    rows_v2 = [(2, "BB", 2), (3, "CC", 2)]
    for rows in (rows_v0, rows_v1, rows_v2):
        append_versions(
            spark.createDataFrame(rows, "k long, payload string, ver int"),
            path)

    def latest():
        return {r["k"]: (r["payload"], r["ver"])
                for r in read_latest(spark, path, ["k"], "ver",
                                     ["payload"]).collect()}

    expect = {1: ("a", 0), 2: ("BB", 2), 3: ("CC", 2)}
    assert latest() == expect
    # compaction drops superseded versions but not the answer
    compact_replacing(spark, path, ["k"], "ver", ["payload"])
    assert latest() == expect
    assert spark.read.parquet(path).count() == 3  # one row per key now
    # same-version tie: struct-greatest payload wins, deterministically
    append_versions(
        spark.createDataFrame([(1, "z", 0), (1, "y", 0)],
                              "k long, payload string, ver int"), path)
    assert latest()[1] == ("z", 0)


def test_collapsing_cancels_pairs(spark, tmp_path):
    from rsyslog_nginx_clickhouse_spark.plans.collapsing import (
        append_signed,
        compact_collapsed,
        read_collapsed,
    )

    path = str(tmp_path / "coll")
    append_signed(spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k long, p string, sign int"), path)
    # mutate k=1: cancel old, insert new; delete k=2 outright
    append_signed(spark.createDataFrame(
        [(1, "a", -1), (1, "A", 1), (2, "b", -1)],
        "k long, p string, sign int"), path)

    def state():
        return {(r["k"], r["p"])
                for r in read_collapsed(spark, path, ["k"], ["p"]).collect()}

    assert state() == {(1, "A")}
    compact_collapsed(spark, path, ["k"], ["p"])
    assert state() == {(1, "A")}
    assert spark.read.parquet(path).count() == 1  # cancelled pairs gone
    # appends keep composing after compaction
    append_signed(spark.createDataFrame(
        [(1, "A", -1), (1, "AA", 1)], "k long, p string, sign int"), path)
    assert state() == {(1, "AA")}


def test_collapsing_compaction_keeps_sign_dtype(spark, tmp_path):
    """A bigint sign column must survive compaction as bigint: an
    int32 rewrite next to int64 appends leaves the directory with
    mixed parquet physical types that single-footer schema inference
    then misreads."""
    from pyspark.sql import types as T

    from rsyslog_nginx_clickhouse_spark.plans.collapsing import (
        append_signed,
        compact_collapsed,
        read_collapsed,
    )

    path = str(tmp_path / "coll64")
    append_signed(spark.createDataFrame(
        [(1, "a", 1), (1, "a", -1), (2, "b", 1)],
        "k long, p string, sign long"), path)
    compact_collapsed(spark, path, ["k"], ["p"])
    assert spark.read.parquet(path).schema["sign"].dataType \
        == T.LongType()
    # post-compaction appends with the original dtype still read back
    append_signed(spark.createDataFrame(
        [(2, "b", -1)], "k long, p string, sign long"), path)
    assert {(r["k"], r["p"]) for r in
            read_collapsed(spark, path, ["k"], ["p"]).collect()} == set()
