"""TTL retention rollup (plans/ttl.py): collapse, losslessness,
fresh-partition immutability, idempotence."""

from __future__ import annotations

import datetime
import glob
import os

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.plans.ttl import (
    apply_ttl_rollup,
    read_ttl_table,
    write_ttl_table,
)

CUT = datetime.date(2024, 1, 3)


def _mk(spark, path):
    rows = [
        ("2024-01-01", "view", 1, 100), ("2024-01-01", "view", 1, 250),
        ("2024-01-01", "click", 1, 50),
        ("2024-01-02", "view", 1, 75), ("2024-01-02", "view", 1, 25),
        ("2024-01-03", "view", 1, 10), ("2024-01-03", "view", 1, 20),
        ("2024-01-04", "click", 1, 30),
    ]
    df = (spark.createDataFrame(
            rows, "ds string, event_type string, n long, u long")
          .select(F.to_date("ds").alias("d"), "event_type", "n", "u"))
    write_ttl_table(df, path, "d")
    return df


def test_ttl_collapses_expired_losslessly_and_leaves_fresh(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)

    fresh_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "d=2024-01-0[34]", "*"))}
    assert fresh_files

    n = apply_ttl_rollup(spark, path, "d", CUT, ["event_type"],
                         ["n", "u"])
    assert n == 2  # 01-01 and 01-02 rewritten, nothing else

    t = read_ttl_table(spark, path)
    got = {(str(r.d), r.event_type): (r.cnt, r.n, r.u)
           for r in t.groupBy("d", "event_type")
                     .agg(F.count("*").alias("cnt"),
                          F.sum("n").alias("n"),
                          F.sum("u").alias("u")).collect()}
    # expired groups: ONE stored row, lossless additive state
    assert got[("2024-01-01", "view")] == (1, 2, 350)
    assert got[("2024-01-01", "click")] == (1, 1, 50)
    assert got[("2024-01-02", "view")] == (1, 2, 100)
    # fresh partitions: raw rows intact, files untouched (not rewritten)
    assert got[("2024-01-03", "view")] == (2, 2, 30)
    assert got[("2024-01-04", "click")] == (1, 1, 30)
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "d=2024-01-0[34]", "*"))}
    assert after == fresh_files


def test_ttl_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    apply_ttl_rollup(spark, path, "d", CUT, ["event_type"], ["n", "u"])
    first = sorted(tuple(r) for r in read_ttl_table(spark, path).collect())
    apply_ttl_rollup(spark, path, "d", CUT, ["event_type"], ["n", "u"])
    second = sorted(tuple(r) for r in read_ttl_table(spark, path).collect())
    assert first == second


def test_ttl_expired_scan_is_partition_pruned(spark, tmp_path):
    """The expired read must prune fresh partitions at planning time —
    at 100 TB reading fresh data to roll up old data is the failure
    mode this module exists to avoid."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    t = spark.read.parquet(path)
    read_files = {
        r.f for r in t.where(F.col("d") < F.lit(CUT))
                      .select(F.input_file_name().alias("f"))
                      .distinct().collect()}
    assert read_files  # the expired scan does read something
    assert all("d=2024-01-01" in f or "d=2024-01-02" in f
               for f in read_files)  # and never a fresh partition


def test_ttl_noop_when_nothing_expired(spark, tmp_path):
    """Cutoff before every partition: zero partitions rewritten, table
    bit-identical (the nightly pass on a young table must be free)."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    before = sorted(tuple(r) for r in read_ttl_table(spark, path).collect())
    n = apply_ttl_rollup(spark, path, "d", datetime.date(2023, 12, 1),
                         ["event_type"], ["n", "u"])
    assert n == 0
    after = sorted(tuple(r) for r in read_ttl_table(spark, path).collect())
    assert after == before


def test_ttl_all_partitions_expired(spark, tmp_path):
    """Cutoff after every partition: the whole table collapses to one
    row per (day, group) and stays lossless."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    apply_ttl_rollup(spark, path, "d", datetime.date(2024, 2, 1),
                     ["event_type"], ["n", "u"])
    t = read_ttl_table(spark, path)
    assert t.count() == t.select("d", "event_type").distinct().count()
    tot = t.agg(F.sum("n").alias("n"), F.sum("u").alias("u")).collect()[0]
    assert (tot.n, tot.u) == (8, 560)
