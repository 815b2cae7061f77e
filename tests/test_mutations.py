"""plans/mutations.py — partition-scoped copy-on-write ALTER
DELETE/UPDATE: only affected partitions are rewritten (untouched
partition files stay byte-identical on disk), predicates without
matches are no-ops, and unsafe UPDATE forms are refused."""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.plans.mutations import (
    alter_delete,
    alter_update,
)


def _table(spark, path):
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", "error" if i % 4 == 0 else "view",
          float(i)) for i in range(24)],
        "id long, d string, etype string, v double")
    df.write.partitionBy("d").parquet(path)


def _part_files(path, part):
    return sorted(glob.glob(os.path.join(path, f"d={part}", "*.parquet")))


def test_alter_delete_rewrites_only_affected_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    # d0 holds ids 0,3,6,... — errors (id%4==0) in d0: 0, 12
    before_d1 = [(f, os.path.getmtime(f)) for f in _part_files(path, "d1")]
    n = alter_delete(spark, path, "etype = 'error' AND d = 'd0'",
                     partition_col="d")
    assert n == 1
    rows = {tuple(r) for r in spark.read.parquet(path)
            .select("id", "etype").collect()}
    assert (0, "error") not in rows and (12, "error") not in rows
    assert (4, "error") in rows      # other partitions untouched
    assert (3, "view") in rows       # non-matching rows in d0 survive
    # the untouched partition's files are literally the same files
    after_d1 = [(f, os.path.getmtime(f)) for f in _part_files(path, "d1")]
    assert after_d1 == before_d1 and before_d1


def test_alter_delete_no_match_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    files = sorted(glob.glob(os.path.join(path, "*", "*.parquet")))
    assert alter_delete(spark, path, "etype = 'nope'",
                        partition_col="d") == 0
    assert sorted(glob.glob(os.path.join(path, "*", "*.parquet"))) == files


def test_alter_update_applies_assignment_and_refuses_unsafe(
        spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    n = alter_update(spark, path, {"v": "v * 10"},
                     "etype = 'error' AND d = 'd0'", partition_col="d")
    assert n == 1
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got[0] == 0.0 and got[12] == 120.0   # mutated
    assert got[3] == 3.0                        # same partition, no match
    assert got[4] == 4.0                        # other partition
    with pytest.raises(ValueError, match="unknown column"):
        alter_update(spark, path, {"nope": "1"}, "id = 0",
                     partition_col="d")
    with pytest.raises(ValueError, match="partition column"):
        alter_update(spark, path, {"d": "'d9'"}, "id = 0",
                     partition_col="d")


def test_overwrite_mode_not_leaked(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    alter_delete(spark, path, "etype = 'error'", partition_col="d")
    assert spark.conf.get(key, None) == prev


def test_alter_delete_removes_fully_matched_partition(spark, tmp_path):
    """A partition whose rows ALL match must disappear — dynamic
    overwrite alone cannot delete it (no survivors to write); the
    edge-events corpus caught exactly this (a single-row day)."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "d0", "error", 1.0), (2, "d1", "view", 2.0),
         (3, "d1", "error", 3.0)],
        "id long, d string, etype string, v double") \
        .write.partitionBy("d").parquet(path)
    n = alter_delete(spark, path, "etype = 'error'", partition_col="d")
    assert n == 2
    rows = {tuple(r) for r in spark.read.parquet(path)
            .select("id", "etype", "d").collect()}
    assert rows == {(2, "view", "d1")}
    assert not os.path.exists(os.path.join(path, "d=d0"))
