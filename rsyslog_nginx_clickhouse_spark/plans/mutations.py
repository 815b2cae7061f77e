"""ClickHouse mutations (``ALTER TABLE t DELETE/UPDATE … WHERE p``) ↔
partition-scoped copy-on-write rewrites.

ClickHouse implements mutations by rewriting whole data parts that
contain matching rows; untouched parts are left alone. The Spark-first
analog on a partitioned parquet table is the same shape:

1. find the AFFECTED partitions — one partition-pruned scan of the
   predicate columns, ``collect()`` of the distinct partition values
   (parameter-sized: O(partitions), never O(rows));
2. rewrite ONLY those partitions with the mutation applied, via
   dynamic partition overwrite (``partitionOverwriteMode=dynamic`` —
   the non-listed partitions are untouched on disk, exactly
   ClickHouse's untouched parts).

At 100 TB this is the difference between rewriting a day and
rewriting the table: a DELETE WHERE scoped to a date range touches
only those date partitions, and the predicate reaches the scan as a
partition filter (PushedFilters / PartitionFilters in the plan).

GDPR-style deletes and backfill UPDATEs on training corpora are the
pipeline use case (delete a user's rows, re-score a date range).

Reference parity: the reference's MergeTree tables
(/root/reference/nginx.click:1) support exactly these two statements;
the reference repo itself delegates them to ClickHouse.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def _dynamic_overwrite(spark: SparkSession):
    """Scope partitionOverwriteMode=dynamic to the rewrite — leaking
    it session-wide would turn later full overwrites into silent
    partial ones (same guard as plans/storage.compact)."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _affected_partitions(df: DataFrame, where: str,
                         partition_col: str) -> list:
    """Distinct partition values holding matching rows — a
    parameter-sized driver fetch (one row per affected partition)."""
    return [r[0] for r in (df.where(where)
                             .select(partition_col).distinct()
                             .collect())]


def alter_delete(spark: SparkSession, path: str, where: str,
                 partition_col: str) -> int:
    """``ALTER TABLE <path> DELETE WHERE <where>`` — rewrite only the
    partitions containing matching rows, keeping their non-matching
    rows. Returns the number of partitions rewritten."""
    df = spark.read.parquet(path)
    parts = _affected_partitions(df, where, partition_col)
    if not parts:
        return 0
    survivors = (df.where(F.col(partition_col).isin(parts))
                   .where(f"NOT ({where})"))
    # dynamic overwrite only replaces partitions PRESENT in the
    # written data — a partition whose rows ALL matched has no
    # survivors to write and would silently survive the delete
    # (caught by the edge-events corpus: a single-row day). Those
    # fully-deleted partitions are removed explicitly; the kept-set
    # fetch is parameter-sized (one row per affected partition).
    kept = {r[0] for r in (survivors.select(partition_col)
                           .distinct().collect())}
    with _dynamic_overwrite(spark):
        (survivors.write.mode("overwrite")
                  .partitionBy(partition_col).parquet(path))
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for p in parts:
        if p in kept:
            continue
        name = ("__HIVE_DEFAULT_PARTITION__" if p is None else str(p))
        jpath = jvm.org.apache.hadoop.fs.Path(
            f"{path}/{partition_col}={name}")
        jpath.getFileSystem(conf).delete(jpath, True)
    return len(parts)


def alter_update(spark: SparkSession, path: str,
                 assignments: dict[str, str], where: str,
                 partition_col: str) -> int:
    """``ALTER TABLE <path> UPDATE c = expr, … WHERE <where>`` —
    rewrite only the affected partitions, applying each assignment to
    matching rows (non-matching rows in those partitions are copied
    unchanged). Assignment expressions are SQL strings evaluated per
    row. Returns the number of partitions rewritten."""
    df = spark.read.parquet(path)
    bad = [c for c in assignments if c not in df.columns]
    if bad:
        raise ValueError(f"UPDATE of unknown column(s) {bad} — "
                         f"mutations cannot add columns")
    if partition_col in assignments:
        raise ValueError(
            f"UPDATE of the partition column {partition_col!r} would "
            f"move rows between partitions — a shuffle-rewrite of the "
            f"whole table, not a mutation; use a rebuild instead")
    parts = _affected_partitions(df, where, partition_col)
    if not parts:
        return 0
    mutated = df.where(F.col(partition_col).isin(parts)).select(
        *[F.expr(f"IF({where}, {assignments[c]}, {c})").alias(c)
          if c in assignments else F.col(c)
          for c in df.columns])
    with _dynamic_overwrite(spark):
        (mutated.write.mode("overwrite")
                .partitionBy(partition_col).parquet(path))
    return len(parts)
