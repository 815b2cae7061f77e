"""Partitioned, sort-keyed columnar storage ↔ ClickHouse MergeTree.

Reference DDL (/root/reference/nginx.click:1):
``ENGINE=MergeTree PARTITION BY toYYYYMMDD(logdate)
ORDER BY (logdate, logdatetime) SETTINGS index_granularity=8192``.

Spark mapping (SURVEY §1.3):

- ``partitionBy(partition_col)``      ↔ daily partitions → partition
  pruning on date predicates (Catalyst prunes directories before scan).
- ``sortWithinPartitions(sort_cols)`` ↔ MergeTree ORDER BY → Parquet
  row-group min/max stats become selective, so time-range predicates
  skip row groups exactly like the sparse primary index skips marks.
- ``parquet.block.size``              ↔ index_granularity (skip grain).
- ``compact()``                       ↔ background merges: micro-batch
  appends create small sorted parts; periodic compaction rewrites each
  partition into few large sorted files.

At 100 TB: partition count = days (bounded), file size controlled by
``repartition(n, partition_col)`` per partition before the sorted write,
so no small-file explosion and no global shuffle (repartition hashes on
the partition key only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: ↔ index_granularity=8192 rows/mark: one 128 MB row group ≈ the same
#: skipping role at parquet's granularity.
DEFAULT_BLOCK_SIZE = 128 * 1024 * 1024


def write_mergetree_like(df: DataFrame, path: str,
                         partition_col: str = "logdate",
                         sort_cols: tuple[str, ...] = ("logdate", "logdatetime"),
                         mode: str = "append",
                         files_per_partition: int | None = None) -> None:
    """Write ``df`` as a day-partitioned, time-sorted parquet table."""
    if files_per_partition:
        # salt WITHIN the partition key: hashing on the key alone sends
        # each day to ONE task (k files/day would never materialize and
        # a hot day would serialize through a single writer)
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in sort_cols]),
                      F.lit(files_per_partition))
        # explicit partition count (AQE would coalesce an expression-only
        # repartition), scaled by parallelism so a multi-day backfill
        # isn't capped at files_per_partition writers TOTAL; per-day file
        # count still bounded by the salt domain
        n = files_per_partition * max(
            1, df.sparkSession.sparkContext.defaultParallelism)
        df = df.repartition(n, F.col(partition_col), salt)
    (df.sortWithinPartitions(*sort_cols)
       .write.mode(mode)
       .option("parquet.block.size", str(DEFAULT_BLOCK_SIZE))
       .partitionBy(partition_col)
       .parquet(path))


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact(spark: SparkSession, path: str,
            partition_col: str = "logdate",
            sort_cols: tuple[str, ...] = ("logdate", "logdatetime"),
            files_per_partition: int = 1) -> None:
    """↔ MergeTree background merge: rewrite into few large sorted parts.

    Reads the whole table, re-sorts within partitions, overwrites with
    dynamic partition overwrite so only touched partitions are replaced.
    Run out-of-band (the reference's merges are async too).
    """
    import shutil

    df = spark.read.parquet(path)
    # salt within the day (key-only hashing would funnel each day
    # through ONE writer — see write_mergetree_like), and write to a
    # temp sibling then swap: overwriting the path the lineage lazily
    # reads from risks recompute-from-deleted-files on block loss
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in sort_cols]),
                  F.lit(files_per_partition))
    tmp = path.rstrip("/") + ".compact-tmp"
    (df.repartition(files_per_partition, F.col(partition_col), salt)
       .sortWithinPartitions(*sort_cols)
       .write.mode("overwrite")
       .option("parquet.block.size", str(DEFAULT_BLOCK_SIZE))
       .partitionBy(partition_col)
       .parquet(tmp))
    old = path.rstrip("/") + ".compact-old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
