"""TTL-driven retention rollup ↔ ClickHouse ``TTL ... GROUP BY``.

Reference anchor: the reference's MergeTree table
(/root/reference/nginx.click:1) grows one day-partition per day of
tailed logs forever; the operational companion ClickHouse ships for
that is table TTL — ``TTL logdate + INTERVAL 90 DAY GROUP BY logdate,
status SET requests = sum(requests)`` — which MERGES expired rows into
per-group aggregate rows at part-merge time, keeping dashboards over
old data cheap while bounding storage. This module is the Spark-side
analog over the day-partitioned parquet layout of ``plans/storage.py``.

Semantics (matching CH ``TTL ... GROUP BY`` with ``SET agg(col)``):

- rows whose partition value is OLDER than the cutoff are replaced by
  one row per (partition, group key) carrying merged aggregate state;
- rows at or after the cutoff are untouched — not rewritten, not even
  read;
- the table keeps ONE schema for raw and rolled rows by storing
  aggregate STATE columns from ingest (``n`` = 1, additive unit sums)
  — exactly how a SummingMergeTree under TTL GROUP BY behaves, and
  what keeps the rollup lossless for additive aggregates.

At 100 TB the only acceptable shape is partition-local work, which is
what this is:

- the expired set is found by PARTITION PRUNING (the ``part_col <
  cutoff`` predicate prunes directories before any file is opened);
- the rollup is one partial-agg shuffle over expired rows only,
  O(groups) output;
- publication is a DYNAMIC partition overwrite — Spark stages and
  atomically renames ONLY the partitions present in the written
  DataFrame; fresh partitions' files are never touched. This is the
  same only-touched-partitions contract as CH's per-part TTL merges,
  and it degrades gracefully: re-running after a crash just rewrites
  the same expired partitions to the same content (idempotent).

Single-writer contract (same as ``plans/storage.compact``): TTL
application must not run concurrently with ingest into the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_ttl_table(df: DataFrame, path: str, part_col: str) -> None:
    """Initial ingest of a TTL-managed table: day-partitioned parquet
    with aggregate-state columns already in row form (``n`` = 1 per
    raw event, additive unit columns)."""
    df.write.mode("overwrite").partitionBy(part_col).parquet(path)


def apply_ttl_rollup(spark: SparkSession, path: str, part_col: str,
                     cutoff, group_cols: list[str],
                     sum_cols: list[str]) -> int:
    """Roll up partitions older than ``cutoff``: each expired
    (partition, *group_cols) group collapses to one row with
    ``sum_cols`` (additive states, ``n`` included by the caller)
    summed. Returns the number of expired partitions rewritten.

    Reads ONLY expired partitions (pruned scan) and rewrites ONLY
    those partitions (dynamic partition overwrite) — fresh data is
    never read or moved, so the cost is O(expired rows) regardless of
    table size.

    The rolled rows are STAGED to a sibling directory first, then
    re-read for the overwrite: Spark (correctly) refuses a write whose
    plan also reads the destination path, and the stage is O(groups)
    data — the same two-step every table format's ``OPTIMIZE``/merge
    performs before its manifest swap.
    """
    import shutil

    t = spark.read.parquet(path)
    expired = t.where(F.col(part_col) < F.lit(cutoff))
    rolled = (expired.groupBy(part_col, *group_cols)
              .agg(*[F.sum(c).alias(c) for c in sum_cols])
              .select(*t.columns))  # keep the table's column order
    if rolled.isEmpty():  # young table: the nightly pass is a no-op
        return 0
    stage = path + ".ttl-stage"
    shutil.rmtree(stage, ignore_errors=True)
    rolled.write.mode("overwrite").partitionBy(part_col).parquet(stage)
    staged = spark.read.parquet(stage).select(*t.columns)
    n_parts = staged.select(part_col).distinct().count()
    (staged.repartition(max(n_parts, 1), F.col(part_col))
           .write.mode("overwrite")
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy(part_col)
           .parquet(path))
    shutil.rmtree(stage, ignore_errors=True)
    return n_parts


def read_ttl_table(spark: SparkSession, path: str) -> DataFrame:
    """Serving read over the post-TTL table: raw recent rows and
    rolled historical rows share one schema, so readers aggregate
    both identically (merge-on-read is a plain SUM of states)."""
    return spark.read.parquet(path)
