"""Summing rollup tables ↔ ClickHouse SummingMergeTree / materialized
views — the pattern every ClickHouse dashboard deployment pairs with
the raw table (the reference's MergeTree would grow one).

Semantics: writers append PARTIAL aggregate rows (epoch-local groupBy
results); reads re-aggregate over whatever parts exist; background
compaction collapses parts into one row per key — exactly MergeTree's
"merge-time summation" split into Spark terms:

- append partials  = one map-side-combined shuffle per epoch,
  O(groups) rows written, never O(events);
- read-time merge  = groupBy over a table that is already tiny;
- compaction       = the background merge, run out-of-band.

This is how a streaming pipeline maintains a dashboard rollup at
100 TB/day without ever rewriting history: each micro-batch appends its
partial sums; the serving query cost stays O(distinct keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_partial(df: DataFrame, path: str, keys: list[str],
                   sum_cols: list[str]) -> None:
    """Aggregate ``df`` to one partial row per key and append it."""
    partial = df.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count("*").alias("_n"))
    partial.write.mode("append").parquet(path)


def read_summed(spark: SparkSession, path: str, keys: list[str],
                sum_cols: list[str]) -> DataFrame:
    """Serve the rollup: merge all partial parts (cheap — input is
    already aggregated)."""
    return (spark.read.parquet(path)
            .groupBy(*keys)
            .agg(*[F.sum(c).alias(c) for c in sum_cols],
                 F.sum("_n").alias("_n")))


def compact_summed(spark: SparkSession, path: str, keys: list[str],
                   sum_cols: list[str]) -> None:
    """↔ SummingMergeTree background merge: collapse to 1 row/key.

    Writes to a temp sibling then swaps directories: overwriting the
    path the lineage lazily reads from is a data-loss hazard (a lost
    cache block after the delete would recompute from deleted files).
    Rollup tables are O(distinct keys) — small by construction — so the
    single-writer coalesce is fine.

    LOCAL-FILESYSTEM ONLY (applies to compact_replacing /
    compact_collapsed too): shutil.move/rmtree don't speak
    HDFS/S3 URIs, and the two-step swap leaves a window where the
    table path is absent for a concurrent reader. On an object store
    or under concurrent readers, use a transactional table format
    (Delta/Iceberg — REPLACE TABLE is their native compaction) or an
    atomic FileSystem.rename through the Hadoop API; this helper is
    the single-writer local-bench analog of the background merge.
    """
    import shutil

    tmp = path.rstrip("/") + ".compact-tmp"
    read_summed(spark, path, keys, sum_cols) \
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact-old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
