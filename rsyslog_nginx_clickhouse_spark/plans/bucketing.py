"""Bucketed tables: shuffle-free fact-to-fact joins.

The 100 TB problem partitionBy can't solve: joining two FACT tables
(orders ⋈ lineitem) shuffles both sides on the key — at 100 TB that
shuffle IS the job. Bucketing pre-hashes each table into N buckets on
the join key at write time (↔ ClickHouse would need a distributed-table
sharding key; vanilla MergeTree has no equivalent — this is a place the
Spark rebuild is strictly stronger than the reference stack).

Spark requires bucketed data to live in the session catalog
(``bucketBy`` + ``saveAsTable``); a matching bucket count on both sides
lets the planner prove co-partitioning and drop both Exchanges from the
join (SortMergeJoin directly over the scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort: bool = True) -> None:
    """Persist ``df`` hash-bucketed (and in-bucket sorted) on ``key``.

    Sorting within buckets additionally removes the join's Sort nodes
    (SMJ reads both sides pre-sorted) and makes row-group stats
    selective on the key.
    """
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.

    With both sides bucketed on ``key`` the plan contains NO Exchange —
    verified in tests/test_bucketing.py. At 100 TB this turns the
    biggest shuffle in the workload into a map-side merge.
    """
    return spark.table(left_table).join(spark.table(right_table), key)
