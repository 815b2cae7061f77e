"""Distributed prefix aggregation (cumulative sums over a global order).

A global-order window (``Window.orderBy(k)`` with no partitionBy) is
correct but collapses to ONE partition — the classic Spark scale trap
(WindowExec warns about it). The scale-sane form is the textbook
two-phase scan:

1. range-partition by the order key (``repartitionByRange`` — one
   sampling pass + shuffle; ranges are contiguous in key order),
2. per-partition partial sums (parallel),
3. a driver-side exclusive prefix over the per-partition totals — a
   parameter-sized fetch (one row per partition, NOT data rows),
4. per-partition cumulative window (parallel: partitioned by the range
   id) plus the partition's offset.

The output is invariant to the (sampled, nondeterministic) range
boundaries: the prefix over a sorted sequence doesn't depend on where
it was cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.plans.barrier import barrier


def distributed_cumsum(df: DataFrame, order_col: str, val_col: str,
                       num_ranges: int | None = None,
                       out_col: str = "cum") -> DataFrame:
    """df + ``out_col`` = inclusive cumulative sum of ``val_col`` in
    ``order_col`` order. ``order_col`` values must be unique (a total
    order); ties would make the prefix ambiguous.
    """
    spark = df.sparkSession
    if num_ranges is None:
        num_ranges = spark.sparkContext.defaultParallelism
    # localCheckpoint pins the RANGE BOUNDARIES: repartitionByRange
    # samples to pick them, and without the barrier the totals pass and
    # the window pass would re-execute the shuffle with fresh samples —
    # per-range offsets computed against one partitioning, applied to
    # another. Checkpoint, not cache: a cache entry pins CacheManager
    # blocks for the session lifetime (the leak connected_components
    # avoids) and an evicted block would silently RESAMPLE on
    # recompute; checkpoint blocks are freed by ContextCleaner when the
    # plan is GC'd and never re-derive.
    ranged = (df.repartitionByRange(num_ranges, F.col(order_col))
                .withColumn("__rng", F.spark_partition_id())
                .transform(barrier))
    # per-range totals: num_ranges rows — the driver fetch is
    # parameter-sized (one row per partition), never data-sized
    totals = (ranged.groupBy("__rng")
                    .agg(F.sum(val_col).alias("__tot"))
                    .collect())
    offsets = {}
    run = 0
    for row in sorted(totals, key=lambda r: r["__rng"]):
        offsets[row["__rng"]] = run
        run += row["__tot"] or 0
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("__rng")) if offsets else F.lit(0)
    w = (Window.partitionBy("__rng").orderBy(order_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ranged.withColumn(out_col, F.sum(val_col).over(w) + off)
                  .drop("__rng"))


def shard_assignment(cum: Column, val: Column, target: Column | int) -> Column:
    """Shard id for a row given its inclusive running total: the shard
    the row STARTS in — floor(exclusive_prefix / target). Every shard
    holds ~``target`` units (the last row of a shard may spill past the
    boundary rather than split a document)."""
    target = F.lit(target) if isinstance(target, int) else target
    return F.floor((cum - val) / target).cast("int")
