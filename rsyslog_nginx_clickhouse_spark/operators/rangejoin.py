"""Range (interval) join — point-in-interval matching at scale.

Spark plans a plain ``t BETWEEN start AND end`` join as
BroadcastNestedLoopJoin (quadratic — the one plan tools/plancheck.py
flags). The scale formulation is interval bucketing: quantize time into
fixed-width bins, explode each interval to the bins it overlaps, then
EQUI-join points to intervals on (key, bin) and re-check the exact
predicate. Cost: one shuffle on (key, bin); candidate width is bounded
by interval_length/bin + 2, never the table size. (DuckDB/ClickHouse
ship the same idea as their "interval join" optimizations.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BIN_S = 3600


def _bin(col: Column, bin_s: int) -> Column:
    return F.floor(col.cast("double") / bin_s).cast("long")


MAX_BINS_PER_INTERVAL = 4096


def range_join(points: DataFrame, intervals: DataFrame, on: str,
               time_col: str, start_col: str, end_col: str,
               bin_s: int = DEFAULT_BIN_S,
               how: str = "inner") -> DataFrame:
    """Join each point row to interval rows of the same ``on`` key with
    ``start <= time <= end`` — via bucketed equi-join, no cross product.

    ``bin_s`` trades candidate width against explode factor: set it
    near the TYPICAL interval length so intervals explode to ~2 bins.

    The exact between-predicate lives INSIDE the join condition (not a
    post-filter) so outer joins keep their semantics: with ``left``, a
    point matching no interval survives with null interval columns —
    a post-join where() would evaluate NULL and silently drop it. A
    point has exactly one bin, so explode never duplicates matches.
    """
    if how not in ("inner", "left"):
        # right/full would emit unmatched intervals once per exploded
        # bin with their key stripped — not meaningful semantics here
        raise ValueError("range_join supports how='inner' or 'left'")
    pts = points.withColumn("__pbin", _bin(F.col(time_col), bin_s))
    start_b = _bin(F.col(start_col), bin_s)
    # clamp: one corrupt wide interval (bad end timestamp) must not
    # explode into millions of rows and kill the job; beyond-clamp
    # intervals are dropped to the dead-letter path by the caller
    end_b = F.least(_bin(F.col(end_col), bin_s),
                    start_b + F.lit(MAX_BINS_PER_INTERVAL))
    iv = (intervals.withColumnRenamed(on, "__ikey")
          .where(F.col(end_col) >= F.col(start_col))
          .withColumn("__ibin", F.explode(F.sequence(start_b, end_b))))
    cond = ((F.col(on) == F.col("__ikey"))
            & (F.col("__pbin") == F.col("__ibin"))
            & F.col(time_col).between(F.col(start_col), F.col(end_col)))
    return pts.join(iv, cond, how).drop("__ikey", "__pbin", "__ibin")
