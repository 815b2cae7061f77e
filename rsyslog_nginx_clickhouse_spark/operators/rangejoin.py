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
    # cast("timestamp") first: TIMESTAMP_NTZ → double is illegal, and
    # with a UTC session the extra cast is exact (no-op for TimestampType)
    return F.floor(col.cast("timestamp").cast("double") / bin_s).cast("long")


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
    valid = intervals.withColumnRenamed(on, "__ikey") \
                     .where(F.col(end_col) >= F.col(start_col))
    start_b = _bin(F.col(start_col), bin_s)
    end_b = _bin(F.col(end_col), bin_s)
    span = end_b - start_b
    # Intervals wider than the explode budget (legit multi-month spans
    # or corrupt end timestamps) must neither blow up the explode NOR
    # silently lose matches to a clamp: they take a key-only join —
    # fine, because by the operator's premise wide intervals are FEW
    # (set bin_s near the typical length), so the candidate fan-out of
    # the key join stays bounded.
    narrow = (valid.where(span <= MAX_BINS_PER_INTERVAL)
              .withColumn("__ibin", F.explode(F.sequence(start_b, end_b))))
    wide = valid.where(span > MAX_BINS_PER_INTERVAL) \
                .withColumn("__ibin", F.lit(None).cast("long"))
    between = F.col(time_col).between(F.col(start_col), F.col(end_col))
    narrow_cond = ((F.col(on) == F.col("__ikey"))
                   & (F.col("__pbin") == F.col("__ibin")) & between)
    wide_cond = (F.col(on) == F.col("__ikey")) & between
    matched = (pts.join(narrow, narrow_cond, "inner")
                  .unionByName(pts.join(wide, wide_cond, "inner"))
                  .drop("__ikey", "__pbin", "__ibin"))
    if how == "inner":
        return matched
    # left: append points that matched nothing, with null interval cols.
    # The anti-join must be NULL-SAFE: `on=points.columns` uses plain
    # equality, so a matched point carrying a NULL in any column never
    # anti-matches and is emitted AGAIN with null interval columns
    # (duplicate row). Rename the matched projection (fresh exprIds —
    # also sidesteps the self-join ambiguity trap) and compare with
    # eqNullSafe, which Spark still plans as an equi-join key.
    import functools
    import operator as _op

    matched_keys = matched.select(
        *[F.col(c).alias(f"__m_{c}") for c in points.columns]).distinct()
    null_safe = functools.reduce(_op.and_, [
        F.col(c).eqNullSafe(F.col(f"__m_{c}")) for c in points.columns])
    unmatched = points.join(matched_keys, null_safe, "left_anti")
    for c in matched.columns:
        if c not in points.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(matched.dtypes)[c]))
    return matched.unionByName(unmatched.select(*matched.columns))
