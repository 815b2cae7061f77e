"""As-of join — for each left row, the latest right row at or before it.

Spark has no native ASOF JOIN (DuckDB/ClickHouse do). Implemented as a
composition of built-in ops — the union-sort-window trick:

1. tag both sides, union on (key, time) with the left's payload nulled
   on right rows and vice versa,
2. one window per key ordered by time: ``last(right_payload,
   ignorenulls=true)`` carries the most recent right value forward,
3. keep left rows.

Cost: ONE shuffle on the key (the union sorts within partitions inside
the window), versus the naive range-join which is O(n·m) per key. This
is the 100 TB-safe formulation: no cross product, no broadcast of a big
side, skew handled by AQE. (Equivalent to pd.merge_asof semantics with
direction='backward', allow_exact_matches=True.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, time_col: str,
              right_time_col: str | None = None,
              value_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For each left row: latest right row with same ``on`` key and
    right time <= left time. Right payload columns arrive suffixed; the
    matched right time arrives as ``{rtime}{suffix}``.

    SQL equality semantics: right rows with a NULL key or NULL time can
    never be an as-of match (DuckDB ASOF JOIN / pd.merge_asof agree) and
    are filtered out before the union — without that, a null-keyed or
    null-timed right row would be carried as a phantom match.
    """
    rtime = right_time_col or time_col
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, rtime)]
    right = right.where(F.col(on).isNotNull() & F.col(rtime).isNotNull())

    # The right payload is carried as ONE struct, not per-column: the
    # struct of a right row is never null, so last(ignorenulls) always
    # carries a complete row — per-column carry would stitch together
    # fields from DIFFERENT right rows whenever a value is null
    # (pd.merge_asof / ASOF JOIN return the matched row's nulls as-is).
    rrow_type = F.struct(
        *[F.col(c) for c in value_cols], F.col(rtime).alias("__rt"))
    lhs = left.select(
        F.col(on), F.col(time_col).alias("__t"), F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(rrow_type.alias("x")).schema["x"].dataType)
        .alias("__rrow"),
    )
    rhs = right.select(
        F.col(on), F.col(rtime).alias("__t"), F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
        rrow_type.alias("__rrow"),
    )
    # Right rows sort before left rows at equal time → exact matches
    # allowed. The content-hash tiebreak makes the winner among
    # duplicate (key, time) right rows deterministic (otherwise it
    # depends on shuffle order — run-to-run flaky).
    w = (Window.partitionBy(on)
         .orderBy(F.col("__t"), F.col("__is_left"),
                  F.xxhash64(F.col("__rrow")))
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = lhs.unionByName(rhs).select(
        "*",
        F.last("__rrow", ignorenulls=True).over(w).alias("__c"),
    )
    out = carried.where(F.col("__is_left") == 1).select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col("__c")[c].alias(f"{c}{suffix}") for c in value_cols],
        F.col("__c")["__rt"].alias(f"{rtime}{suffix}"),
    )
    return out
