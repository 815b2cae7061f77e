"""Top-K operators (implied by the reference's dashboard surface —
"top pages / top clients" panels are the canonical second Grafana panel;
SURVEY §2.7 notes the reference inherits these from ClickHouse SQL).

Scale notes: global top-k = partial top-k per partition then merge
(Spark's ``orderBy().limit(k)`` already executes as TakeOrderedAndProject
— no global sort materialized). Per-group top-k uses a window ranked
within each group: one shuffle on the group key, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k. Always pass a deterministic tiebreak column last."""
    return df.orderBy(*order).limit(k)


def topk_per_group(df: DataFrame, group_cols: list[str], k: int,
                   *order: Column, rank_col: str = "rk") -> DataFrame:
    """Top-k rows within each group via row_number window."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn(rank_col, F.row_number().over(w))
              .where(F.col(rank_col) <= k))
