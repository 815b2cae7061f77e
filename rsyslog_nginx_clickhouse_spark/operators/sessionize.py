"""Gap-based sessionization over an event stream.

The batch formulation of what ClickHouse dashboards do with
"visits/sessions" panels: a new session starts when the gap to the
previous event of the same key exceeds ``gap_s``.

lag → gap flag → running sum = session index. One shuffle on the key;
window is rows-ordered within each key partition. The streaming twin is
``F.session_window`` (streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, key: str, time_col: str,
               gap_s: int = 1800, session_col: str = "session_id") -> DataFrame:
    """Assign a per-key session index (0-based) to every event."""
    w = Window.partitionBy(key).orderBy(time_col)
    gap = F.unix_timestamp(F.col(time_col)) - F.unix_timestamp(
        F.lag(time_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    return (df.withColumn("__new", is_new)
              .withColumn(session_col,
                          F.sum("__new").over(
                              w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
              .drop("__new"))


def session_stats(df: DataFrame, key: str, time_col: str,
                  gap_s: int = 1800) -> DataFrame:
    """Per-session aggregates: start/end/duration/event count."""
    s = sessionize(df, key, time_col, gap_s)
    return (s.groupBy(key, "session_id")
             .agg(F.min(time_col).alias("session_start"),
                  F.max(time_col).alias("session_end"),
                  F.count("*").alias("n_events"),
                  (F.unix_timestamp(F.max(time_col))
                   - F.unix_timestamp(F.min(time_col))).alias("duration_s")))
