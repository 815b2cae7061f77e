"""Time-series bucketing + range filtering (SURVEY §2.6 Q1-Q5).

The reference's entire query surface is built around the Grafana query
(/root/reference/README.md:279-285): bucket a time column, count, filter
a range, group, order. ``$timeSeries`` canonically expands to
``intDiv(toUInt32(t), $interval) * $interval`` — an arbitrary-N-second
tumbling bucket, which Spark's ``window()`` generalizes.

Scale notes: bucketing is a pure projection (codegen'd, no shuffle);
the groupBy shuffles on the bucket key — partial aggregation map-side
means shuffle volume is O(buckets), not O(rows). The range filter must
reach the scan: on a mergetree-like table (plans/storage.py) the date
predicate prunes partitions and the sorted timestamp prunes row groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(col: Column | str, interval_s: int = 3600) -> Column:
    """↔ $timeSeries: floor the timestamp to an N-second tumbling bucket.

    Kept as TIMESTAMP (timestamp_seconds) so downstream date functions
    and Grafana both consume it directly.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(col.cast("timestamp")) / interval_s)
        * interval_s
    )


def time_filter(df: DataFrame, col: str, time_from: str, time_to: str) -> DataFrame:
    """↔ $timeFilter: inclusive time-range predicate (README.md:283)."""
    return df.where(F.col(col).between(F.lit(time_from).cast("timestamp"),
                                       F.lit(time_to).cast("timestamp")))


def timeseries_count(df: DataFrame, time_col: str, interval_s: int = 3600,
                     group_cols: tuple[str, ...] = (),
                     aggs: tuple[Column, ...] = ()) -> DataFrame:
    """The Grafana query as an operator: bucket → group → count → order.

    ``group_cols`` adds series dimensions (one line per value); ``aggs``
    adds measures beyond count(*).
    """
    bucket = time_bucket(time_col, interval_s).alias("t")
    keys = [bucket, *[F.col(c) for c in group_cols]]
    out = (df.groupBy(*keys)
             .agg(F.count("*").alias("cnt"), *aggs)
             .orderBy("t", *group_cols))
    return out


def fill_time_gaps(df: DataFrame, time_col: str = "t",
                   interval_s: int = 3600,
                   zero_cols: tuple[str, ...] = ("cnt",)) -> DataFrame:
    """ClickHouse ``ORDER BY t WITH FILL STEP s`` analog: densify a
    bucketed series so empty buckets appear as explicit zero rows —
    what every dashboard needs before drawing a line (a missing bucket
    otherwise renders as interpolation, hiding the outage).

    Spine construction is collect-free: the min/max bounds are a 1-ROW
    DataFrame, sequence+explode expands it to one row per bucket, and
    the left join back is bucket-count sized on BOTH sides (the input
    is already aggregated) — at 100 TB this whole operator runs on
    O(buckets) rows regardless of raw data size, after the groupBy
    that produced ``df`` did the heavy lifting map-side.
    """
    bounds = df.agg(F.unix_timestamp(F.min(time_col)).alias("__lo"),
                    F.unix_timestamp(F.max(time_col)).alias("__hi"))
    spine = (bounds.select(F.explode(F.sequence(
                "__lo", "__hi", F.lit(interval_s))).alias("__e"))
             .select(F.timestamp_seconds("__e").alias(time_col)))
    out = spine.join(df, time_col, "left")
    for c in zero_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


def activity_vectors(df: DataFrame, key: str, time_col: str,
                     origin: str, n_buckets: int,
                     bucket_s: int = 86400) -> DataFrame:
    """(key, vec: array<long>) — each key's activity as a DENSE
    fixed-length count vector (bucket i = count in [origin + i·bucket_s,
    origin + (i+1)·bucket_s)), missing buckets zero-filled.

    The time-series-similarity-search primitive: once curves are dense
    aligned vectors, every embedding operator (cosine top-k, LSH, IVF)
    applies to behavior curves unchanged. One shuffle on (key, bucket) +
    one on key; the dense fill is a map lookup over a literal sequence —
    no join against a calendar table.
    """
    bucket = F.floor((F.col(time_col).cast("timestamp").cast("double")
                      - F.lit(origin).cast("timestamp").cast("double"))
                     / bucket_s).cast("int")
    per_bucket = (df.select(F.col(key), bucket.alias("__b"))
                    .where((F.col("__b") >= 0) & (F.col("__b") < n_buckets))
                    .groupBy(key, "__b").agg(F.count("*").alias("__c")))
    m = F.map_from_entries(F.collect_list(F.struct("__b", "__c")))
    return (per_bucket.groupBy(key)
            .agg(m.alias("__m"))
            .select(F.col(key),
                    F.transform(F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                                lambda i: F.coalesce(F.element_at(F.col("__m"), i),
                                                     F.lit(0)))
                    .alias("vec")))
