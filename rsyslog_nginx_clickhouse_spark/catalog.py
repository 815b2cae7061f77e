"""Testdata catalog: load the driver's parquet tables and register views.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Columns stored as TIMESTAMP(NANOS) parquet, which Spark can't read
#: natively: read as long (legacy conf) and truncate ns → µs, exactly
#: what DuckDB does when loading the same file into its µs timestamps.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _normalize_nanos(df: DataFrame, name: str) -> DataFrame:
    for col in _NANO_TS_COLS.get(name, ()):
        field = df.schema[col] if col in df.columns else None
        if field is not None and isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet scan → pushdown + pruning free."""
    if name in _NANO_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_nanos(df, name)


def load_time_range(spark: SparkSession, sf_dir: str, name: str, col: str,
                    t_from: str, t_to: str) -> DataFrame:
    """Time-range scan whose predicate actually reaches the parquet scan.

    A filter on the µs-converted column is ``timestamp_micros(ts div
    1000) BETWEEN a AND b`` — an expression Catalyst cannot push, so the
    scan reads every row group (fatal at 100 TB, where the sorted raw
    column's row-group stats are the sparse index). This helper
    translates the inclusive [t_from, t_to] bounds onto the RAW int64
    nanos column exactly (ns div 1000 ∈ [us_a, us_b] ⟺ ns ∈
    [us_a·1000, us_b·1000+999]) and filters BEFORE conversion, so the
    range lands in PushedFilters. For tables without the nanos quirk it
    degrades to a plain (already-pushable) between.
    """
    import datetime as _dt

    if col not in _NANO_TS_COLS.get(name, ()):
        return load(spark, sf_dir, name).where(F.col(col).between(
            F.lit(t_from).cast("timestamp"), F.lit(t_to).cast("timestamp")))

    def _us(s: str) -> int:
        d = _dt.datetime.fromisoformat(s)
        if d.tzinfo is None:
            d = d.replace(tzinfo=_dt.timezone.utc)  # naive = session UTC
        d = d.astimezone(_dt.timezone.utc)  # honor explicit offsets
        return int(d.timestamp()) * 1_000_000 + d.microsecond

    lo_ns = _us(t_from) * 1000
    hi_ns = _us(t_to) * 1000 + 999
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_nanos(
        raw.where(F.col(col).between(F.lit(lo_ns), F.lit(hi_ns))), name)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)
