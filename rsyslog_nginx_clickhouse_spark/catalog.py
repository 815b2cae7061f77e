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


#: Timestamp columns whose on-disk representation varies by driver
#: version: observed as TIMESTAMP_NTZ (timestamp[us], no tz) and as
#: TIMESTAMP(NANOS) (unreadable natively; legacy conf reads it as long
#: ns). Either way the engine surface is a session-UTC TimestampType —
#: the session tz is pinned UTC (session.py), so wall-clock values
#: match DuckDB's naive read of the same file exactly.
_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def iso_epoch_us(ts: str) -> int:
    """ISO timestamp string → UTC epoch MICROSECONDS; naive input means
    session time = UTC (session.py pins it), explicit offsets honored.
    The single source of the repo's naive-timestamp contract — the
    macro layer's epoch-seconds twin delegates here.
    """
    import datetime as _dt

    d = _dt.datetime.fromisoformat(ts)
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    d = d.astimezone(_dt.timezone.utc)
    return int(d.timestamp()) * 1_000_000 + d.microsecond



def normalize_ts(df: DataFrame, name: str) -> DataFrame:
    """Cast the table's known time columns to session-UTC TimestampType.

    NTZ → ``cast("timestamp")`` reinterprets the wall-clock in the
    (UTC-pinned) session zone; long ns → truncate to µs then
    ``timestamp_micros`` — both yield the instant DuckDB reads.
    """
    for col in _TS_COLS.get(name, ()):
        field = df.schema[col] if col in df.columns else None
        if field is None:
            continue
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def scratch_dir(kind: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf) scratch directory, CLEARED on
    every call — for queries that materialize intermediate state
    (rollup parts, staged writes). A fresh ``tempfile.mkdtemp`` per
    invocation leaks one directory per bench iteration / selfcheck /
    plancheck run (ADVICE r6); a fixed path is overwritten instead.
    Lives beside the other written artifacts (spark-warehouse,
    gitignored); override the base with SPARK_GRAFT_SCRATCH_DIR when
    the checkout is read-only."""
    import shutil

    base = os.environ.get(
        "SPARK_GRAFT_SCRATCH_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "spark-warehouse", "scratch"))
    path = os.path.join(base, kind,
                        os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet scan → pushdown + pruning free."""
    if name in _TS_COLS:
        # harmless for µs files; required to even read ns files
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_ts(df, name)


def load_time_range(spark: SparkSession, sf_dir: str, name: str, col: str,
                    t_from: str, t_to: str) -> DataFrame:
    """Time-range scan whose predicate actually reaches the parquet scan.

    A filter on the post-cast column is ``cast(ts) BETWEEN a AND b`` —
    an expression Catalyst cannot push, so the scan reads every row
    group (fatal at 100 TB, where the sorted raw column's row-group
    stats are the sparse index). This helper pushes the inclusive
    [t_from, t_to] bounds onto the RAW column in its native type —
    TIMESTAMP_NTZ literals on an NTZ column, int64-ns bounds on a
    legacy nanos column (ns div 1000 ∈ [us_a, us_b] ⟺ ns ∈
    [us_a·1000, us_b·1000+999]) — and normalizes AFTER the filter, so
    the range lands in PushedFilters. For other tables it degrades to a
    plain (already-pushable) between.
    """
    if col not in _TS_COLS.get(name, ()):
        return load(spark, sf_dir, name).where(F.col(col).between(
            F.lit(t_from).cast("timestamp"), F.lit(t_to).cast("timestamp")))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dt = raw.schema[col].dataType

    if isinstance(dt, T.LongType):  # legacy nanos-as-long file
        lo = F.lit(iso_epoch_us(t_from) * 1000)
        hi = F.lit(iso_epoch_us(t_to) * 1000 + 999)
    elif isinstance(dt, T.TimestampNTZType):
        # NTZ bounds filter the raw column directly (pushable); the
        # naive wall-clock comparison equals the session-UTC one
        lo = F.lit(t_from).cast("timestamp_ntz")
        hi = F.lit(t_to).cast("timestamp_ntz")
    else:
        lo = F.lit(t_from).cast("timestamp")
        hi = F.lit(t_to).cast("timestamp")
    return normalize_ts(raw.where(F.col(col).between(lo, hi)), name)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)
