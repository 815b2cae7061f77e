"""Replacing (latest-wins) tables ↔ ClickHouse ReplacingMergeTree —
the upsert tier of the MergeTree engine family (the reference's plain
MergeTree is append-only; real deployments add a Replacing table for
mutable dimensions: user profiles, document metadata, entity state).

Semantics split into Spark terms, mirroring plans/summing.py:

- writers APPEND full versioned rows — no read-modify-write, no
  random I/O, each epoch is one sequential parquet append (that is the
  whole reason ReplacingMergeTree exists at ClickHouse's scale);
- read-time merge = keep the highest-version row per key. One
  map-side-combinable aggregate: ``max(struct(version, payload...))``
  per key — struct ordering compares the version first, and the
  remaining fields make the winner DETERMINISTIC even when two rows
  carry the same version (ClickHouse keeps an arbitrary one; we keep
  the struct-greatest — a documented total order, not luck);
- compaction = out-of-band collapse to one row per key, after which
  reads scan O(keys) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_versions(df: DataFrame, path: str) -> None:
    """Append full versioned rows (key cols + version + payload)."""
    df.write.mode("append").parquet(path)


def read_latest(spark: SparkSession, path: str, keys: list[str],
                version_col: str, payload: list[str]) -> DataFrame:
    """Merge-on-read: the highest-(version, payload) row per key.

    A single aggregation — partial max(struct) combines map-side, so
    the shuffle carries one candidate row per (partition, key), never
    the full version history.
    """
    st = F.max(F.struct(version_col, *payload)).alias("__w")
    df = spark.read.parquet(path).groupBy(*keys).agg(st)
    cols = [F.col(k) for k in keys]
    cols.append(F.col(f"__w.{version_col}").alias(version_col))
    cols.extend(F.col(f"__w.{c}").alias(c) for c in payload)
    return df.select(*cols)


def compact_replacing(spark: SparkSession, path: str, keys: list[str],
                      version_col: str, payload: list[str]) -> None:
    """↔ ReplacingMergeTree background merge: drop superseded versions.

    Temp-sibling write + directory swap (never overwrite the path a
    lazy plan may still read — see plans/summing.compact_summed, incl.
    its LOCAL-FILESYSTEM ONLY caveat: shutil doesn't speak HDFS/S3 and
    the swap is not atomic for concurrent readers).
    """
    import shutil

    tmp = path.rstrip("/") + ".compact-tmp"
    read_latest(spark, path, keys, version_col, payload) \
        .write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact-old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
