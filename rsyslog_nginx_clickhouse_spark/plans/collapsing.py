"""Collapsing (sign-cancellation) tables ↔ ClickHouse
CollapsingMergeTree — the third mutable tier of the MergeTree family
(plans/summing.py = SummingMergeTree, plans/replacing.py =
ReplacingMergeTree).

Protocol: state changes are written as append-only row PAIRS — the old
row with ``sign = -1`` and the new row with ``sign = +1`` (an insert is
a lone +1, a delete a lone -1). Rows with identical (key, payload)
cancel when their signs sum to zero; what remains is the current state.
This is how ClickHouse deployments maintain mutable aggregates without
updates — and exactly the shape of a Spark pipeline that only ever
appends parquet:

- write  = plain appends (sequential I/O, no read-modify-write);
- read   = one map-side-combined aggregate: group by (key, payload),
  keep groups with net sign > 0 — O(live rows) after partial agg;
- compaction = out-of-band collapse, after which reads scan only the
  surviving state rows.

Determinism contract: one output row per surviving (key, payload)
group regardless of how many redundant +1s were written (net > 0 ⇒
present) — stricter than ClickHouse, which leaves duplicate-insert
resolution to merge timing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_signed(df: DataFrame, path: str) -> None:
    """Append signed state rows (key cols + payload + sign ∈ {1, -1})."""
    df.write.mode("append").parquet(path)


def read_collapsed(spark: SparkSession, path: str, keys: list[str],
                   payload: list[str],
                   sign_col: str = "sign") -> DataFrame:
    """Current state: (key, payload) groups whose signs do not cancel."""
    return (spark.read.parquet(path)
            .groupBy(*keys, *payload)
            .agg(F.sum(sign_col).alias("__net"))
            .where(F.col("__net") > 0)
            .select(*keys, *payload))


def compact_collapsed(spark: SparkSession, path: str, keys: list[str],
                      payload: list[str], sign_col: str = "sign") -> None:
    """↔ CollapsingMergeTree background merge: drop cancelled pairs.

    Surviving rows are rewritten with ``sign = +1`` so later appends
    keep composing. Temp-sibling write + swap (see
    plans/summing.compact_summed, incl. its LOCAL-FILESYSTEM ONLY
    caveat: shutil doesn't speak HDFS/S3 and the swap is not atomic
    for concurrent readers).
    """
    import shutil

    tmp = path.rstrip("/") + ".compact-tmp"
    # the rewritten +1 keeps the table's ORIGINAL sign dtype: a bare
    # lit(1) is int32, and one compaction next to int64 appends would
    # leave the directory with mixed parquet physical types that a
    # single-footer schema inference then misreads
    sign_t = spark.read.parquet(path).schema[sign_col].dataType
    read_collapsed(spark, path, keys, payload, sign_col) \
        .withColumn(sign_col, F.lit(1).cast(sign_t)) \
        .write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact-old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
