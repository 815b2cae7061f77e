"""AggregatingMergeTree-style rollup: persisted MERGEABLE sketch states.

ClickHouse's AggregatingMergeTree stores partial aggregate STATES
(``uniqState``/``quantileState``) per part and merges them at read or
background-merge time (``uniqMerge``) — the pattern that makes
pre-aggregated uniq-counting work at 100 TB: each ingest batch writes
O(keys · sketch) rows, never reprocessing history, and serving cost is
O(parts · keys · sketch) regardless of raw data size. The Summing
analog (plans/summing.py) covers additive states; this module covers
the non-additive sketch case with the engine's deterministic KMV
bottom-k sketch (queries/reference.approx_daily_users).

Why KMV merge is EXACT (and therefore value-oracle-able, unlike HLL's
engine-specific bias correction): any hash among the k smallest of the
UNION is necessarily among the k smallest of whichever part it came
from, so bottom-k(⋃ parts' bottom-k states) == bottom-k(all data) —
the merged estimate is bit-identical to the direct single-pass
estimate, which is what the registry oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def append_quantile_partial(df: DataFrame, path: str, key_cols: list[str],
                            val_col: str) -> None:
    """Append one part's quantileState analog: per key, this batch's
    EXACT (value, count) histogram — one partial-agg shuffle, part
    size O(keys · distinct values) however large the batch was.

    Exactness is what makes the state value-oracle-able (the
    quantileState/quantileMerge pattern ClickHouse dashboards run over
    this very table — reference README.md:32): histogram merge is sum
    of counts, so the merged state is the exact multiset of all data
    and any quantile read off it is bit-equal to the direct quantile.
    Valid while the value domain is bounded (events.value is 2-decimal
    with a ~50k-value range — the state is bounded regardless of row
    count); an unbounded-domain deployment would swap in a
    deterministic-compaction sketch and drop to a rows-only oracle.
    """
    (df.groupBy(*key_cols, val_col)
       .agg(F.count("*").alias("cnt"))
       .write.mode("append").parquet(path))


def read_quantile_merged(spark: SparkSession, path: str,
                         key_cols: list[str], val_col: str,
                         quantiles: dict[str, float]) -> DataFrame:
    """Serving read — the quantileMerge analog: sum the parts'
    histograms per (key, value), then evaluate each requested discrete
    quantile on the merged histogram: the smallest value whose
    cumulative count reaches rank ceil(q·n) (1-based lower discrete
    quantile — the oracle states the SAME explicit rank formula, so
    semantics cannot drift between engines). Input is
    O(parts · keys · values) rows, independent of the raw data the
    states summarize."""
    merged = (spark.read.parquet(path)
              .groupBy(*key_cols, val_col)
              .agg(F.sum("cnt").alias("cnt")))
    w_cum = (Window.partitionBy(*key_cols).orderBy(val_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_tot = Window.partitionBy(*key_cols)
    h = (merged.withColumn("cum", F.sum("cnt").over(w_cum))
               .withColumn("tot", F.sum("cnt").over(w_tot)))
    aggs = [F.min(F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("tot")),
                         F.col(val_col))).alias(name)
            for name, q in quantiles.items()]
    return h.groupBy(*key_cols).agg(*aggs)


def append_topk_partial(df: DataFrame, path: str, key_cols: list[str],
                        item_col: str, capacity: int) -> None:
    """Append one part's topKState analog: per key, this batch's EXACT
    (item, count) pairs truncated to the top-``capacity`` by
    (count DESC, item ASC) — the deterministic cousin of ClickHouse's
    Filtered Space-Saving ``topK`` state (``topKState``, default
    load_factor 3: capacity = 3·k counters per state). One partial-agg
    shuffle per batch; the written part is O(keys · capacity) rows
    however large the batch was.

    Determinism is the design choice: Space-Saving's counter evictions
    depend on arrival order (not reproducible across partitionings),
    while batch-exact-counts-then-truncate depends only on the data —
    so the whole pipeline is value-oracle-able in SQL. The standard
    Space-Saving guarantee carries over: an item can only miss the
    merged top-k if, in every part, it fell below that part's
    capacity-th count — overprovisioning capacity >> k makes that the
    heavy-hitter tail (tests bound it; with capacity >= distinct items
    per part, truncation never fires and merged == exact top-k).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.desc("cnt"), item_col)
    (df.groupBy(*key_cols, item_col)
       .agg(F.count("*").alias("cnt"))
       .withColumn("__rn", F.row_number().over(w))
       .where(F.col("__rn") <= capacity)
       .drop("__rn")
       .write.mode("append").parquet(path))


def read_topk_merged(spark: SparkSession, path: str, key_cols: list[str],
                     item_col: str, k: int) -> DataFrame:
    """Serving read — the topKMerge analog: sum the parts' surviving
    (item, count) pairs per (key, item), rank by (count DESC, item
    ASC), keep the top k with their merged counts and rank. Input is
    O(parts · keys · capacity) rows, independent of the raw data the
    states summarize."""
    merged = (spark.read.parquet(path)
              .groupBy(*key_cols, item_col)
              .agg(F.sum("cnt").alias("cnt")))
    w = Window.partitionBy(*key_cols).orderBy(F.desc("cnt"), item_col)
    return (merged.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def append_kmv_partial(df: DataFrame, path: str, key_cols: list[str],
                       hash_col: str, k: int) -> None:
    """Append one part's partial KMV states: per key, the SORTED
    bottom-k distinct-hash array (≤ k values — the uniqState analog).

    Scale shape: one distinct + one window per batch (both spill,
    nothing collects), and the written part is O(keys · k) however
    large the batch was.
    """
    w = Window.partitionBy(*key_cols).orderBy(hash_col)
    (df.select(*key_cols, hash_col).distinct()
       .withColumn("__rn", F.row_number().over(w))
       .where(F.col("__rn") <= k)
       .groupBy(*key_cols)
       .agg(F.sort_array(F.collect_list(hash_col)).alias("state"))
       .write.mode("append").parquet(path))


def read_kmv_merged(spark: SparkSession, path: str, key_cols: list[str],
                    k: int, out_col: str = "approx_users") -> DataFrame:
    """Serving read — the uniqMerge analog: union the parts' states,
    re-take the global bottom-k per key, and evaluate the KMV
    estimator [Bar-Yossef et al. 2002]: exact count below k, else
    (k−1)·2^32/h_(k). Input is O(parts · keys · k) rows, independent
    of the raw data the states summarize."""
    w = Window.partitionBy(*key_cols).orderBy("h")
    merged = (spark.read.parquet(path)
              .select(*key_cols, F.explode("state").alias("h"))
              .distinct()  # the same hash may survive in several parts
              .withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= k))
    est = (F.when(F.count("*") < k, F.count("*"))
           .otherwise(F.floor(F.lit(float((k - 1) * 2 ** 32))
                              / F.max("h"))))
    return (merged.groupBy(*key_cols)
            .agg(est.cast("bigint").alias(out_col)))


def _ord_struct(ord_cols: list[str], payload_cols: list[str]):
    """Struct whose lexicographic max IS the deterministic argmax:
    ordering columns first, then the payload they select. Including
    the payload in the comparison makes ties total (two rows equal on
    every ordering column still compare deterministically), so the
    state is independent of partitioning and arrival order."""
    return F.struct(*[F.col(c) for c in ord_cols],
                    *[F.col(c) for c in payload_cols])


def append_argmax_partial(df: DataFrame, path: str, key_cols: list[str],
                          ord_cols: list[str],
                          payload_cols: list[str]) -> None:
    """Append one part's argMaxState analog: per key, the single row
    maximal under (ord_cols, payload_cols) lexicographic order — the
    ClickHouse ``argMaxState(payload, ord)`` pattern that backs
    latest-value-per-key AggregatingMergeTree tables.

    One max-of-struct partial aggregate per batch (map-side combine:
    each task keeps one struct per key before the shuffle), and the
    written part is O(keys) rows however large the batch was.
    """
    flat = [F.col(f"__s.{c}").alias(c) for c in ord_cols + payload_cols]
    (df.groupBy(*key_cols)
       .agg(F.max(_ord_struct(ord_cols, payload_cols)).alias("__s"))
       .select(*key_cols, *flat)
       .write.mode("append").parquet(path))


def read_argmax_merged(spark: SparkSession, path: str, key_cols: list[str],
                       ord_cols: list[str],
                       payload_cols: list[str]) -> DataFrame:
    """Serving read — the argMaxMerge analog: the same max-of-struct
    over the parts' states. Merge is EXACT because max is associative:
    the global argmax row is the argmax of the parts' argmax rows, so
    the merged answer is bit-identical to a direct single-pass argMax
    over raw data (what the registry oracle checks). Input is
    O(parts · keys) rows, independent of the raw data the states
    summarize."""
    flat = [F.col(f"__s.{c}").alias(c) for c in ord_cols + payload_cols]
    return (spark.read.parquet(path)
            .groupBy(*key_cols)
            .agg(F.max(_ord_struct(ord_cols, payload_cols)).alias("__s"))
            .select(*key_cols, *flat))
