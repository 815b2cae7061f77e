"""File-level bloom skip index — the ClickHouse ``bloom_filter``
skip-index analog (reference ``clickhouse/nginx.click`` tables rely on
MergeTree ORDER BY for skipping; ClickHouse deployments add
``INDEX ... TYPE bloom_filter GRANULARITY n`` for point predicates on
NON-key columns — this module provides that for parquet).

The gap it fills: min/max stats (zorder.py) prune range predicates on
clustered columns, but a point lookup on a column the table is NOT
clustered by scans everything — every file's min/max spans the whole
domain. A per-file bloom over that column turns the lookup into: read
the tiny side index, keep files whose bloom could contain the probe
key, scan only those. The data scan cost becomes O(matching files +
false positives), independent of table size.

Representation: k=3 positions per key from seeded xxhash64 mod m; a
file's state is the SORTED DISTINCT position array (the sparse
encoding of the m-bit bitmap — exact same membership semantics; a
dense fixed m/8-byte bitmap is the drop-in upgrade once fill rate
makes sparse larger, and at 100 TB the index moves from per-file to
per-row-group granules, same structure). Membership is conjunctive
(ALL k positions present), so there are NO false negatives — the
residual predicate re-applied on the pruned scan makes false
positives harmless, which is exactly the ClickHouse skip-index
contract.

Everything is expression-level (xxhash64 / explode / collect_set are
JVM-side); the only driver-side materialization is the candidate file
list — O(files), the same driver-side listing any partition pruning
does.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from rsyslog_nginx_clickhouse_spark.localdf import local_rows

#: bloom parameters: m = bit-domain size, k = hashes per key.
#: At 6.25k keys/file (events sf0.1 over 16 files) fill is ~25% and
#: the per-file false-positive rate is ~(0.25)^3 ≈ 1.6%.
BLOOM_M = 1 << 16
BLOOM_K = 3


def bloom_positions(col: Column, m: int = BLOOM_M,
                    k: int = BLOOM_K) -> Column:
    """The k bloom positions of a key: pmod(xxhash64(seed_i, key), m)
    for i in 1..k — seeded by prepending a literal, the engine's
    standard trick for independent hash families (same idiom as the
    MinHash/hyperplane banks)."""
    return F.array(*[F.pmod(F.xxhash64(F.lit(i), col), F.lit(m))
                     for i in range(1, k + 1)])


def write_bloom_indexed(df: DataFrame, path: str, index_col: str,
                        cluster_col: str, files: int = 16,
                        m: int = BLOOM_M, k: int = BLOOM_K) -> None:
    """Write ``df`` as ``files`` parquet files clustered by
    ``cluster_col`` (the table's natural key — which is precisely why
    min/max stats CANNOT prune ``index_col``), plus the side index at
    ``path + "_idx"``: one row per file with the sorted distinct bloom
    positions of its ``index_col`` values.

    Index build is one explode + collect_set aggregate over a re-read
    of the written files (input_file_name() ties rows to files) —
    O(rows) work, O(files · min(keys_per_file·k, m)) index size, and
    the index write is a one-time cost amortized over every probe,
    like the IVF index and the bucketed tables.
    """
    df.repartition(files, cluster_col).write.mode("overwrite").parquet(path)
    (df.sparkSession.read.parquet(path)
       .select(F.input_file_name().alias("file"),
               F.explode(bloom_positions(F.col(index_col), m, k))
                .alias("p"))
       .groupBy("file")
       .agg(F.sort_array(F.collect_set("p")).alias("bits"))
       .write.mode("overwrite").parquet(path + "_idx"))


def bloom_candidate_files(spark: SparkSession, path: str,
                          probe_values: list, value_type: str = "bigint",
                          m: int = BLOOM_M, k: int = BLOOM_K) -> list[str]:
    """Files whose bloom could contain ANY probe value: for each value
    all k positions must be present (conjunctive — no false
    negatives). Probe positions come from a |values|-row Spark job
    (the hash must be the writer's own xxhash64, not a Python
    reimplementation) and the returned list is O(files) — both
    parameter-sized, never data.

    An empty probe list short-circuits to no candidates (ADVICE r7:
    ``reduce(or_, [])`` has no initializer and |values|-row
    createDataFrame rejects empty input — both crash opaquely)."""
    if not probe_values:
        return []
    pos_rows = (local_rows(spark, [(v,) for v in probe_values],
                           f"v {value_type}")
                .select(bloom_positions(F.col("v"), m, k).alias("ps"))
                .collect())
    idx = spark.read.parquet(path + "_idx")
    per_value = [functools.reduce(
        operator.and_,
        [F.array_contains("bits", int(p)) for p in row.ps])
        for row in pos_rows]
    cond = functools.reduce(operator.or_, per_value)
    return [r.file for r in idx.where(cond).select("file").collect()]


def read_bloom_pruned(spark: SparkSession, path: str, index_col: str,
                      probe_values: list, value_type: str = "bigint",
                      m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Point-lookup through the index: scan ONLY candidate files, then
    re-apply the exact predicate (bloom false positives filter out
    here — correctness never depends on the index)."""
    cands = bloom_candidate_files(spark, path, probe_values, value_type,
                                  m, k)
    base = spark.read.parquet(*cands) if cands \
        else spark.read.parquet(path).where(F.lit(False))
    if not probe_values:  # isin() rejects an empty value list
        return base
    return base.where(F.col(index_col).isin(probe_values))
