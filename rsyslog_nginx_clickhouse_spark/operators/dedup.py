"""Deduplication operators over the documents table.

Four tiers, each a different cost/recall point, all designed so the
100 TB path has no cross product:

- exact        — md5 fingerprint groupBy: one shuffle on the hash,
                 perfectly balanced (hash keys don't skew).
- ngram-jaccard— shingle-set self-join on shared shingles; exact
                 Jaccard verify. Quadratic only within a shingle
                 bucket, never globally.
- MinHash+LSH  — expression-level signatures (NO shuffle to build),
                 band-bucket join for candidates (shuffle on band key,
                 O(docs·bands) rows), exact-Jaccard verify on the
                 candidate set only. The scale path.
- SimHash      — see operators/simhash.py (Arrow-vectorized).
- embedding    — cosine near-dup, see operators/similarity.py.

Determinism contract: every hash is md5 over an explicit string, min
over lowercase-hex strings — the DuckDB oracle reproduces values
exactly (SURVEY §5 correctness gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.functions.text import (
    fingerprint,
    word_shingles,
)

#: 32 hashes in 8 bands of 4: P(candidate | J) = 1-(1-J^4)^8 — ≈0.97 at
#: J=0.8, ≈0.67 at J=0.6, ≈0.40 at J=0.5. Tuned for the near-dup regime.
NUM_HASHES = 32
NUM_BANDS = 8
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per distinct normalized text.

    Returns (fingerprint, keep_id = min id, n_copies). Downstream keeps
    ``keep_id`` rows; at 100 TB this is a single hash-partitioned
    aggregation with map-side partial min/count.
    """
    return (docs
            .select(fingerprint(text_col).alias("fingerprint"),
                    F.col(id_col))
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies")))


def spread(df: DataFrame, key: str) -> DataFrame:
    """Ensure enough partitions for CPU-bound per-row work.

    A small parquet file arrives as ONE partition, serializing all
    expression work onto one core; hash-repartitioning to the session
    parallelism is a cheap shuffle that unlocks every core. At scale
    the input is already wide and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df


def doc_shingles(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingles: array<string> distinct) — shared by all near-dup ops."""
    return spread(docs, id_col).select(
        F.col(id_col),
        F.array_distinct(word_shingles(text_col, n)).alias("shingles"),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element string arrays."""
    inter = F.size(F.array_intersect(a, b))
    uni = F.size(F.array_union(a, b))
    return inter / F.greatest(uni, F.lit(1))


def minhash_signature(shingles: Column, num_hashes: int = NUM_HASHES) -> Column:
    """MinHash signature as array<string> of md5-min per hash function.

    hash_i(s) = md5(i || ':' || s); signature[i] = min over shingles.
    Pure expression — computed during the scan, no shuffle, no UDF.
    """
    return F.array(*[
        F.array_min(F.transform(
            shingles, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s))))
        for i in range(num_hashes)
    ])


def minhash_bands(sig: Column, num_bands: int = NUM_BANDS,
                  rows_per_band: int = ROWS_PER_BAND) -> Column:
    """LSH band keys: md5 of each band's signature slice.

    array<struct<band:int, key:string>> — explode + groupBy(band, key)
    buckets candidate docs.
    """
    return F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.array_join(
                F.slice(sig, b * rows_per_band + 1, rows_per_band), "|"))
            .alias("key"),
        )
        for b in range(num_bands)
    ])


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs via MinHash LSH + exact-Jaccard verification.

    Returns (id_a < id_b, jaccard) for candidate pairs whose exact
    Jaccard ≥ threshold. Shuffles: one on band key (candidate gen), one
    to re-join shingle arrays (broadcast-able when docs dim is small;
    at 100 TB both sides hash-partition on id). False positives from
    banding are removed by the verify step; false negatives bounded by
    the (16 hashes, 4 bands) S-curve.
    """
    sh = doc_shingles(docs, id_col, text_col, n).cache()
    sh.count()  # materialize once; 3 consumers below share the cache
    sig = sh.select(F.col(id_col),
                    minhash_bands(minhash_signature(F.col("shingles")))
                    .alias("bands"))
    banded = sig.select(id_col, F.explode("bands").alias("b")) \
                .select(id_col, F.col("b.band").alias("band"),
                        F.col("b.key").alias("key")) \
                .cache()  # self-joined: avoid recomputing 32 md5-mins/doc twice
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, ["band", "key"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .distinct())
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (cand.join(sh_a, "id_a").join(sh_b, "id_b")
                    .select("id_a", "id_b",
                            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
                             .alias("jaccard"))
                    .where(F.col("jaccard") >= threshold))
    return verified


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact near-dup pairs: self-join on shared shingles, Jaccard verify.

    Ground truth for the LSH variant (recall oracle). Formulated as
    count-aggregation, not array ops: |A∩B| = count of shared-shingle
    join rows per pair, |A∪B| = |A|+|B|−|A∩B| — one shuffle on the
    shingle value + one on the pair, never materializing per-pair
    arrays (≈4× faster than array_intersect verification at sf0.1).
    Candidate cost is O(sum of per-shingle bucket²) — bounded shingle
    frequency keeps it sane; the LSH path exists for 100 TB.
    """
    sh = doc_shingles(docs, id_col, text_col, n).cache()
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("sz"))
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (a.join(b, "s")
              .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
              .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                       F.col(f"b.{id_col}").alias("id_b"))
              .agg(F.count("*").alias("n_inter")))
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
    return (inter.join(F.broadcast(sz_a), "id_a")
                 .join(F.broadcast(sz_b), "id_b")
                 .select("id_a", "id_b",
                         F.round(F.col("n_inter")
                                 / F.greatest(union_sz, F.lit(1)), 6)
                          .alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))
