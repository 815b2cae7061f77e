"""SimHash near-dup fingerprinting (Arrow-vectorized Pandas UDF).

64-bit SimHash over whitespace tokens: each token hashes to 64 bits
(md5 → first 8 bytes, deterministic across platforms); per bit, sum +1
for set / -1 for unset across tokens; fingerprint bit = sign. Near-dup
pairs = fingerprints within a Hamming-distance budget.

This operator is the designated "Python is genuinely warranted" case:
64 per-bit tallies as Catalyst expressions would bloat codegen, while
the Pandas UDF does the whole batch in numpy bit-ops via Arrow transfer
(no per-row Python). Candidate generation at scale uses the standard
Hamming-LSH trick — split the 64-bit fingerprint into (hamming_budget+1)
chunks; a pair within budget must match exactly on ≥1 chunk — an
equi-join on chunk value, no cross product.

Determinism: md5-based, so results are stable across runs/partitions;
not DuckDB-SQL-expressible at reasonable cost → rows-only oracle
(documented in queries/llm.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rsyslog_nginx_clickhouse_spark.plans.barrier import barrier

from rsyslog_nginx_clickhouse_spark.functions.text import normalized_text

HAMMING_BUDGET = 3
NUM_CHUNKS = HAMMING_BUDGET + 1  # pigeonhole: ≤3 flipped bits → ≥1 equal chunk


def _simhash64(text: str) -> int:
    tokens = text.split()
    if not tokens:
        return 0
    tally = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for tok in tokens:
        h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big"))
        bits = ((h >> shifts) & one).astype(np.int64)
        tally += 2 * bits - 1
    fp = 0
    for j in range(64):
        if tally[j] > 0:
            fp |= 1 << j
    return fp - (1 << 64) if fp >= (1 << 63) else fp  # two's-complement → long


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(_simhash64)


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(id, simhash: long) — normalized text → 64-bit fingerprint."""
    from rsyslog_nginx_clickhouse_spark.operators.dedup import spread

    return spread(docs, id_col).select(
        F.col(id_col),
        simhash_udf(normalized_text(text_col)).alias("simhash"),
    )


def _chunk(col, lo_bit: int, width: int):
    """``width``-bit slice of the fingerprint starting at ``lo_bit``."""
    if width >= 64:
        return col  # max_hamming=0: one chunk = the whole fingerprint
    mask = (1 << width) - 1
    return F.shiftrightunsigned(col, lo_bit).bitwiseAND(F.lit(mask))


def simhash_pairs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_hamming: int = HAMMING_BUDGET) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming ≤ budget) via chunk LSH.

    Pigeonhole: splitting 64 bits into ``max_hamming + 1`` chunks, any
    pair within the Hamming budget matches exactly on ≥1 chunk (the
    chunk count is DERIVED from the budget — a fixed count would
    silently lose recall for larger budgets) → candidate join is an
    equi-join per chunk, union'd, then exact popcount verify.
    """
    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    # localCheckpoint, not cache: materializes before the self-join
    # races both sides into recomputation, AND the blocks GC-release
    # via ContextCleaner instead of pinning CacheManager for the
    # session (the leak the dedup operators re-engineered around)
    fp = simhash_fingerprints(docs, id_col, text_col).transform(barrier)
    chunks = fp.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("ci"),
                     _chunk(F.col("simhash"), offsets[i], widths[i])
                     .alias("cv"))
            for i in range(n_chunks)
        ])).alias("c"),
    ).select(id_col, "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, ["ci", "cv"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.simhash").alias("fp_a"),
                     F.col("b.simhash").alias("fp_b"))
             .distinct())
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (cand.select("id_a", "id_b", hamming.alias("hamming"))
                .where(F.col("hamming") <= max_hamming))
