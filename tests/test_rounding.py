"""Tie-exact rounding (functions/rounding.py): the cross-engine
contract that round() alone cannot give.

Two failure modes these helpers exist for, both observed live:
- METHOD divergence: round() on the identical input double disagreed
  between Spark and DuckDB at 26.24125 (q2, sf0.001).
- ORDER divergence: the float sum of q1's N/O group (exactly ...182.45,
  a round-1 tie) lands on different doubles at different partition
  counts, flipping the rounded digit.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.functions.rounding import (
    exact_units,
    exact_units_sql,
    int_ratio_round,
    int_ratio_round_sql,
    int_sum_round,
    int_sum_round_sql,
    tie_round,
    tie_round_sql,
)

#: values sitting EXACTLY on rounding tie points (p = precision at
#: which the (p+1)-th digit is 5): the cases where engine round()s
#: disagree. 26.24125 is the q2 incident value.
TIES = [
    (26.24125, 4),
    (0.0078125, 6),   # 1/128 — a 128-token doc with one hit
    (0.03125, 4),     # 1/32
    (0.0000005, 6),
    (12.5, 0),
    (0.15, 1),
    (1.005, 2),       # double sits BELOW the decimal tie (1.00499…):
                      # exact-decimal arithmetic would give 1.01, the
                      # IEEE path both engines actually run gives 1.0
]


def test_tie_round_matches_duckdb_on_ties(spark):
    con = duckdb.connect()
    for v, p in TIES:
        got = spark.range(1).select(
            tie_round(F.lit(v), p).alias("r")).collect()[0]["r"]
        # CAST AS DOUBLE: a bare repr(v) literal parses as DECIMAL in
        # DuckDB, which tests exact decimal arithmetic instead of the
        # IEEE-double path the helpers pin down (production oracles
        # read DOUBLE parquet columns; at 1.005/p=2 the decimal path
        # gives 1.01 while the double path gives 1.0)
        want = con.execute(
            "SELECT "
            + tie_round_sql(f"CAST({v!r} AS DOUBLE)", p)).fetchone()[0]
        assert got == want, (v, p, got, want)


@given(st.integers(0, 10**7), st.integers(1, 10**6),
       st.integers(0, 6))
@settings(max_examples=300, deadline=None)
def test_int_ratio_round_is_exact_half_up(num, den, p):
    """Pure-python replica of the integer formula vs Fraction HALF_UP."""
    # the formula under test, in plain ints (mirrors the Column expr)
    scaled = num * 2 * 10 ** p + den
    d2 = den * 2
    quo = (scaled - scaled % d2) // d2
    got = quo / 10 ** p
    # exact reference: HALF_UP of num/den at p decimals
    f = Fraction(num, den) * 10 ** p
    want = (f.numerator * 2 + f.denominator) // (2 * f.denominator)
    assert quo == want
    assert got == pytest.approx(want / 10 ** p, abs=0)


def test_int_ratio_round_spark_equals_duckdb(spark):
    con = duckdb.connect()
    cases = [(5248250, 200, 4),    # 26.24125 as cents/denominator
             (1, 128, 6), (1, 3, 6), (999995, 10, 1)]
    for num, den, p in cases:
        # cast: registry callers pass bigint SUM columns; a bare
        # F.lit(int) is 32-bit and would overflow the 2*10^p scale
        got = spark.range(1).select(
            int_ratio_round(F.lit(num).cast("long"),
                            F.lit(den).cast("long"), p).alias("r")
        ).collect()[0]["r"]
        want = con.execute(
            "SELECT " + int_ratio_round_sql(
                f"CAST({num} AS BIGINT)", f"CAST({den} AS BIGINT)", p)
        ).fetchone()[0]
        assert got == want, (num, den, p, got, want)


def test_exact_units_recovers_cents(spark):
    vals = [0.01, 123.45, 99999.99, 0.0, 7.1, 26.24, -42.35]
    rows = (spark.createDataFrame([(v,) for v in vals], "v double")
            .select(exact_units(F.col("v"), 2).alias("c")).collect())
    assert [r["c"] for r in rows] == [1, 12345, 9999999, 0, 710, 2624,
                                      -4235]
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            "SELECT "
            + exact_units_sql(f"CAST({v!r} AS DOUBLE)", 2)).fetchone()[0]
        got = (spark.createDataFrame([(v,)], "v double")
               .select(exact_units(F.col("v"), 2).alias("c"))
               .collect()[0]["c"])
        assert got == want, v


def test_money_sum_is_partition_invariant(spark, sf_dir):
    """The q1 failure mode: the same integer-unit sum must round
    identically no matter how the rows are partitioned."""
    from rsyslog_nginx_clickhouse_spark.catalog import load

    li = load(spark, sf_dir, "lineitem").select("l_extendedprice")
    outs = set()
    for parts in (1, 7, 32):
        out = (li.repartition(parts)
               .agg(int_sum_round(
                   F.sum(exact_units(F.col("l_extendedprice"), 2)),
                   2, 1).alias("s"))
               .collect()[0]["s"])
        outs.add(out)
    assert len(outs) == 1, outs


def test_int_sum_round_tie(spark):
    # exact cents sum ending in 5 → round-1 tie → HALF_UP goes up
    got = spark.range(1).select(
        int_sum_round(F.lit(28757518245), 2, 1).alias("r")
    ).collect()[0]["r"]
    assert got == 287575182.5
    con = duckdb.connect()
    want = con.execute(
        f"SELECT {int_sum_round_sql('28757518245', 2, 1)}").fetchone()[0]
    assert got == want


def test_int_ratio_round_overflow_guard_raises(spark):
    # ADVICE r4: past the int64 headroom the guard must fail loudly
    # (a silent non-ANSI wrap would show up as an opaque value-hash
    # mismatch against the HUGEINT-summing oracle)
    import pytest

    from rsyslog_nginx_clickhouse_spark.functions.rounding import (
        int_ratio_round,
    )

    big = spark.range(1).select(
        F.lit(2 ** 61).cast("long").alias("p"),
        F.lit(100).cast("long").alias("q"))
    with pytest.raises(Exception, match="int_ratio_round overflow"):
        big.select(int_ratio_round(F.col("p"), F.col("q"), 4)).collect()
    # just inside the bound still computes
    ok = spark.range(1).select(
        int_ratio_round(F.lit(12345).cast("long"),
                        F.lit(100).cast("long"), 4).alias("r")
    ).collect()[0]["r"]
    assert ok == 123.45


def test_int_ratio_round_denominator_guard_raises(spark):
    # ADVICE r5: Q near 2^62 wraps num = 2*10^p*P + Q and the final
    # 2*Q*10^p divisor even when P is small — and a sum that wrapped
    # UPSTREAM arrives looking small, so the guard must bound Q too
    import pytest

    from rsyslog_nginx_clickhouse_spark.functions.rounding import (
        int_ratio_round,
    )

    for bad_q in (2 ** 62, 0, -5):
        df = spark.range(1).select(
            F.lit(10).cast("long").alias("p"),
            F.lit(bad_q).cast("long").alias("q"))
        with pytest.raises(Exception, match="int_ratio_round overflow"):
            df.select(int_ratio_round(F.col("p"), F.col("q"),
                                      4)).collect()
