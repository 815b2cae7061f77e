"""Cross-engine tie-exact rounding for the oracle contract.

The hazard (observed, not theoretical — q2_min_cost_supplier at
sf0.001): a per-row value that is an EXACT short-decimal rational can
land precisely on a rounding tie point (…xxxxx5), where the engines'
``round()`` implementations disagree — Spark HALF_UPs the double's
exact decimal expansion while DuckDB rounds the scaled double, and the
scale multiply can cross the boundary the expansion sits under. The
failing value 26.24125 (= a 2-decimal price over an integer quantity)
rounded to 26.2412 in Spark and 26.2413 in DuckDB from the SAME input
double.

Which values can tie: only EXACT decimal rationals one digit longer
than the rounding precision — integer ratios whose denominator is
2^a·5^b (token counts, text lengths, shingle-union sizes), quotients
of 2-decimal money by small integers, and their linear combinations.
Aggregation-error-carrying sums sit many ulps off any tie (measured:
q1's tie-point sums land 12 ulps below, identically in both engines),
and sqrt/log-based values (cosines, norms, TF-IDF) are irrational —
neither class can tie, so plain round() stays correct there.

The fix: ``floor(x·10^p + 0.5) / 10^p`` — the SAME IEEE-754 op
sequence in both engines, so whatever side of the boundary the scaled
double lands on, both engines land there together. Half-up for
positive x; callers here only round nonnegative ratios/quotients.

Every per-row integer-ratio round in the registry goes through these
two helpers (Spark column / oracle SQL string) so the formulas cannot
drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tie_round(col: Column, p: int) -> Column:
    """floor(col * 10^p + 0.5) / 10^p as a Spark column (nonneg col)."""
    s = F.lit(float(10 ** p))
    return F.floor(col * s + F.lit(0.5)) / s


def tie_round_sql(expr: str, p: int) -> str:
    """The identical formula as DuckDB SQL (wrap expr in parens)."""
    s = 10 ** p
    return f"floor(({expr}) * {s} + 0.5) / {s}"


# -------------------------------------------------- integer-exact sums --
#
# tie_round fixes METHOD divergence but not ORDER divergence: a SUM of
# exact decimals (money in cents) can land exactly on a tie point, and
# each engine's float accumulation lands a few ulps to EITHER side
# depending on partitioning (measured: sum(l_extendedprice) for q1's
# N/O group at sf0.01 is exactly ...182.45 — a round-1 tie — and Spark
# produces ...45000017 / ...45 / ...45000005 at 1/32/113 partitions
# while DuckDB produces ...45000017; whichever side each lands on
# decides the rounded digit). The only order-independent fix is to sum
# INTEGERS: per-row exact units (cents, ten-thousandths) sum exactly in
# int64/HUGEINT in any order, and the final HALF_UP division is integer
# arithmetic. Valid while 2·P·10^p < 2^63 on the Spark side (~1e17 in
# charge units at TPC-H sf1 — switch the arithmetic to decimal(38,0)
# beyond that); DuckDB sums to HUGEINT and has no such bound.


def exact_units(col: Column, decimals: int) -> Column:
    """Exact int64 count of 10^-decimals units of a decimals-exact
    double (e.g. cents of a 2-decimal price). The *10^d product of a
    d-decimal double sits within 1e-9 of its integer, never near the
    .5 boundary, so floor(+0.5) recovers it exactly in both engines."""
    return F.floor(col * F.lit(float(10 ** decimals)) + F.lit(0.5)) \
        .cast("long")


def exact_units_sql(expr: str, decimals: int) -> str:
    return f"CAST(floor(({expr}) * {10 ** decimals} + 0.5) AS BIGINT)"


def int_ratio_round(p_num: Column, q_den: Column, p: int) -> Column:
    """HALF_UP(p_num / q_den, p) via exact integer arithmetic:
    floor((2·P·10^p + Q) / (2Q)) / 10^p, the floor realized as
    n - n % d (exact in int64; Spark has no integer-division Column
    op). Requires P >= 0, Q > 0 integer Columns/literals.

    Overflow is GUARDED, not assumed (ADVICE r4): Spark's non-ANSI
    sum(long) wraps silently, and 2·P·10^p must stay under 2^63 while
    the DuckDB oracle sums in HUGEINT — a wrap would surface as an
    opaque value-hash mismatch. P beyond the bound (2^61/10^p, a 2×
    safety margin; ≈ TPC-H sf2 for q1's charge units at p=1) raises
    loudly with the decimal(38,0) remedy. The guard runs on
    post-aggregation rows (a handful per group), not the hot path."""
    bound = 2 ** 61 // 10 ** p
    guarded = F.when(p_num <= F.lit(bound), p_num).otherwise(
        F.raise_error(F.lit(
            f"int_ratio_round overflow: numerator sum exceeds the int64 "
            f"headroom 2*P*10^{p} < 2^63; rerun the aggregation summing "
            f"in decimal(38,0) instead of long")))
    # Q gets the same discipline (ADVICE r5): num = 2·10^p·P + Q and the
    # final 2·Q·10^p divisor both wrap for Q near 2^62 even when P is
    # small — and a sum that wrapped UPSTREAM arrives here looking
    # small. Callers pass count-scale denominators today; the guard
    # makes that contract loud instead of latent.
    guarded_q = F.when(
        (q_den > F.lit(0)) & (q_den <= F.lit(bound)), q_den).otherwise(
        F.raise_error(F.lit(
            f"int_ratio_round overflow: denominator outside "
            f"(0, 2^61/10^{p}]; a wrapped or oversized Q would corrupt "
            f"the integer HALF_UP silently — sum in decimal(38,0)")))
    num = guarded * F.lit(2 * 10 ** p) + guarded_q
    den = guarded_q * F.lit(2)
    quo = num - (num % den)
    return quo / (den * F.lit(10 ** p))


def int_ratio_round_sql(p_expr: str, q_expr: str, p: int) -> str:
    # ANSI CAST so the same string runs in DuckDB oracles AND raw
    # Spark SQL queries (q22 is written as spark.sql)
    num = f"(({p_expr}) * {2 * 10 ** p} + ({q_expr}))"
    den = f"(({q_expr}) * 2)"
    return (f"(CAST({num} - ({num} % {den}) AS DOUBLE)"
            f" / ({den} * {10 ** p}))")


def int_sum_round(units_sum: Column, unit_decimals: int, p: int) -> Column:
    """HALF_UP of an exact integer sum in 10^-unit_decimals units,
    rounded to p decimals (p <= unit_decimals)."""
    return int_ratio_round(units_sum, F.lit(10 ** unit_decimals), p)


def int_sum_round_sql(sum_expr: str, unit_decimals: int, p: int) -> str:
    return int_ratio_round_sql(sum_expr, str(10 ** unit_decimals), p)
