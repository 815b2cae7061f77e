"""The shared discounted-revenue formula, in exact integer units.

ONE public home (ADVICE r4: tpch_plus/reference previously imported
underscore-private helpers from queries.adhoc) for the expression every
revenue query shares: ``l_extendedprice * (1 - l_discount)`` summed as
exact integer TEN-THOUSANDTHS (price cents × (100 - discount cents)),
then integer-HALF_UP'd to 1 decimal. Why integers: float revenue sums
land a few ulps to either side of rounding ties DEPENDING ON
PARTITIONING — see functions/rounding.py.

Four forms, two per engine surface:
- ``rev_units()`` / ``REV_UNITS_SQL`` — the per-row exact integer units
  (sum these; group sums stay order-independent int64/HUGEINT).
- ``rev_round1()`` / ``REV_ROUND1_SQL`` — sum + HALF_UP to 1 decimal,
  the aggregate every revenue query outputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.functions.rounding import (
    exact_units,
    exact_units_sql,
    int_sum_round,
    int_sum_round_sql,
)

#: price cents / discount cents as ANSI SQL (valid in DuckDB oracles
#: and in raw Spark SQL queries alike)
PRICE_CENTS_SQL = exact_units_sql("l_extendedprice", 2)
DISCOUNT_CENTS_SQL = exact_units_sql("l_discount", 2)

#: discounted revenue in exact integer ten-thousandths
REV_UNITS_SQL = f"({PRICE_CENTS_SQL} * (100 - {DISCOUNT_CENTS_SQL}))"

#: sum of the above, integer-HALF_UP to 1 decimal
REV_ROUND1_SQL = int_sum_round_sql(f"sum({REV_UNITS_SQL})", 4, 1)


def rev_units() -> Column:
    """Per-row discounted revenue in exact integer ten-thousandths."""
    return (exact_units(F.col("l_extendedprice"), 2)
            * (100 - exact_units(F.col("l_discount"), 2)))


def rev_round1() -> Column:
    """sum(rev_units) HALF_UP'd to 1 decimal — the revenue aggregate."""
    return int_sum_round(F.sum(rev_units()), 4, 1)
