"""Static key→value lookup tables with a no-match default.

↔ rsyslog ``lookup_table``/``lookup()`` (/root/reference/nginx.conf:1,55;
table /root/reference/nginx.table:1-15, ``"nomatch":"unk"``).

Two strategies, same semantics:

- ``lookup_map`` — inline literal map; becomes a Catalyst expression,
  zero shuffle, right for O(10-10k) entries (the reference's 12-row
  month table). This is effectively a broadcast: the literals ship
  inside the serialized plan to every executor.
- ``lookup_join`` — broadcast hash join against a dimension DataFrame
  with ``coalesce`` default; right when the table is big enough to be
  data (or needs to come from storage) but still fits in executor
  memory. At 100 TB fact scale the broadcast join keeps enrichment
  shuffle-free.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The reference month table, verbatim (nginx.table:2-14).
MONTHS: dict[str, str] = {
    "Jan": "01", "Feb": "02", "Mar": "03", "Apr": "04",
    "May": "05", "Jun": "06", "Jul": "07", "Aug": "08",
    "Sep": "09", "Oct": "10", "Nov": "11", "Dec": "12",
}


def lookup_map(table: Mapping[str, str], key: Column | str,
               default: str | None = "unk") -> Column:
    """``lookup(table, key)`` as a literal-map expression with default."""
    key = F.col(key) if isinstance(key, str) else key
    literals = [F.lit(x) for kv in table.items() for x in kv]
    mapped = F.create_map(*literals)[key]
    if default is None:
        return mapped
    return F.coalesce(mapped, F.lit(default))


def lookup_join(df: DataFrame, dim: DataFrame, key: str, value_col: str,
                out_col: str, default: str | None = "unk") -> DataFrame:
    """Broadcast left join against a dim table, no-match → ``default``.

    ``dim`` must have columns (key, value_col). Broadcast ⇒ no shuffle of
    the (huge) fact side — the 100 TB-safe enrichment pattern.
    """
    dim2 = dim.select(F.col(key), F.col(value_col).alias(out_col))
    joined = df.join(F.broadcast(dim2), on=key, how="left")
    if default is not None:
        joined = joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(default)))
    return joined
