"""CSVWithNames source — the other half of ClickHouse's top-two
client formats (JSONEachRow is `sources/jsoneachrow.py`).

Same contract as the JSON twin: one record per line, explicit DDL
schema (never inferred), ``from_csv`` as a codegen expression (no
UDF), and the nginx parser's dead-letter discipline — a malformed
line routes to a side channel off the SAME scan, never silently
dropped, never poisoning the batch.

DOCUMENTED deviation: CSV cannot distinguish an empty string from
NULL (both serialize to nothing between commas), so empty-string
fields round-trip as NULL — the standard CSV ambiguity, resolved the
way Spark and ClickHouse's own CSV reader resolve it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STRUCT = "_c"
_CORRUPT = "_corrupt"

#: microsecond timestamps, same rationale as the JSON twin (Spark's
#: default serialization truncates to milliseconds)
_TS_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def parse_csv_lines(lines: DataFrame, schema: str,
                    line_col: str = "value") -> DataFrame:
    """One CSV record per line → ``_raw`` + one column per schema
    field. ``schema`` is explicit DDL; the header line (the
    "WithNames" row) should be filtered by the caller — at 100 TB the
    header is file metadata, not row data."""
    if _CORRUPT in schema:
        raise ValueError(f"schema may not declare {_CORRUPT!r} — it "
                         f"is the reserved corrupt-record channel")
    return (lines.select(
        F.col(line_col).alias("_raw"),
        F.from_csv(
            F.col(line_col), f"{schema}, {_CORRUPT} string",
            {"columnNameOfCorruptRecord": _CORRUPT,
             "mode": "PERMISSIVE", **_TS_OPTS}).alias(_STRUCT)))


def typed_rows(parsed: DataFrame) -> DataFrame:
    """The well-formed rows, struct flattened away."""
    return (parsed.where(F.col(f"{_STRUCT}.{_CORRUPT}").isNull())
                  .select(f"{_STRUCT}.*").drop(_CORRUPT))


def dead_letters(parsed: DataFrame) -> DataFrame:
    """The malformed raw lines (debug tee, R2 discipline)."""
    return (parsed.where(F.col(f"{_STRUCT}.{_CORRUPT}").isNotNull())
                  .select("_raw"))


def render_csv_lines(df: DataFrame) -> Column:
    """``to_csv(struct(*))`` — one CSV record per row (test/round-trip
    writer)."""
    return F.to_csv(F.struct(*[F.col(c) for c in df.columns]),
                    _TS_OPTS)
