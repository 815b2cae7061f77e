"""JSONEachRow source — ClickHouse's most common ingest format as a
batch/streaming-shared parse chain.

The reference pipeline ships nginx logs; its ClickHouse half ingests
``INSERT … FORMAT JSONEachRow`` (the wire format our sink
``sinks/clickhouse.py`` emits). This module closes the loop on the
READ side: one JSON object per line → typed columns, with the same
dead-letter discipline as the nginx parser (``sources/nginx_log.py``
R2): a corrupt line is never dropped silently and never poisons the
batch — it routes to a side channel.

Spark-first shape: ``from_json`` is a codegen expression (no UDF, no
Python); schema is explicit DDL (never inferred — inference is a
full extra scan and nondeterministic under drift); a malformed line
yields a NULL struct, which splits ok/dead with one filter each off a
shared scan. At 100 TB this is scan + narrow projection — the same
plan text files always get.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: struct column holding the parse; malformed-line detection rides
#: the PERMISSIVE-mode corrupt-record column (from_json fills absent
#: fields with NULL on well-formed objects AND returns an all-NULL
#: struct on malformed ones, so field-nullness alone cannot
#: distinguish "corrupt" from "sparse" — the corrupt column can).
_STRUCT = "_j"
_CORRUPT = "_corrupt"

#: explicit microsecond timestamp format on BOTH sides: Spark's
#: default to_json truncates timestamps to milliseconds (measured —
#: truncation, not rounding, so it cannot flip a day bucket, but it
#: silently loses 3 digits the parquet data carries). ClickHouse
#: JSONEachRow round-trips full precision; so do we.
_TS_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def parse_json_lines(lines: DataFrame, schema: str,
                     line_col: str = "value") -> DataFrame:
    """One JSON object per line → ``_raw`` + one column per schema
    field (NULL-filled where absent). ``schema`` is explicit DDL
    (``"a bigint, b string, ts timestamp"``)."""
    if _CORRUPT in schema:
        raise ValueError(f"schema may not declare {_CORRUPT!r} — it "
                         f"is the reserved corrupt-record channel")
    return (lines.select(
        F.col(line_col).alias("_raw"),
        F.from_json(
            F.col(line_col), f"{schema}, {_CORRUPT} string",
            {"columnNameOfCorruptRecord": _CORRUPT,
             **_TS_OPTS}).alias(_STRUCT)))


def typed_rows(parsed: DataFrame) -> DataFrame:
    """The well-formed rows, struct flattened away."""
    return (parsed.where(F.col(f"{_STRUCT}.{_CORRUPT}").isNull())
                  .select(f"{_STRUCT}.*").drop(_CORRUPT))


def dead_letters(parsed: DataFrame) -> DataFrame:
    """The malformed raw lines (debug tee ↔ the nginx parser's R2
    channel) — same shared scan, complementary filter."""
    return (parsed.where(F.col(f"{_STRUCT}.{_CORRUPT}").isNotNull())
                  .select("_raw"))


def render_json_lines(df: DataFrame) -> Column:
    """``to_json(struct(*))`` — one JSONEachRow line per row (the
    test/round-trip writer; the production writer is the ClickHouse
    sink's chunked POST of the same format)."""
    return F.to_json(F.struct(*[F.col(c) for c in df.columns]),
                     _TS_OPTS)
