"""Grafana macro expansion ↔ the vertamedia ClickHouse datasource plugin.

The reference's one published query (/root/reference/README.md:279-285):

    SELECT $timeSeries as t, count(*) as Count
    FROM $table WHERE $timeFilter GROUP BY t ORDER BY t

``$timeSeries`` / ``$timeFilter`` / ``$table`` are plugin macros
(README.md:275). Expansion is pre-parse string templating — it never
touches the planner (SURVEY §3.3), so Catalyst sees plain SQL and all
pushdown/pruning applies to the expanded predicate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from rsyslog_nginx_clickhouse_spark.functions.clickhouse import (
    AGGREGATE_REWRITES,
    IF_COMBINATORS,
    register_clickhouse_functions,
)


def expand_macros(sql: str, table: str, time_col: str = "logdatetime",
                  interval_s: int = 3600,
                  time_from: str | None = None,
                  time_to: str | None = None) -> str:
    """Expand $timeSeries/$timeFilter/$table/$interval into Spark SQL.

    ``$timeSeries`` → canonical vertamedia expansion
    ``intDiv(toUInt32(t), $interval) * $interval`` re-expressed as a
    timestamp bucket (timestamp_seconds keeps the result a TIMESTAMP so
    downstream date functions still work).
    """
    ts_expr = (
        f"timestamp_seconds(floor(unix_timestamp({time_col}) / {interval_s})"
        f" * {interval_s})"
    )
    bounds = []
    if time_from:
        bounds.append(f"{time_col} >= timestamp'{time_from}'")
    if time_to:
        bounds.append(f"{time_col} <= timestamp'{time_to}'")
    # one-sided ranges are honored — silently expanding a lone
    # time_from to 1=1 would full-scan and return pre-range rows
    filt = " AND ".join(bounds) if bounds else "1=1"
    out = (sql
           .replace("$timeSeries", ts_expr)
           .replace("$timeFilter", filt)
           .replace("$table", table)
           .replace("$interval", str(interval_s)))
    return rewrite_aggregates(out)


#: SQL string literal, honoring BOTH escape conventions ('' and \')
_STR_LIT = re.compile(r"'(?:[^'\\]|\\.|'')*'")


def rewrite_aggregates(out: str) -> str:
    """ClickHouse aggregate names → Spark builtins, including the
    parametric syntax ``agg(p)(x)`` (no Spark equivalent) collapsed to
    ``agg(x, p)`` for the quantile family, and the If-combinators.

    String literals are MASKED before any rewrite and restored after:
    a query whose string DATA mentions ``sumIf``/``uniq``/... must come
    back byte-identical (rewriting inside literals silently corrupts
    values), and masking also makes the paren/comma scanning immune to
    quote-escape conventions.
    """
    lits: list[str] = []

    def _mask(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    out = _STR_LIT.sub(_mask, out)
    out = re.sub(r"\buniqExact\s*\(", "count(DISTINCT ", out)
    for ch_name, spark_name in AGGREGATE_REWRITES.items():
        out = re.sub(rf"\b{ch_name}\s*\(", f"{spark_name}(", out)
    # value arg may itself contain one level of calls, e.g.
    # quantile(0.9)(toUInt32(t))
    nested = r"(?:[^()]|\([^()]*\))*"
    out = re.sub(
        rf"\b(percentile_approx|percentile)\(([^()]*)\)\(({nested})\)",
        r"\1(\3, \2)", out)
    out = _rewrite_if_combinators(out)
    return re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], out)


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren-depth 0 (literals are already masked)."""
    parts, cur, depth = [], [], 0
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _rewrite_if_combinators(out: str) -> str:
    """``aggIf(value, cond)`` → ``agg(if(cond, value, NULL))``.

    Argument-aware (a token rename cannot reorder args): scans to the
    matching close paren, splits the two args at the top level, and
    rebuilds. Runs on literal-MASKED text (see rewrite_aggregates), so
    quotes need no handling here. A call without exactly two top-level
    args is left untouched. After a rewrite the scan resumes INSIDE
    the replacement, so a same-name combinator nested in the rewritten
    args (scalar subqueries) is rewritten too.
    """
    for name, agg in IF_COMBINATORS.items():
        pos = 0
        while True:
            m = re.compile(rf"\b{name}\s*\(").search(out, pos)
            if not m:
                break
            depth, i = 1, m.end()
            while i < len(out) and depth:
                ch = out[i]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                i += 1
            args = _split_top_level(out[m.end():i - 1])
            if depth or len(args) != 2:
                pos = m.end()  # malformed/other arity: skip past it
                continue
            val, cond = args[0].strip(), args[1].strip()
            out = out[:m.start()] + f"{agg}(if({cond}, {val}, NULL))" \
                + out[i:]
            pos = m.start() + len(f"{agg}(if(")
    return out


def sql(spark: SparkSession, query: str, **macro_kwargs) -> DataFrame:
    """engine.sql(): expand macros, ensure compat fns, run spark.sql."""
    register_clickhouse_functions(spark)
    if "$" in query and "table" in macro_kwargs:
        query = expand_macros(query, **macro_kwargs)
    else:
        query = rewrite_aggregates(query)
    return spark.sql(query)
