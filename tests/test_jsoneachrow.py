"""sources/jsoneachrow.py — typed parse, NULL-fill for absent fields,
dead-letter routing for corrupt lines, render round-trip."""
from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.sources.jsoneachrow import (
    dead_letters,
    parse_json_lines,
    render_json_lines,
    typed_rows,
)

SCHEMA = "a bigint, b string, v double"


def _parse(spark, lines):
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    return parse_json_lines(df, SCHEMA)


def test_ok_and_dead_split_is_a_partition(spark):
    lines = [
        '{"a": 1, "b": "x", "v": 2.5}',
        '{"a": 2}',                       # absent fields -> NULL
        'not json at all',                # dead
        '{"a": 3, "b": "y", "v": 1.0}',
    ]
    parsed = _parse(spark, lines)
    ok = {tuple(r) for r in typed_rows(parsed).collect()}
    assert (1, "x", 2.5) in ok and (3, "y", 1.0) in ok
    assert (2, None, None) in ok
    dead = [r._raw for r in dead_letters(parsed).collect()]
    assert dead == ["not json at all"]
    # every line lands in exactly one channel
    assert len(ok) + len(dead) == len(lines)


def test_render_parse_roundtrip(spark):
    src = spark.createDataFrame(
        [(1, "x", 2.5), (2, "quote\"inside", None)],
        SCHEMA)
    lines = src.select(render_json_lines(src).alias("value"))
    back = typed_rows(parse_json_lines(lines, SCHEMA))
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in src.collect()}


def test_no_python_udf_in_plan(spark):
    parsed = _parse(spark, ['{"a": 1}'])
    plan = typed_rows(parsed)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


# ------------------------------------------------------ CSVWithNames --


def test_csv_ok_dead_split_and_roundtrip(spark):
    from rsyslog_nginx_clickhouse_spark.sources.csvwithnames import (
        dead_letters as csv_dead,
        parse_csv_lines,
        render_csv_lines,
        typed_rows as csv_typed,
    )

    lines = spark.createDataFrame(
        [("1,x,2.5",), ("garbage,z",), ("3,y,1.0",)], "value string")
    parsed = parse_csv_lines(lines, "a bigint, b string, v double")
    ok = {tuple(r) for r in csv_typed(parsed).collect()}
    assert ok == {(1, "x", 2.5), (3, "y", 1.0)}
    assert [r._raw for r in csv_dead(parsed).collect()] == ["garbage,z"]

    src = spark.createDataFrame(
        [(1, "x", 2.5), (2, None, 3.0)], "a bigint, b string, v double")
    back = csv_typed(parse_csv_lines(
        src.select(render_csv_lines(src).alias("value")),
        "a bigint, b string, v double"))
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in src.collect()}
    plan = csv_typed(parsed)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BatchEvalPython" not in plan


def test_microsecond_timestamps_roundtrip_lossless(spark):
    from rsyslog_nginx_clickhouse_spark.sources.csvwithnames import (
        parse_csv_lines,
        render_csv_lines,
    )
    from rsyslog_nginx_clickhouse_spark.sources.csvwithnames import (
        typed_rows as csv_typed,
    )

    src = spark.sql(
        "SELECT TIMESTAMP'2024-01-01 23:59:59.999999' AS ts "
        "UNION ALL SELECT TIMESTAMP'2024-01-02 00:00:00.000001'")
    for render, parse, typed in (
            (render_json_lines,
             lambda ln, sch: parse_json_lines(ln, sch), typed_rows),
            (render_csv_lines,
             lambda ln, sch: parse_csv_lines(ln, sch), csv_typed)):
        back = typed(parse(
            src.select(render(src).alias("value")), "ts timestamp"))
        assert {r.ts for r in back.collect()} == \
            {r.ts for r in src.collect()}
