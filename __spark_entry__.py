"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``rsyslog_nginx_clickhouse_spark.queries`` — the query
registry pairs every Spark implementation with its DuckDB oracle SQL
(same column names, rounded floats; see queries/__init__.py for the
determinism contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rsyslog_nginx_clickhouse_spark.queries import load_all

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full nginx ingest
    round-trip (log-line render → regex parse → month lookup → typed
    projection), SURVEY §2.1-§2.5 end-to-end."""
    return _REGISTRY["nginx_pipeline"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §7.5)."""
    return {name: q.spark for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    return {name: q.oracle for name, q in _REGISTRY.items()
            if q.oracle is not None}
