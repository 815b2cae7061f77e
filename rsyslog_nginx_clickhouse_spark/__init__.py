"""PySpark-native analytics engine with the capabilities of
CatWithTail/rsyslog-nginx-clickhouse.

The reference repo wires nginx → rsyslog (parse/enrich) → ClickHouse
(MergeTree storage) → Grafana (SQL analytics). This package re-expresses
that pipeline Spark-first:

- ``sources``   — log-line parsing (regex tokenizer ↔ liblognorm rule),
                  lookup-table enrichment (broadcast map ↔ rsyslog lookup()).
- ``plans``     — partitioned / sorted columnar storage (↔ MergeTree
                  PARTITION BY + ORDER BY).
- ``functions`` — ClickHouse-compat scalar functions and the Grafana
                  macro expander; text / vector column builders.
- ``operators`` — the analytics surface: time-series bucketing, top-k,
                  dedup (exact / MinHash / SimHash / n-gram Jaccard /
                  embedding), similarity search, as-of join, sessionize.
- ``streaming`` — Structured Streaming ingest (↔ rsyslog imfile tail).
- ``queries``   — the declared query inventory (Spark impl + DuckDB
                  oracle SQL side by side), consumed by __spark_entry__.
"""

from rsyslog_nginx_clickhouse_spark.engine import Engine
from rsyslog_nginx_clickhouse_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
