from rsyslog_nginx_clickhouse_spark.sources.nginx_log import (
    NGINX_LINE_REGEX,
    NGINX_TABLE_SCHEMA,
    parse_lines,
    read_access_log,
    to_typed_table,
)
from rsyslog_nginx_clickhouse_spark.sources.lookup import lookup_map, lookup_join

__all__ = [
    "NGINX_LINE_REGEX",
    "NGINX_TABLE_SCHEMA",
    "parse_lines",
    "read_access_log",
    "to_typed_table",
    "lookup_map",
    "lookup_join",
]
