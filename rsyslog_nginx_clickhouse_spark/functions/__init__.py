from rsyslog_nginx_clickhouse_spark.functions.clickhouse import register_clickhouse_functions
from rsyslog_nginx_clickhouse_spark.functions.macros import expand_macros

__all__ = ["register_clickhouse_functions", "expand_macros"]
