from rsyslog_nginx_clickhouse_spark.plans.storage import (
    write_mergetree_like,
    compact,
    read_table,
)

__all__ = ["write_mergetree_like", "compact", "read_table"]
