from rsyslog_nginx_clickhouse_spark.streaming.ingest import (
    stream_access_log,
    start_ingest,
    streaming_timeseries,
)

__all__ = ["stream_access_log", "start_ingest", "streaming_timeseries"]
