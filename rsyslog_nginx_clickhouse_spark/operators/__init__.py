"""Analytics operators: the query surface of the engine.

Reference-surface ops (SURVEY §2.6 Q1-Q6) plus the LLM-data-pipeline
extensions (SURVEY §7.5): dedup, similarity search, text analysis,
as-of join, sessionization, multimodal plumbing.
"""

from rsyslog_nginx_clickhouse_spark.operators.timeseries import time_bucket, timeseries_count
from rsyslog_nginx_clickhouse_spark.operators.topk import topk, topk_per_group
from rsyslog_nginx_clickhouse_spark.operators.asof import asof_join
from rsyslog_nginx_clickhouse_spark.operators.sessionize import sessionize

__all__ = [
    "time_bucket", "timeseries_count", "topk", "topk_per_group",
    "asof_join", "sessionize",
]
