"""Structured Streaming ingest ↔ the rsyslog half of the reference.

Reference dataflow (/root/reference/nginx.conf): imfile tails
access.log (S1, nginx.conf:48,51) → mmnormalize parse (nginx.conf:54) →
lookup enrich (nginx.conf:55) → template render → per-row ClickHouse
INSERT (K1, nginx.conf:61-63), at-least-once, no batching.

Spark formulation:

- source: ``readStream.text(dir)`` over rotated/closed log files (the
  file source ingests whole new files — the documented bridge for
  imfile's line-tailing, SURVEY §7.4; a socket/Kafka front end replaces
  it for live syslog without touching the transform chain).
- transform: the SAME batch functions from sources/nginx_log.py — one
  code path for batch backfill and streaming (Structured Streaming's
  core promise).
- sink: ``writeStream.foreachBatch`` appending day-partitioned sorted
  parquet with checkpointing — upgrading the reference's row-at-a-time
  at-least-once INSERTs to micro-batch appends with checkpointed
  progress (exactly-once per epoch given an idempotent/transactional
  target; Delta would make the file commit atomic too).
- streaming aggregation: watermarked tumbling-window counts — the
  streaming twin of the Grafana query (Q1-Q4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from rsyslog_nginx_clickhouse_spark.sources.nginx_log import (
    parse_lines,
    to_typed_table,
)
from rsyslog_nginx_clickhouse_spark.plans.storage import write_mergetree_like


def stream_access_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """Streaming source over an access-log directory (S1 equivalent)."""
    raw = spark.readStream.format("text").load(log_dir)
    return to_typed_table(parse_lines(raw))


def start_ingest(spark: SparkSession, log_dir: str, table_path: str,
                 checkpoint: str, trigger_once: bool = True) -> StreamingQuery:
    """Tail → parse → enrich → typed table, exactly-once per micro-batch.

    foreachBatch writes each epoch through plans/storage.py (sorted,
    day-partitioned) — the K1 sink with batching the reference lacks.
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_mergetree_like(batch_df, table_path, mode="append")

    writer = (stream_access_log(spark, log_dir)
              .writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_timeseries(typed_stream: DataFrame, time_col: str = "logdatetime",
                         window: str = "1 hour",
                         watermark: str = "2 hours",
                         group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Watermarked tumbling-window counts — streaming Q1-Q4.

    Late rows beyond ``watermark`` are dropped deterministically; state
    size stays bounded (windows finalize and evict), which is what makes
    this runnable forever on the 100 TB/day firehose.
    """
    return (typed_stream
            .withWatermark(time_col, watermark)
            .groupBy(F.window(time_col, window).alias("w"), *group_cols)
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("t"), *group_cols, "cnt"))
