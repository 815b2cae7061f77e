"""Structured Streaming query entries.

``streaming_hourly_counts`` drives a REAL streaming query (readStream →
windowed agg → memory sink, availableNow) over the events parquet and
returns the materialized result — which must equal the batch answer, so
it gets a full DuckDB oracle. This is the streaming-equals-batch
consistency property Structured Streaming guarantees by construction.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.queries import query


def _run_to_memory_table(spark, df, output_mode: str):
    """Start df → memory sink (availableNow), run to completion, return
    the materialized table."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (df.writeStream.outputMode(output_mode)
           .format("memory").queryName(name)
           .trigger(availableNow=True).start())
    _run_to_completion(q)
    return spark.table(name)


def _run_to_completion(q, timeout_s: int = 300) -> None:
    """availableNow runs must actually FINISH: an unchecked
    awaitTermination timeout would silently return a partial memory
    table (or leave a rollup table still being appended) as if it were
    the full answer."""
    try:
        finished = q.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"streaming query did not finish within {timeout_s}s")
    finally:
        q.stop()


@query(
    "streaming_hourly_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS t, event_type, count(*) AS cnt
    FROM events GROUP BY t, event_type
    """,
    doc="real Structured Streaming run (memory sink, complete mode): "
        "windowed count per event_type; result must equal the batch agg",
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (_events_stream(spark, sf_dir)
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count("*").alias("cnt")))
    return _run_to_memory_table(spark, agg, "complete").select(
        F.col("w.start").alias("t"), "event_type", "cnt")


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from rsyslog_nginx_clickhouse_spark.catalog import normalize_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    return normalize_ts(
        spark.readStream.schema(raw_schema)
             .option("pathGlobFilter", "events.parquet")
             .parquet(sf_dir),
        "events")


@query(
    "streaming_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="real streaming session_window aggregation (30 min gap, memory "
        "sink, complete mode); oracle is the batch lag/gap formulation — "
        "session merges exactly when the next event lands strictly "
        "inside [ts, ts+gap), so the batch twin splits on diff >= gap",
)
def streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (_events_stream(spark, sf_dir)
           .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
           .agg(F.count("*").alias("n_events")))
    return _run_to_memory_table(spark, agg, "complete").select(
        "user_id", F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"), "n_events")


@query(
    "streaming_user_counts",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="custom stateful streaming operator via applyInPandasWithState: "
        "per-user running (count, sum) kept in explicit GroupState — the "
        "escape hatch for operators Spark's built-in streaming aggs "
        "can't express; state is per-key and bounded, update mode emits "
        "the running value each epoch",
)
def streaming_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 4)]})

    out = (_events_stream(spark, sf_dir)
           .groupBy("user_id")
           .applyInPandasWithState(
               update,
               outputStructType="user_id long, n_events long, "
                                "total_value double",
               stateStructType="n long, total double",
               outputMode="update",
               timeoutConf=GroupStateTimeout.NoTimeout))
    tbl = _run_to_memory_table(spark, out, "update")
    # update mode appends one row per key per epoch; keep the last epoch's
    return (tbl
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max_by("total_value", "n_events").alias("total_value")))


@query(
    "streaming_summed_rollup",
    oracle="""
    SELECT event_type, cast(ts AS date) AS d,
           round(sum(value), 4) AS total_value, count(*) AS cnt
    FROM events GROUP BY event_type, d
    """,
    doc="streaming materialized-view maintenance: each micro-batch "
        "appends per-epoch PARTIAL aggregates to a SummingMergeTree-"
        "style rollup table (plans/summing.py), the serving read merges "
        "parts — O(groups) written per epoch, serving cost O(keys); "
        "oracle is the batch GROUP BY over all events",
)
def streaming_summed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from rsyslog_nginx_clickhouse_spark.plans.summing import (
        append_partial,
        read_summed,
    )

    from rsyslog_nginx_clickhouse_spark.streaming.ingest import (
        idempotent_epoch_writer,
    )

    path = tempfile.mkdtemp(prefix="rollup_")
    shutil.rmtree(path, ignore_errors=True)

    # marker-gated staged write: a bare .write.append would double-count
    # the epoch's partials when Structured Streaming replays it
    sink = idempotent_epoch_writer(
        path,
        write_fn=lambda bdf, staging: append_partial(
            bdf.select("event_type", F.to_date("ts").alias("d"), "value"),
            staging, ["event_type", "d"], ["value"]))

    q = (_events_stream(spark, sf_dir)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_"))
         .trigger(availableNow=True).start())
    _run_to_completion(q)
    return read_summed(spark, path, ["event_type", "d"], ["value"]) \
        .select("event_type", "d",
                F.round(F.col("value"), 4).alias("total_value"),
                F.col("_n").alias("cnt"))
