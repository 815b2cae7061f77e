"""ClickHouse sinks (K1 parity): HTTP JSONEachRow + batched JDBC.

The reference POSTs one INSERT per event to the ClickHouse HTTP port
(omclickhouse, /root/reference/nginx.conf:61-63 — ``server=127.0.0.1
port=8123``, at-least-once, no batching). Two upgrades here, same
target table:

- ``clickhouse_http_writer`` — the SAME wire protocol as the
  reference (HTTP POST to :8123), upgraded from one-INSERT-per-event
  to one ``INSERT ... FORMAT JSONEachRow`` POST per partition chunk.
  Executors post their partitions in parallel; nothing but the tiny
  INSERT header leaves the JVM unbatched. Needs no driver jar, so it
  is fully testable against a plain HTTP server (tests do exactly
  that) — the serialization is distributed (``to_json`` over the
  row struct, JVM-side).
- ``clickhouse_batch_writer`` — JDBC alternative; requires the
  ClickHouse JDBC driver on the classpath
  (``spark.jars.packages=com.clickhouse:clickhouse-jdbc:<ver>``).

Both are at-least-once per epoch (HTTP/JDBC inserts aren't
transactional across a batch): pair with a ReplacingMergeTree target
or a dedup key for effective exactly-once, or keep the parquet path
(plans/storage.py) as the system of record — the default here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_URL = "jdbc:clickhouse://127.0.0.1:8123/default"
DEFAULT_HTTP = "http://127.0.0.1:8123"


def insert_url(base_url: str, table: str, fmt: str = "JSONEachRow") -> str:
    """The HTTP endpoint omclickhouse talks to, with the INSERT header
    in the query string (ClickHouse's standard bulk-insert form)."""
    from urllib.parse import quote

    return (base_url.rstrip("/") + "/?query="
            + quote(f"INSERT INTO {table} FORMAT {fmt}"))


def clickhouse_http_writer(base_url: str = DEFAULT_HTTP,
                           table: str = "nginx",
                           chunk_rows: int = 50_000):
    """foreachBatch sink POSTing each epoch as JSONEachRow chunks.

    Serialization is ``to_json(struct(*))`` — JVM-side, distributed;
    only the final newline-joined POST body is Python, executed per
    partition on the executors (no driver collect). Timestamps render
    ISO-8601; ClickHouse parses them with
    ``date_time_input_format='best_effort'`` (set it server-side or
    per-query if the target columns are DateTime).
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        url = insert_url(base_url, table)
        # ignoreNullFields=false: a NULL column must serialize as an
        # explicit "col": null — omitted fields make ClickHouse fill
        # the column DEFAULT (0/''), silently diverging from the value
        payload = batch_df.select(
            F.to_json(F.struct(*batch_df.columns),
                      {"ignoreNullFields": "false"}).alias("j"))

        def post_partition(rows) -> None:
            import urllib.error
            import urllib.request

            buf: list[str] = []

            def flush() -> None:
                if not buf:
                    return
                data = ("\n".join(buf) + "\n").encode()
                req = urllib.request.Request(
                    url, data=data, method="POST",
                    headers={"Content-Type": "application/x-ndjson"})
                try:
                    with urllib.request.urlopen(req) as resp:
                        if not 200 <= resp.status < 300:
                            raise RuntimeError(
                                f"ClickHouse insert failed: {resp.status}")
                except urllib.error.HTTPError as e:
                    # surface ClickHouse's error body — it carries the
                    # actual parse/type message (urlopen raises for
                    # >=400, so a bare status check never sees these)
                    raise RuntimeError(
                        f"ClickHouse insert failed: {e.code} "
                        f"{e.read(4096).decode(errors='replace')}") from e
                buf.clear()

            for r in rows:
                buf.append(r["j"])
                if len(buf) >= chunk_rows:
                    flush()
            flush()

        payload.foreachPartition(post_partition)

    return sink


def clickhouse_batch_writer(url: str = DEFAULT_URL, table: str = "nginx",
                            user: str = "default", password: str = "",
                            batchsize: int = 100_000):
    """foreachBatch sink: append each epoch to a ClickHouse table.

    At-least-once (JDBC inserts aren't transactional across a batch);
    pair with a ReplacingMergeTree target or a dedup key for effective
    exactly-once, or keep parquet as the system of record.
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df.write.format("jdbc")
         .option("url", url)
         .option("dbtable", table)
         .option("user", user)
         .option("password", password)
         .option("batchsize", str(batchsize))
         .option("isolationLevel", "NONE")
         .mode("append")
         .save())

    return sink
