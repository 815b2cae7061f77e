"""ClickHouse sink (K1 parity): micro-batch JDBC inserts.

The reference POSTs one INSERT per event over HTTP (omclickhouse,
/root/reference/nginx.conf:61-63, at-least-once, no batching). This
sink upgrades that to batched JDBC inserts per micro-batch epoch —
same target table, radically better amortization.

Requires the ClickHouse JDBC driver on the Spark classpath
(``spark.jars.packages=com.clickhouse:clickhouse-jdbc:<ver>``) and a
reachable server — neither exists in this container, so the module is
import-safe and the writer fails with a clear message at call time.
The self-contained parquet path (plans/storage.py) is the default; this
exists for drop-in parity with reference deployments that keep
ClickHouse as the serving layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_URL = "jdbc:clickhouse://127.0.0.1:8123/default"


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
