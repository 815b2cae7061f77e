"""Dump .explain("formatted") + solo noop timing for named queries.

Usage: python tools/plandump_r15.py <suffix> <sf_dir> query [query ...]
Writes plans/r15/<query>_<suffix>.txt and prints solo timings (2 iters,
min is the comparable number — bench.py methodology).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_nginx_clickhouse_spark.queries import load_all
from rsyslog_nginx_clickhouse_spark.session import get_spark


def main() -> int:
    suffix, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    reg = load_all()
    spark = get_spark("plandump")
    from rsyslog_nginx_clickhouse_spark.catalog import load
    load(spark, sf_dir, "lineitem").count()
    import pandas as pd  # noqa: F401

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(64).repartition(32).mapInPandas(
        _noop, schema="id long").count()
    import gc
    os.makedirs(os.path.join("plans", "r15"), exist_ok=True)
    for name in names:
        df = reg[name].spark(spark, sf_dir)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join("plans", "r15",
                               f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        best = None
        for it in range(2):
            t0 = time.time()
            reg[name].spark(spark, sf_dir).write.mode(
                "overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            gc.collect()
        print(f"{name} [{suffix}]: min={best:.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
