"""Scaling probe: run queries across sf0.001/0.01/0.1 and report the
wall-time growth per 10× data growth.

A query whose time grows ~linearly (ratio ≈ data ratio or better,
thanks to fixed overheads amortizing) extrapolates safely; a
super-linear ratio flags a plan that won't survive 100 TB (quadratic
candidate generation, driver-side collects, global sorts). Usage:

    python tools/scalecheck.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_nginx_clickhouse_spark.queries import load_all
from rsyslog_nginx_clickhouse_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    only = set(sys.argv[1:])
    registry = load_all()
    spark = get_spark("scalecheck")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long").count()

    print(f"{'query':28s} {'sf.001':>8s} {'sf.01':>8s} {'sf.1':>8s} "
          f"{'x(.01/.001)':>12s} {'x(.1/.01)':>10s}")
    for name, q in registry.items():
        if only and name not in only:
            continue
        times = []
        for sf in SFS:
            best = None
            try:
                for _ in range(2):
                    t0 = time.time()
                    q.spark(spark, sf).write.mode("overwrite") \
                        .format("noop").save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                    spark.catalog.clearCache()
            except Exception:
                best = float("nan")
            times.append(best)
        r1 = times[1] / times[0] if times[0] else float("nan")
        r2 = times[2] / times[1] if times[1] else float("nan")
        flag = "  <-- super-linear" if r2 > 12 else ""
        print(f"{name:28s} {times[0]:8.2f} {times[1]:8.2f} {times[2]:8.2f} "
              f"{r1:12.1f} {r2:10.1f}{flag}")


if __name__ == "__main__":
    main()
