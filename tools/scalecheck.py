"""Scaling probe: run queries across sf0.001/0.01/0.1 and report the
wall-time growth per 10× data growth.

A query whose time grows ~linearly (ratio ≈ data ratio or better,
thanks to fixed overheads amortizing) extrapolates safely; a
super-linear ratio flags a plan that won't survive 100 TB (quadratic
candidate generation, driver-side collects, global sorts). Usage:

    python tools/scalecheck.py [--sf1] [query ...]

--sf1 adds a fourth 10×-beyond-bench column read from the synthetic
documents/embeddings pair tools/sf1gen.py writes to
/tmp/scalecheck_sf1 (run sf1gen first; only document/embedding-table
queries can take that step — others will show nan there).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_nginx_clickhouse_spark.queries import load_all
from rsyslog_nginx_clickhouse_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
SF1_DIR = "/tmp/scalecheck_sf1"


def main() -> None:
    args = sys.argv[1:]
    with_sf1 = "--sf1" in args
    only = {a for a in args if a != "--sf1"}
    sfs = SFS + ([SF1_DIR] if with_sf1 else [])
    registry = load_all()
    spark = get_spark("scalecheck")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long").count()

    hdr = (f"{'query':28s} {'sf.001':>8s} {'sf.01':>8s} {'sf.1':>8s} "
           f"{'x(.01/.001)':>12s} {'x(.1/.01)':>10s}")
    if with_sf1:
        hdr += f" {'sf1*':>8s} {'x(1/.1)':>8s}"
    print(hdr)
    for name, q in registry.items():
        if only and name not in only:
            continue
        times = []
        for sf in sfs:
            best = None
            try:
                for _ in range(2):
                    t0 = time.time()
                    q.spark(spark, sf).write.mode("overwrite") \
                        .format("noop").save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                    spark.catalog.clearCache()
                    import gc

                    gc.collect()  # free localCheckpoint blocks too
            except Exception:
                best = float("nan")
            times.append(best)
        r1 = times[1] / times[0] if times[0] else float("nan")
        r2 = times[2] / times[1] if times[1] else float("nan")
        flag = "  <-- super-linear" if r2 > 12 else ""
        line = (f"{name:28s} {times[0]:8.2f} {times[1]:8.2f} "
                f"{times[2]:8.2f} {r1:12.1f} {r2:10.1f}")
        if with_sf1:
            r3 = times[3] / times[2] if times[2] else float("nan")
            if r3 > 12:
                flag = "  <-- super-linear"
            line += f" {times[3]:8.2f} {r3:8.1f}"
        print(line + flag)


if __name__ == "__main__":
    main()
