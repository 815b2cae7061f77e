"""Plan auditor: physical-plan properties for every registry query.

For each query, prints scans (pushed-filter count, read-schema width),
join strategies, and exchange count — the things that decide whether a
plan survives a 100× scale-up. Usage:

    python tools/plancheck.py [sf_dir] [query ...]

Hard-FLAGGED (nonzero exit): CartesianProduct / BroadcastNestedLoopJoin
— quadratic at scale. Everything else (pushed-filter counts, scan
widths, join strategies, partial aggregation) is SURFACED per query for
eyeballing/diffing; a zero-pushed scan is often legitimate (full-table
aggregations), so it is reported, not flagged.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_nginx_clickhouse_spark.queries import load_all
from rsyslog_nginx_clickhouse_spark.session import get_spark


def audit(plan: str) -> dict:
    scans = re.findall(r"FileScan parquet \[([^\]]*)\][^\n]*", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "scans": len(scans),
        "scan_cols": [len(s.split(",")) if s else 0 for s in scans],
        "pushed": [len([f for f in p.split(",") if f.strip()]) for p in pushed],
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "cartesian": plan.count("CartesianProduct")
        + plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange"),
        "partial_agg": "partial_" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = get_spark("plancheck")
    bad = 0
    for name, q in registry.items():
        if only and name not in only:
            continue
        try:
            df = q.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"SKIP {name}: {e}")
            continue
        a = audit(plan)
        flags = []
        if a["cartesian"]:
            flags.append("CARTESIAN")
        line = (f"{name:28s} scans={a['scans']} cols={a['scan_cols']} "
                f"pushed={a['pushed']} bhj={a['bhj']} smj={a['smj']} "
                f"exch={a['exchanges']} "
                f"{'partial-agg ' if a['partial_agg'] else ''}"
                f"{'topk ' if a['take_ordered'] else ''}"
                f"{' '.join(flags)}")
        print(("WARN " if flags else "ok   ") + line)
        bad += bool(flags)
        spark.catalog.clearCache()
    print(f"\n{bad} queries flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
