"""Round-14 optimization profiler: per-query job/stage metrics.

Runs named registry queries (or the N slowest from BENCH_LAST.json)
solo with the Spark UI's REST API enabled, times the noop-sink wall
exactly like bench.py, and attributes it: how many Spark jobs the
query launched, total task time, shuffle read/write bytes, and the
slowest stages — the guide §1 "empirical" loop without a browser.

Usage: python tools/profile_r14.py [sf_dir] query [query ...]
Writes one JSON line per query to stdout and a readable breakdown to
stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_nginx_clickhouse_spark.queries import load_all

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4050"))


def get_spark_ui():
    """Session factory clone with the UI (REST API) enabled — static
    conf, so this must run in a fresh process."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName("profile_r14")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.sql.maxMetadataStringLength", "10000")
        .getOrCreate()
    )


def _api(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> int:
    names = sys.argv[2:]
    registry = load_all()
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("WARN")
    app_id = spark.sparkContext.applicationId

    # warm-up identical to bench.py so first-query costs don't smear
    from rsyslog_nginx_clickhouse_spark.catalog import load
    load(spark, SF_DIR, "lineitem").count()
    import pandas as pd  # noqa: F401

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(64).repartition(32).mapInPandas(
        _noop, schema="id long").count()
    warm = spark.range(64).selectExpr("id", "id % 8 AS g")
    warm.groupBy("g").applyInPandas(
        lambda pdf: pdf, schema="id long, g long").count()
    from pyspark.sql.functions import broadcast
    warm.join(broadcast(spark.range(8).selectExpr("id AS g")),
              "g").count()
    warm.localCheckpoint(eager=True).count()

    import gc

    if not names:
        names = list(registry)

    for name in names:
        if name not in registry:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = registry[name].spark(spark, SF_DIR)
        t_plan = time.time() - t0
        df.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)

        jobs = [j for j in _api(f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before]
        stages_all = {s["stageId"]: s
                      for s in _api(f"applications/{app_id}/stages")}
        stage_ids = sorted({sid for j in jobs for sid in j["stageIds"]})
        stages = [stages_all[sid] for sid in stage_ids
                  if sid in stages_all]

        def _dur(obj):
            try:
                from datetime import datetime
                st = datetime.strptime(obj["submissionTime"][:23],
                                       "%Y-%m-%dT%H:%M:%S.%f")
                en = datetime.strptime(obj["completionTime"][:23],
                                       "%Y-%m-%dT%H:%M:%S.%f")
                return (en - st).total_seconds()
            except Exception:
                return None

        job_walls = [d for d in (_dur(j) for j in jobs) if d is not None]
        out = {
            "query": name,
            "wall_s": round(wall, 3),
            "df_construct_s": round(t_plan, 3),
            "n_jobs": len(jobs),
            "sum_job_wall_s": round(sum(job_walls), 3),
            "n_stages": len(stages),
            "task_time_s": round(sum(s.get("executorRunTime", 0)
                                     for s in stages) / 1000.0, 3),
            "shuffle_read_mb": round(sum(s.get("shuffleReadBytes", 0)
                                         for s in stages) / 2**20, 2),
            "shuffle_write_mb": round(sum(s.get("shuffleWriteBytes", 0)
                                          for s in stages) / 2**20, 2),
            "input_mb": round(sum(s.get("inputBytes", 0)
                                  for s in stages) / 2**20, 2),
            "output_mb": round(sum(s.get("outputBytes", 0)
                                   for s in stages) / 2**20, 2),
        }
        slow = sorted(stages, key=lambda s: -(s.get("executorRunTime", 0)))
        out["top_stages"] = [
            {"id": s["stageId"],
             "name": s.get("name", "")[:90],
             "wall_s": _dur(s),
             "task_s": round(s.get("executorRunTime", 0) / 1000.0, 2),
             "tasks": s.get("numCompleteTasks"),
             "in_mb": round(s.get("inputBytes", 0) / 2**20, 1),
             "sr_mb": round(s.get("shuffleReadBytes", 0) / 2**20, 2),
             "sw_mb": round(s.get("shuffleWriteBytes", 0) / 2**20, 2)}
            for s in slow[:6]]
        print(json.dumps(out), flush=True)
        desc = (f"{name}: wall={out['wall_s']}s construct="
                f"{out['df_construct_s']}s jobs={out['n_jobs']} "
                f"stages={out['n_stages']} task={out['task_time_s']}s "
                f"shufR={out['shuffle_read_mb']}MB")
        print(desc, file=sys.stderr)
        for s in out["top_stages"]:
            print(f"    stage {s['id']}: wall={s['wall_s']}s "
                  f"task={s['task_s']}s tasks={s['tasks']} "
                  f"in={s['in_mb']}MB sr={s['sr_mb']} sw={s['sw_mb']} "
                  f"{s['name']}", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()
    return 0


if __name__ == "__main__":
    sys.exit(main())
