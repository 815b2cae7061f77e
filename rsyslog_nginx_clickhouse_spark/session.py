"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what a 1000-executor cluster deployment would
set per-executor; the scale-sensitive knobs (AQE, shuffle partitions,
Arrow) are on so plans developed here survive a 100× scale-up.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "rsyslog-nginx-clickhouse-spark",
              cpus: str | int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - session timezone pinned to UTC (parquet timestamps compare stably
      against the DuckDB oracle),
    - AQE on (runtime partition coalescing, skew-join splitting, join
      strategy switching — the scale path for 100 TB),
    - shuffle partitions sized to cores in local mode (a cluster deploy
      would raise this to ~2-3× total cores),
    - Arrow on for the pandas-UDF operators.
    """
    # Legacy audit switch (pre-r6 plancheck): barriers are
    # correctness-load-bearing outside explain-only runs, so an
    # inherited env var must fail loudly rather than silently skip
    # them. The auditor now opts in via plans.barrier.set_audit_mode.
    if os.environ.get("SPARK_GRAFT_PLAN_AUDIT", "") == "1":
        raise RuntimeError(
            "SPARK_GRAFT_PLAN_AUDIT=1 is set: this env var no longer "
            "enables plan-audit mode and would have silently disabled "
            "correctness-load-bearing barriers. Unset it; plan auditors "
            "call plans.barrier.set_audit_mode(True) instead.")
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # static conf (settable only at session build): keep the stage
        # ticker off stdout so bench.py's JSON line stays parseable
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.maxMetadataStringLength", "10000")
    )
    spark = builder.getOrCreate()
    # getOrCreate IGNORES builder confs when a session already exists
    # (e.g. created by a test harness): re-apply the runtime-settable
    # ones — above all the UTC pin, which oracle parity depends on.
    for k, v in (("spark.sql.session.timeZone", "UTC"),
                 ("spark.sql.shuffle.partitions", cpus),
                 ("spark.sql.adaptive.enabled", "true"),
                 ("spark.sql.execution.arrow.pyspark.enabled", "true"),
                 # plan-text metadata (DataFilters/PushedFilters/...)
                 # truncates at this many chars; with the 100-char
                 # default the cut point depends on the DIGIT WIDTH of
                 # expression ids, so bench._plan_sig's id-normalized
                 # signature flip-flopped between identical plans
                 # (q2_min_cost_supplier's r12 "instability" was
                 # exactly this — VERDICT r12 item 1). Untruncated
                 # metadata is id-invariant after normalization.
                 ("spark.sql.maxMetadataStringLength", "10000")):
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("WARN")
    return spark
