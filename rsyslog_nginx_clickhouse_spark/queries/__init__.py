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
#: are front-loaded each round. Round-5 rotation (VERDICT r4 item 1):
#: the round-4 tie-exact rounding commits (ff729a6, d281b62, b069a88)
#: rewrote query+oracle text AFTER the r2/r3 driver windows ran, so
#: every query whose text changed since its last driver row is green
#: only on the in-repo selfcheck until the driver's independent oracle
#: re-runs it. Ordering (staleness computed per-query from
#: ``git diff 40a444e..HEAD`` mapped to registered decorator spans):
#: (1) the 11 TPC-H built-ins last driver-checked in r2;
#: (2) the semantically-rewritten money/ratio queries not in the r4
#: window (ratio-of-integer-unit-sums, integer-exact thresholds);
#: (3) the remaining rounding-touched entries last checked in r3;
#: (4) untouched r3-checked entries, as many as fit — preceded by (0),
#: queries NEW this round (never driver-verified). Untouched r3
#: entries that do not fit (customers_without_orders, embedding_norms,
#: embedding_quantization, orders_moving_avg,
#: orderstatus_pivot, purchase_last_view_asof, q12_priority_shipping,
#: replacing_upsert_roundtrip, rollup_customer_balance,
#: running_customer_spend, streaming_view_purchase_join,
#: timeseries_5min_by_type, top3_parts_per_brand, user_sessions) carry
#: text identical to what r3 verified and rotate in next round. All
#: registry entries pass the identical in-repo gate (tools/selfcheck.py)
#: regardless of order.
_FRONTLOAD_R5 = [
    # (0) new this round — never driver-verified; plus r4-green queries
    # whose code path changed this round (features schema float→double)
    "nginx_pipeline_rulebase",
    "multimodal_decode_bmp",
    "multimodal_features",
    # (1) last driver row r2 — also rounding-touched
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q11_important_parts",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q20_promo_suppliers",
    "q22_idle_customers",
    # (2) semantics rewritten by the rounding conversion, last row r3
    "q1_pricing_summary",
    "q14_promo_revenue",
    "parts_above_brand_avg",
    "latency_quantiles",
    "user_event_gaps",
    # (3) remaining rounding-touched, last row r3
    "collapsing_state_roundtrip",
    "curation_pipeline",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "domain_mixture",
    "events_in_sessions_rangejoin",
    "grafana_adhoc_filters",
    "grafana_from_to_macros",
    "grafana_natural_timeseries",
    "grafana_timeseries",
    "knn_ivf",
    "pii_redaction",
    "q10_returned_items",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "quality_scores",
    "repeat_users_intersect",
    "repetition_stats",
    "revenue_cube",
    "similar_activity_users",
    "source_overlap",
    "text_stats",
    # (4) untouched since their r3 green row — fill to 50
    "dedup_simhash",
    "doc_fingerprints",
    "funnel_view_click_purchase",
    "knn_lsh",
    "lang_detect",
    "token_shard_plan",
    "big_spender_customers",
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
    missing = [n for n in _FRONTLOAD_R5 if n not in REGISTRY]
    assert not missing, f"_FRONTLOAD names not in registry: {missing}"
    ordered = {n: REGISTRY[n] for n in _FRONTLOAD_R5}
    ordered.update(REGISTRY)
    return ordered
