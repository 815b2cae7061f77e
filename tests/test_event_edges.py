"""Adversarial-corpus oracle parity for the EVENTS family — the third
edge harness beside the documents (test_oracle_edges.py) and vector
(test_vector_edges.py) corpora: run the real registry queries and
their DuckDB oracles over an events table the driver's testdata never
produces, and require the same agreement the driver's gate checks.

What the corpus stresses, by construction:
- DUPLICATE timestamps within a user (window/as-of/funnel orderings
  must be total or tie-insensitive to stay deterministic cross-engine
  — the driver's µs-resolution data never ties);
- a single-event user (lag/gap NULL paths, 1-event sessions);
- events exactly AT a midnight boundary and 1 µs before it (to_date /
  bucket-edge assignment);
- NULL, empty, and MALFORMED-JSON props (the JSON path functions'
  null-propagation differs between engines if anything is loose);
- an event_type outside the known domain, and 2-decimal values
  repeated exactly (quantile rank ties).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_nginx_clickhouse_spark.queries import load_all

EVENT_QUERIES = [
    "timeseries_5min_by_type", "daily_unique_users", "event_type_share",
    "error_rate_daily", "approx_daily_users", "approx_latency_quantiles",
    "latency_quantiles", "top_users", "user_sessions", "user_event_gaps",
    "purchase_last_view_asof", "repeat_users_intersect",
    "props_json_stats", "status_class_share", "bot_traffic_share",
    "limit_by_recent_events", "with_totals_event_counts",
    "sample_clause_scan", "value_histogram", "timeseries_gap_fill",
    "kmv_rollup_users", "quantile_rollup_latency", "topk_rollup_users",
    "argmax_rollup_latest", "ttl_rollup_compaction",
    "funnel_view_click_purchase", "retention_cohort",
    "sequence_match_funnel", "sequence_count_chains",
    "events_in_sessions_rangejoin", "skew_salted_event_counts",
    # round-9 tier: rollup/cube NULL-key subtotals over sparse days,
    # multi-quantile interpolation on exact-value ties, LOCF fill with
    # a single real bucket, lag/lead on 1-row days, scalar-WITH
    # constants, FINAL re-sum over 2-epoch partials, partition-scoped
    # mutations with the edge days, format-source round-trips at the
    # midnight/µs boundaries, tie-closed top-n where EVERYTHING ties
    "rollup_sql_daily", "cube_sql_status", "quantiles_array_sql",
    "with_fill_interpolate", "window_lag_lead_sql",
    "scalar_with_threshold", "final_summing_read",
    "mutation_delete_roundtrip", "mutation_update_roundtrip",
    "jsoneachrow_roundtrip", "csvwithnames_roundtrip",
    "group_uniq_array_sql", "top_n_sql", "limit_with_ties_sql",
    # round-10 tier: ordered per-user sequences over the duplicate-ts
    # pairs (the struct tiebreak must stay total cross-engine) and the
    # row-count SAMPLE's full-table degradation (300 >= 31 rows — the
    # oracle must replay the factor-1 branch, not extrapolate)
    "group_array_sql", "sample_rowcount_scan",
]

#: (event_id, ts, user_id, event_type, value, props)
EDGE_EVENTS = [
    # user 1: full funnel with a DUPLICATE-timestamp pair (view+click
    # share one instant; purchase later) and a same-(ts,type) twin
    (1, "2024-01-10 09:00:00.000000", 1, "view", 10.00, '{"p": 1}'),
    (2, "2024-01-10 09:05:00.000000", 1, "view", 10.00, '{"p": 2}'),
    (3, "2024-01-10 09:05:00.000000", 1, "click", 5.50, None),
    (4, "2024-01-10 10:00:00.000000", 1, "purchase", 99.99, '{"amt": 99.99}'),
    (5, "2024-01-10 10:00:00.000000", 1, "view", 1.25, ""),
    # user 2: a single event — lag/gap NULL, a 1-event session
    (6, "2024-01-05 12:00:00.000000", 2, "error", 0.05, "{"),
    # user 3: midnight boundary and 1 µs before it
    (7, "2024-01-02 00:00:00.000000", 3, "view", 20.00, '{"b": true}'),
    (8, "2024-01-01 23:59:59.999999", 3, "click", 20.00, "not json"),
    (9, "2024-01-02 00:00:00.000001", 3, "purchase", 20.00, None),
    # user 4: exact (ts, type) tie pair — fully interchangeable rows
    (10, "2024-01-15 08:00:00.000000", 4, "signup", 3.33, '{"x":"y"}'),
    (11, "2024-01-15 08:00:00.000000", 4, "signup", 3.33, '{"x":"y"}'),
    # user 5: error-only day + repeated exact values (quantile ties)
    (12, "2024-01-20 01:00:00.000000", 5, "error", 7.77, '{"code": 500}'),
    (13, "2024-01-20 02:00:00.000000", 5, "error", 7.77, '{"code": 502}'),
    (14, "2024-01-20 03:00:00.000000", 5, "error", 7.77, "[]"),
    # user 6: funnel spread across the TTL cutoff (raw + rolled days)
    (15, "2024-01-23 23:00:00.000000", 6, "view", 12.34, None),
    (16, "2024-01-25 01:00:00.000000", 6, "click", 12.34, '{"late": 1}'),
    (17, "2024-01-26 02:00:00.000000", 6, "purchase", 45.00, '{}'),
    # user 7: out-of-domain event type, empty-string type neighbor
    (18, "2024-01-18 14:00:00.000000", 7, "weird", 0.01, '{"?": 0}'),
    (19, "2024-01-18 15:00:00.000000", 7, "view", 0.01, None),
    # user 8: high-volume user for top-k/skew paths, over two days
    *[(20 + i,
       f"2024-01-{11 + i % 2:02d} {6 + i // 2:02d}:30:00.000000",
       8, ("view", "click")[i % 2], round(1.00 + i * 0.25, 2),
       f'{{"i": {i}}}')
      for i in range(12)],
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("ev_edge"))
    df = (spark.createDataFrame(
            EDGE_EVENTS,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string")
          .select("event_id",
                  F.to_timestamp("ts").alias("ts"),
                  "user_id", "event_type", "value", "props"))
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_oracle_agrees_on_edge_corpus(spark, edge_dir, name):
    q = load_all()[name]
    sdf = q.spark(spark, edge_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(r[c] for c in scols) for r in sdf.collect()),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t))
    spark.catalog.clearCache()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM parquet_scan("
        f"'{os.path.join(edge_dir, 'events.parquet')}/*.parquet')")
    res = con.execute(q.oracle)
    ocols = [dsc[0] for dsc in res.description]
    rows = res.fetchall()
    colmap = {c: i for i, c in enumerate(ocols)}
    orows = sorted(
        (tuple(r[colmap[c]] for c in sorted(ocols)) for r in rows),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t))

    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), f"rowcount {len(srows)} vs {len(orows)}"
    assert srows == orows
