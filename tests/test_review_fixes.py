"""Regressions for the self-review findings (see commit message)."""

from __future__ import annotations

import datetime
import glob
import os
import shutil

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.functions.clickhouse import (
    register_clickhouse_functions,
)
from rsyslog_nginx_clickhouse_spark.functions.macros import rewrite_aggregates
from rsyslog_nginx_clickhouse_spark.operators.asof import asof_join
from rsyslog_nginx_clickhouse_spark.operators.rangejoin import range_join
from rsyslog_nginx_clickhouse_spark.operators.simhash import simhash_pairs


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_carries_whole_rows_not_stitched_columns(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 03:00:00"))],
                                 "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 01:00:00"), "A", None),
         (1, _ts("2024-01-01 02:00:00"), None, "B")],
        "k int, ts timestamp, v1 string, v2 string")
    row = asof_join(left, right, on="k", time_col="ts").collect()[0]
    # the matched row is (NULL, 'B') — per-column carry would fabricate
    # ('A', 'B'), a row that never existed
    assert row["v1_asof"] is None and row["v2_asof"] == "B"
    assert row["ts_asof"] == _ts("2024-01-01 02:00:00")


def test_range_join_left_keeps_unmatched_points(spark):
    points = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:30:00")),   # inside
         ("u", _ts("2024-01-01 20:00:00"))],  # no interval
        "k string, ts timestamp")
    intervals = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "A")],
        "k string, s timestamp, e timestamp, label string")
    got = range_join(points, intervals, on="k", time_col="ts",
                     start_col="s", end_col="e", bin_s=600, how="left")
    rows = {str(r["ts"]): r["label"] for r in got.collect()}
    assert rows == {"2024-01-01 10:30:00": "A",
                    "2024-01-01 20:00:00": None}


def test_simhash_chunk_count_follows_hamming_budget(spark):
    # two docs differing in ~5 tokens of 40: hamming likely in (3, 8]
    base = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"w{i}" if i % 8 else f"x{i}" for i in range(40))
    docs = spark.createDataFrame([(1, base), (2, other), (3, base)],
                                 "doc_id long, text string")
    h3 = {(r["id_a"], r["id_b"]): r["hamming"]
          for r in simhash_pairs(docs, max_hamming=3).collect()}
    h20 = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_pairs(docs, max_hamming=20).collect()}
    assert h3[(1, 3)] == 0
    # the wider budget must be a superset, with recall at its budget
    assert set(h3) <= set(h20)
    assert all(h <= 20 for h in h20.values())
    assert (1, 2) in h20 or (1, 2) in h3 or h20 == h3  # candidates found


def test_tostartofweek_is_sunday_based(spark):
    register_clickhouse_functions(spark)
    rows = spark.sql("""
        SELECT toStartOfWeek(timestamp'2020-04-05 12:00:00') AS sun,
               toStartOfWeek(timestamp'2020-04-06 12:00:00') AS mon,
               toStartOfWeek(timestamp'2020-04-11 12:00:00') AS sat
    """).collect()[0]
    # ClickHouse mode 0: weeks start Sunday
    assert str(rows["sun"]) == "2020-04-05 00:00:00"
    assert str(rows["mon"]) == "2020-04-05 00:00:00"
    assert str(rows["sat"]) == "2020-04-05 00:00:00"


def test_parametric_quantile_with_nested_call():
    out = rewrite_aggregates("SELECT quantile(0.9)(toUInt32(t)) FROM x")
    assert out == "SELECT percentile_approx(toUInt32(t), 0.9) FROM x"


def test_files_per_partition_actually_splits_days(spark, tmp_path):
    from rsyslog_nginx_clickhouse_spark.plans.storage import (
        write_mergetree_like,
    )

    df = spark.range(4000).select(
        F.lit("2024-01-01").cast("date").alias("logdate"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double")))
        .alias("logdatetime"))
    path = str(tmp_path / "t")
    write_mergetree_like(df, path, files_per_partition=4)
    files = glob.glob(os.path.join(path, "logdate=2024-01-01", "*.parquet"))
    assert len(files) >= 2  # one day really splits across writers


def test_epoch_replay_purges_stale_layout(spark, tmp_path):
    from rsyslog_nginx_clickhouse_spark.sources.nginx_log import ingest_batch
    from rsyslog_nginx_clickhouse_spark.streaming.ingest import (
        idempotent_epoch_writer,
    )

    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir)
    line = ('1.1.1.1 - - [06/Apr/2020:09:00:00 +0000] "GET /a HTTP/1.1" '
            '200 10 "-" "ua" "-"\n')
    with open(os.path.join(log_dir, "a.log"), "w") as f:
        f.write(line * 6)
    table = str(tmp_path / "table")
    batch = ingest_batch(spark, log_dir)
    sink = idempotent_epoch_writer(table)
    sink(batch, 0)
    n = spark.read.parquet(table).count()

    # simulate a crashed first attempt that had published an EXTRA file
    # (different layout), then the replay: the stale file must be purged
    day_dir = glob.glob(os.path.join(table, "logdate=*"))[0]
    real = glob.glob(os.path.join(day_dir, "epoch-0-*.parquet"))[0]
    shutil.copy(real, os.path.join(day_dir, "epoch-0-99999.parquet"))
    os.remove(os.path.join(table, "_epoch_0_SUCCESS"))
    sink(batch, 0)
    assert spark.read.parquet(table).count() == n
    assert not glob.glob(os.path.join(day_dir, "epoch-0-99999.parquet"))


def test_engine_sql_rewrites_plain_clickhouse_aggregates(spark, tmp_path):
    from rsyslog_nginx_clickhouse_spark.engine import Engine

    log = str(tmp_path / "access.log")
    with open(log, "w") as f:
        f.write('1.1.1.1 - - [06/Apr/2020:09:00:00 +0000] "GET /a HTTP/1.1" '
                '200 10 "-" "ua" "-"\n')
    eng = Engine(table_root=str(tmp_path / "nginx"), spark=spark)
    eng.ingest(log)
    row = eng.sql("SELECT uniqExact(clientip) AS u, "
                  "quantileExact(0.5)(bytes) AS med FROM nginx").collect()[0]
    assert row["u"] == 1 and row["med"] == 10.0


def test_asof_ignores_null_time_and_null_key_right_rows(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 05:00:00")), (None, _ts("2024-01-01 05:00:00"))],
        "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, "phantom"),          # null time: never a match
         (None, _ts("2024-01-01 01:00:00"), "nullkey")],  # null key: never
        "k int, ts timestamp, v string")
    rows = {r["k"]: r["v_asof"]
            for r in asof_join(left, right, on="k", time_col="ts").collect()}
    assert rows == {1: None, None: None}


def test_range_join_rejects_outer_and_survives_corrupt_interval(spark):
    import pytest

    points = spark.createDataFrame([("u", 100)], "k string, t long")
    intervals = spark.createDataFrame(
        [("u", 0, 10**15, "huge"),      # corrupt end: clamped, no blowup
         ("u", 200, 100, "inverted")],  # end < start: dropped
        "k string, s long, e long, label string")
    with pytest.raises(ValueError):
        range_join(points, intervals, on="k", time_col="t",
                   start_col="s", end_col="e", how="full")
    got = range_join(points, intervals, on="k", time_col="t",
                     start_col="s", end_col="e", bin_s=10).collect()
    assert [r["label"] for r in got] == ["huge"]  # point is inside the clamp


def test_compact_does_not_leak_partition_overwrite_mode(spark, tmp_path):
    from rsyslog_nginx_clickhouse_spark.plans.storage import (
        compact,
        write_mergetree_like,
    )

    df = spark.createDataFrame(
        [("2024-01-01", "2024-01-01 00:00:00")],
        "logdate string, logdatetime string").select(
        F.col("logdate").cast("date"),
        F.col("logdatetime").cast("timestamp"))
    path = str(tmp_path / "t")
    write_mergetree_like(df, path)
    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                            "STATIC")
    compact(spark, path)
    after = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                           "STATIC")
    assert before == after  # session semantics unchanged


def test_range_join_wide_interval_keeps_matches(spark):
    # an interval far wider than the explode budget must still match
    # its points (key-only branch), not lose them to a clamp
    points = spark.createDataFrame(
        [("u", 10), ("u", 50_000_000)], "k string, t long")
    intervals = spark.createDataFrame(
        [("u", 0, 100_000_000, "wide")], "k string, s long, e long, label string")
    got = range_join(points, intervals, on="k", time_col="t",
                     start_col="s", end_col="e", bin_s=10)
    assert got.count() == 2  # both points match despite 10M-bin span


def test_simhash_zero_budget_exact_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "different one")],
        "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           simhash_pairs(docs, max_hamming=0).collect()}
    assert got == {(1, 2)}


def test_zorder_many_columns_stays_positive(spark):
    from rsyslog_nginx_clickhouse_spark.plans.zorder import zorder_key

    df = spark.createDataFrame(
        [(float(i % 7), float(i % 5), float(i % 3), float(i % 2), float(i))
         for i in range(64)], "a double, b double, c double, d double, e double")
    keys = [r["z"] for r in df.select(
        zorder_key(df, ["a", "b", "c", "d", "e"]).alias("z")).collect()]
    assert all(z >= 0 for z in keys)  # sign bit never set, no wrap


def test_bench_fold_best_presignature_fallback():
    """VERDICT r6 item 5 + ADVICE r6: (a) a best round that predates
    plan signatures must still yield a fallback signature (earliest
    sig-bearing round) so a deliberate plan rewrite adjudicates as
    plan-changed, not 'real'; (b) a stale signature from a previous
    best round must not survive a new sig-less best."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__),
                                  os.pardir, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    docs = [
        # r1: best wall for q, but recorded no signatures
        ("BENCH_r01.json", {"queries": {"q": 0.374, "p": 1.0}}),
        # r4: first round with a signature (slower wall)
        ("BENCH_r04.json", {"queries": {"q": 0.6, "p": 2.0},
                            "plan_sig": {"q": "sigA", "p": "sigP"}}),
        # r5: new sig-less best for p — its stale r4 sig must be popped
        ("BENCH_r05.json", {"queries": {"p": 0.5}}),
    ]
    best, rnd, sigs, first_sigs = bench._fold_best(docs)
    assert best == {"q": 0.374, "p": 0.5}
    assert rnd["q"] == "BENCH_r01.json"
    # (a) best round has no sig; fallback resolves to the r4 signature
    assert "q" not in sigs and first_sigs["q"] == ("sigA", "BENCH_r04.json")
    # (b) p's best moved to sig-less r5: the r4 sig must NOT linger
    assert "p" not in sigs and first_sigs["p"] == ("sigP", "BENCH_r04.json")


def test_bench_adjudicate_same_plan_rebaseline():
    """VERDICT r6 item 5, second remedy: when the all-time best round
    predates signatures AND the earliest recorded signature matches
    the current plan (the plan changed before signatures existed),
    the adjudicator re-baselines against the durable same-plan best
    (BENCH_BEST.json) instead of probing against a wall that belongs
    to a plan that no longer exists."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod2", os.path.join(os.path.dirname(__file__),
                                   os.pardir, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    best_known = (
        {"q": 0.374},                       # all-time best (r1, sig-less)
        {"q": "BENCH_r01.json"},
        {},                                  # best round recorded no sig
        {"q": ("sigB", "BENCH_r05.json")},   # earliest sig == HEAD sig
    )
    by_sig = {"q": {"sig": "sigB", "best": 1.0}}
    # 1.4s is 3.7x (and +1.0s) past the r1 wall but only 1.4x the
    # same-plan best → plan-changed (re-baselined), and NO probe runs
    # (registry=None would throw if the probe branch were taken)
    out = bench._adjudicate(None, None, {"q": 1.4}, {"q": "sigB"}, None,
                            best_known=best_known, best_by_sig=by_sig)
    assert out["q"]["verdict"] == "plan-changed"
    assert out["q"]["best_same_plan"] == 1.0
    # without the same-plan baseline the branch would have probed:
    # prove the gate is the baseline, not the ratio
    try:
        bench._adjudicate(None, None, {"q": 1.4}, {"q": "sigB"}, None,
                          best_known=best_known, best_by_sig={})
        raised = False
    except (AttributeError, TypeError):  # probe branch hit registry=None
        raised = True
    assert raised
    # ABS slack: 1.6x the best but within the additive-variance margin
    # (0.23s over) → not adjudicated at all (BENCH_BEST ratchets to the
    # luckiest sample; sub-second deltas are fixed-overhead noise)
    out = bench._adjudicate(None, None, {"q": 0.6}, {"q": "sigB"}, None,
                            best_known=best_known, best_by_sig={})
    assert out == {}
    # ... but ≥ 2x the all-time best adjudicates EVEN inside the
    # margin (VERDICT r9 item 4): the plan-changed re-baseline must
    # ship in the artifact, not read as an unexplained 2x
    out = bench._adjudicate(None, None, {"q": 0.9}, {"q": "sigB"}, None,
                            best_known=best_known, best_by_sig=by_sig)
    assert out["q"]["verdict"] == "plan-changed"
    assert out["q"]["best_same_plan"] == 1.0


def test_bench_update_best_by_sig(tmp_path, monkeypatch):
    """BENCH_BEST.json semantics: same signature rolls the best DOWN
    (taking the cleaner of in-suite wall and isolated probe); a
    changed signature RESETS the entry — a new plan starts its own
    baseline rather than inheriting the old plan's wall."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "bench_mod3", os.path.join(os.path.dirname(__file__),
                                   os.pardir, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr(bench, "BEST_PATH", str(tmp_path / "best.json"))

    bench._update_best_by_sig({"q": 1.0}, {"q": "sigA"}, {})
    bench._update_best_by_sig(  # clean probe beats wall → probe wins
        {"q": 0.9}, {"q": "sigA"},
        {"q": {"probe": 0.7, "probe_load": 0.4}})
    got = _json.load(open(bench.BEST_PATH))
    assert got["q"] == {"sig": "sigA", "best": 0.7}
    bench._update_best_by_sig(  # probe at-load is not a clean sample
        {"q": 0.65}, {"q": "sigA"},
        {"q": {"probe": 0.3, "probe_load": 8.2}})
    got = _json.load(open(bench.BEST_PATH))
    assert got["q"] == {"sig": "sigA", "best": 0.65}
    # sig change on an UNFLAGGED wall (not in adjudications → within
    # noise of the all-time best) may reset
    bench._update_best_by_sig({"q": 2.0}, {"q": "sigB"}, {})
    got = _json.load(open(bench.BEST_PATH))
    assert got["q"] == {"sig": "sigB", "best": 2.0}
    # sig change on an ADJUDICATED wall with no clean probe must NOT
    # reset — r12 wrote q2_min_cost_supplier's 5.539s suite wall over
    # a 1.292s baseline exactly this way (VERDICT r12 item 1)
    bench._update_best_by_sig(
        {"q": 5.5}, {"q": "sigC"},
        {"q": {"verdict": "plan-changed"}})
    got = _json.load(open(bench.BEST_PATH))
    assert got["q"] == {"sig": "sigB", "best": 2.0}
    # ... but with a clean solo probe the reset proceeds, from the
    # probe (the cleaner sample), not the suite wall
    bench._update_best_by_sig(
        {"q": 5.5}, {"q": "sigC"},
        {"q": {"verdict": "plan-changed",
               "probe": 1.8, "probe_load": 0.3}})
    got = _json.load(open(bench.BEST_PATH))
    assert got["q"] == {"sig": "sigC", "best": 1.8}


def test_bench_adjudicate_probe_invalid_when_slower_than_suite():
    """A probe SLOWER than the in-suite wall cannot be a clean sample
    (isolated-idle is a lower bound): the verdict must be
    'probe-invalid', never 'real' — observed live: source_overlap
    probed 5.88 s vs an in-suite 2.93 s at load 4.9 and shipped a
    'real' conviction on a ghost."""
    import importlib.util
    import time as _t

    spec = importlib.util.spec_from_file_location(
        "bench_mod3", os.path.join(os.path.dirname(__file__),
                                   os.pardir, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    class _Sink:
        def __init__(self, secs):
            self.secs = secs

        def mode(self, m):
            return self

        def format(self, f):
            return self

        def save(self):
            _t.sleep(self.secs)

    class _Q:
        def __init__(self, secs):
            self._sink = _Sink(secs)

        def spark(self, spark, sf):
            class _DF:
                write = self._sink
            return _DF()

    class _Catalog:
        def clearCache(self):
            pass

    class _Spark:
        catalog = _Catalog()

    import gc as _gc

    best_known = ({"q": 0.4}, {"q": "BENCH_r04.json"},
                  {"q": "sigA"}, {"q": ("sigA", "BENCH_r04.json")})
    # in-suite wall 1.2 s (3x and +0.8s past best, same sig, no
    # same-plan baseline); the fake query takes ~1.6 s isolated →
    # probe > wall → invalid
    out = bench._adjudicate({"q": _Q(1.6)}, _Spark(), {"q": 1.2},
                            {"q": "sigA"}, _gc,
                            best_known=best_known, best_by_sig={})
    assert out["q"]["verdict"] == "probe-invalid"
    # and a FAST clean probe still adjudicates steal as before
    out = bench._adjudicate({"q": _Q(0.05)}, _Spark(), {"q": 1.2},
                            {"q": "sigA"}, _gc,
                            best_known=best_known, best_by_sig={})
    assert out["q"]["verdict"] == "steal"
