"""Property tests for the round-13 SQL folds.

The windowFunnel SQL spelling claims to run branch-for-branch the
``operators/funnel.funnel_level`` slot algorithm, and the
time-constrained sequenceMatch spelling claims its unrolled NFA is
exact vs the memoized DP. Both claims are checked here on seeded
random inputs — many cases batched into ONE DataFrame per comparison
so the property sweep costs two Spark jobs, not hundreds.
"""

from __future__ import annotations

import datetime as dt
import random

from rsyslog_nginx_clickhouse_spark.functions.macros import sql
from rsyslog_nginx_clickhouse_spark.operators.funnel import (
    _seq_match_end,
    funnel_level,
    parse_sequence_pattern,
)


def _ts(sec):
    return dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) \
        + dt.timedelta(seconds=sec)


def test_window_funnel_sql_fold_matches_python_reference(spark):
    """400 random users x random mode sets: the SQL aggregate() fold
    must equal funnel_level on the sorted (ts, level) pairs."""
    rng = random.Random(13)
    types = ["A", "B", "C", "X"]  # X never matches
    lv_of = {"A": 1, "B": 2, "C": 3}
    window_s = 10
    cases = {}
    rows = []
    for uid in range(400):
        n = rng.randint(0, 12)
        evs = sorted((rng.randint(0, 30), rng.choice(types))
                     for _ in range(n))
        cases[uid] = evs
        rows += [(uid, _ts(t), e) for t, e in evs]
    # every user must keep a row even with no events: give each user
    # at least one (possibly non-matching) event
    for uid in range(400):
        if not cases[uid]:
            cases[uid] = [(0, "X")]
            rows.append((uid, _ts(0), "X"))
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string")
    df.createOrReplaceTempView("wf_prop")
    for modes, modestr in [((), ""),
                           (("strict_order",), ", 'strict_order'"),
                           (("strict_dedup",), ", 'strict_dedup'"),
                           (("strict_increase",),
                            ", 'strict_increase'")]:
        got = {r.user_id: r.lvl for r in sql(
            spark,
            f"SELECT user_id, windowFunnel({window_s}{modestr})"
            f"(ts, event_type = 'A', event_type = 'B', "
            f"event_type = 'C') AS lvl "
            f"FROM wf_prop GROUP BY user_id").collect()}
        bad = []
        for uid, evs in cases.items():
            if "strict_order" in modes:
                pairs = sorted((t * 1_000_000, lv_of.get(e, 0))
                               for t, e in evs)
            else:
                pairs = sorted((t * 1_000_000, lv_of[e])
                               for t, e in evs if e in lv_of)
            want = funnel_level(
                pairs, 3, window_s * 1_000_000,
                strict_order="strict_order" in modes,
                strict_dedup="strict_dedup" in modes,
                strict_increase="strict_increase" in modes)
            if got[uid] != want:
                bad.append((uid, evs, got[uid], want))
        assert not bad, f"modes={modes}: {bad[:3]}"


def test_sequence_nfa_sql_matches_dp_reference(spark):
    """300 random users x 3 time-constrained patterns: the unrolled
    NFA must agree with the memoized DP (existence over all paths)."""
    rng = random.Random(31)
    types = ["A", "B", "X"]
    lab_of = {"A": "1", "B": "2"}
    cases = {}
    rows = []
    for uid in range(300):
        n = rng.randint(1, 10)
        evs = sorted((rng.randint(0, 40), rng.choice(types))
                     for _ in range(n))
        cases[uid] = evs
        rows += [(uid, _ts(t), e) for t, e in evs]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string")
    df.createOrReplaceTempView("sm_prop")
    for pattern in ["(?1)(?t<=5)(?2)", "(?1).*(?2)(?t>3)(?1)",
                    "(?2)(?t>=10)(?2)"]:
        got = {r.user_id: r.m for r in sql(
            spark,
            f"SELECT user_id, sequenceMatch('{pattern}')"
            f"(ts, event_type = 'A', event_type = 'B') AS m "
            f"FROM sm_prop GROUP BY user_id").collect()}
        toks = [("star",)] + parse_sequence_pattern(pattern, 2)
        bad = []
        for uid, evs in cases.items():
            stored = [(t * 1_000_000, lab_of[e])
                      for t, e in evs if e in lab_of]
            labs = "".join(c for _, c in stored)
            ts = [t for t, _ in stored]
            want = _seq_match_end(labs, ts, toks, 0) is not None
            if bool(got[uid]) != want:
                bad.append((uid, evs, got[uid], want))
        assert not bad, f"pattern={pattern}: {bad[:3]}"
