"""Behavioral analytics: windowFunnel / retention (ClickHouse analogs).

The reference's analytics store is ClickHouse (README.md:7,32 states
ad-hoc SELECT as a product requirement); ``windowFunnel`` and
``retention`` are the canonical ClickHouse behavioral aggregates a
Grafana/nginx-analytics user reaches for next after the starter
time-series query. Re-expressed Spark-first:

- ``retention`` is pure expression aggregation (one shuffle on
  user_id, map-side partial aggs) — zero Python.
- ``window_funnel`` is a per-user sequential state machine — the one
  shape DataFrames can't express relationally without an O(n^levels)
  self-join. Formulation: one shuffle to ``collect_list`` the per-user
  (ts, level) pairs (bounded per user), then an Arrow pandas_udf runs
  the linear-time DP over many users per batch — no per-group
  invocation overhead, no driver involvement.

Semantics (deterministic, oracle-checkable):

- timestamps compare at MICROSECOND precision (``unix_micros``) on
  both engines. The input time column is coerced to TimestampType
  first (``unix_micros`` rejects TIMESTAMP_NTZ; with the session tz
  pinned UTC the cast preserves the wall-clock instant).
- funnel level L = the largest k such that events e1 ≤ … ≤ ek exist
  (non-strict ordering, equal timestamps allowed) with e_i matching
  condition i and t(e_k) − t(e_1) ≤ window. The max-start DP is exact
  for this EXISTS-chain semantic: for chains reaching level k−1 only
  the maximal chain-start time matters (the window constraint is
  monotone in the start), so one value per level suffices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: the windowFunnel strict-mode flags ClickHouse accepts
_FUNNEL_MODES = frozenset(
    {"strict_order", "strict_dedup", "strict_increase"})


def _parse_modes(modes: "str | tuple[str, ...]") -> frozenset:
    """Normalize a windowFunnel mode spec (shared by the single- and
    multi-mode operators): str → 1-tuple, the ClickHouse
    ``strict_deduplication`` alias, unknown flags refused loudly."""
    if isinstance(modes, str):
        modes = (modes,)
    norm = frozenset("strict_dedup"
                     if m == "strict_deduplication" else m
                     for m in modes)
    unknown = norm - _FUNNEL_MODES
    if unknown:
        raise ValueError(
            f"unknown windowFunnel mode(s) {sorted(unknown)!r} — "
            f"supported: {sorted(_FUNNEL_MODES)}")
    return norm


def funnel_level(pairs, n_levels: int, window_us: int,
                 strict_order: bool = False,
                 strict_dedup: bool = False,
                 strict_increase: bool = False) -> int:
    """The ClickHouse windowFunnel fold over SORTED (ts, level)
    pairs — slots[k] = (chain_first_ts, level_event_ts) for level
    k+1; overwrites only ever raise chain_first_ts, so one slot per
    level is exact (and equals the max-start DP when no mode is
    set). Module-level so the batch pandas_udf and the streaming
    applyInPandasWithState operator run the IDENTICAL fold."""
    slots = [None] * n_levels
    first_event = False

    def progress() -> int:
        for k in range(n_levels, 0, -1):
            if slots[k - 1] is not None:
                return k
        return 0

    for ts, lv in pairs:
        if lv == 0:  # non-matching (stored under strict_order)
            if first_event:
                break
            continue
        if lv == 1:
            slots[0] = (ts, ts)
            first_event = True
        elif strict_dedup and slots[lv - 1] is not None:
            return lv
        elif strict_order and first_event and slots[lv - 2] is None:
            return progress()
        elif slots[lv - 2] is not None:
            first_ts, last_ts = slots[lv - 2]
            ok = ts - first_ts <= window_us
            if strict_increase:
                ok = ok and last_ts < ts
            if ok:
                slots[lv - 1] = (first_ts, ts)
                if lv == n_levels:
                    return n_levels
    return progress()


def window_funnel(events: DataFrame, conds: list[str], window_us: int,
                  user_col: str = "user_id", time_col: str = "ts",
                  type_col: str = "event_type",
                  modes: "str | tuple[str, ...]" = ()) -> DataFrame:
    """(user, funnel_level): ClickHouse ``windowFunnel(window[,
    modes])(t, c1..cN)``.

    ``conds`` are DISTINCT ``type_col`` values, one per funnel level
    (duplicate conditions would need per-event multi-level matching —
    out of scope).

    ``modes`` (VERDICT r11 item 5) is any subset of ClickHouse's
    strict flags — the per-user pass is the EXACT single-slot fold
    ClickHouse runs (one (chain_first_ts, level_event_ts) slot per
    level, events in (ts, level) order):

    - ``strict_order``: any event between chain steps interrupts —
      non-matching events break the fold once a level-1 event was
      seen, and a matching event whose predecessor level is still
      empty terminates with the current progress;
    - ``strict_dedup`` (alias ``strict_deduplication``): a second
      event for an already-filled level >= 2 terminates the fold with
      that event's level;
    - ``strict_increase``: a chain step must be STRICTLY later than
      the recorded previous-level event. NOTE: this is the ClickHouse
      slot semantics, not "exists a strictly-increasing chain" — for
      A@0 B@1 B@9 C@9 (window 10) the B@9 overwrite makes C fail and
      the level is 2, though an increasing chain A@0,B@1,C@9 exists.
      The oracle must fold, not EXISTS-join.

    Without modes, the slot fold is provably the max-start DP the
    original implementation ran (slot overwrites are monotone in
    chain start), so plain-mode results are unchanged.
    """
    if len(set(conds)) != len(conds):
        raise ValueError("window_funnel conditions must be distinct")
    modes = _parse_modes(modes)
    strict_order = "strict_order" in modes
    strict_dedup = "strict_dedup" in modes
    strict_increase = "strict_increase" in modes
    lvl_of = {c: i + 1 for i, c in enumerate(conds)}
    n_levels = len(conds)

    @F.pandas_udf(T.IntegerType())
    def funnel(pairs: pd.Series) -> pd.Series:
        def level(evs) -> int:
            if evs is None:  # user with no qualifying events (left join)
                return 0
            return funnel_level(
                sorted((e["t"], e["lv"]) for e in evs), n_levels,
                window_us, strict_order, strict_dedup,
                strict_increase)

        return pairs.map(level).astype("int32")

    lvl_map = F.create_map(
        *[x for c, l in lvl_of.items() for x in (F.lit(c), F.lit(l))])
    ts_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    if strict_order:
        # non-matching events are part of the semantics (they break
        # the chain): ship them as level 0, like ClickHouse's add()
        pair = F.struct(
            ts_us.alias("t"),
            F.coalesce(lvl_map[F.col(type_col)], F.lit(0)).alias("lv"))
    else:
        # one scan, one shuffle: collect_list SKIPS nulls, so users
        # whose events all miss the conditions still get a row (empty
        # list → level 0) — no second scan / distinct / join
        pair = F.when(lvl_map[F.col(type_col)].isNotNull(),
                      F.struct(ts_us.alias("t"),
                               lvl_map[F.col(type_col)].alias("lv")))
    return (events
            .groupBy(user_col)
            .agg(F.collect_list(pair).alias("evs"))
            .select(F.col(user_col),
                    funnel(F.col("evs")).alias("funnel_level")))


def window_funnel_multi(events: DataFrame, conds: list[str],
                        window_us: int,
                        mode_sets: "list[str | tuple[str, ...]]",
                        out_cols: list[str],
                        user_col: str = "user_id",
                        time_col: str = "ts",
                        type_col: str = "event_type") -> DataFrame:
    """(user, level per mode set): SEVERAL ``windowFunnel`` mode
    variants folded from ONE per-user collect (round 15 — guide §2:
    one pass, shared per-user state; previously each variant ran its
    own collect_list shuffle and the variants re-joined on user).

    Semantics are EXACTLY per-variant ``window_funnel``: every mode
    set runs the same single-slot ``funnel_level`` fold over the same
    sorted (ts, level) pairs it would have received stand-alone —

    - the shuffle ships non-matching events as level 0 only when some
      mode set includes ``strict_order`` (they are part of that
      semantic: ClickHouse's add() stores them); a fold WITHOUT
      strict_order then filters the level-0 pairs back out before
      folding, which is pair-identical to the stand-alone operator's
      in-aggregate skip (filtering commutes with the value sort);
    - with no strict_order set anywhere, the skip happens in the
      aggregate exactly as before and nothing extra is shuffled.

    Returns one INT level column per mode set, named by ``out_cols``.
    """
    if len(set(conds)) != len(conds):
        raise ValueError("window_funnel conditions must be distinct")
    if len(mode_sets) != len(out_cols) or not mode_sets:
        raise ValueError("window_funnel_multi: mode_sets and out_cols "
                         "must be same-length and non-empty")
    parsed = [_parse_modes(m) for m in mode_sets]
    flags = [("strict_order" in m, "strict_dedup" in m,
              "strict_increase" in m) for m in parsed]
    any_order = any(so for so, _, _ in flags)
    lvl_of = {c: i + 1 for i, c in enumerate(conds)}
    n_levels = len(conds)

    result_t = T.StructType(
        [T.StructField(c, T.IntegerType()) for c in out_cols])

    @F.pandas_udf(result_t)
    def funnels(pairs: pd.Series) -> pd.DataFrame:
        def levels(evs) -> list[int]:
            ps = ([] if evs is None
                  else sorted((e["t"], e["lv"]) for e in evs))
            nz = [p for p in ps if p[1] != 0] if any_order else ps
            return [funnel_level(ps if so else nz, n_levels,
                                 window_us, so, sd, si)
                    for so, sd, si in flags]

        return pd.DataFrame(pairs.map(levels).tolist(),
                            columns=out_cols,
                            index=pairs.index).astype("int32")

    lvl_map = F.create_map(
        *[x for c, l in lvl_of.items() for x in (F.lit(c), F.lit(l))])
    ts_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    if any_order:
        pair = F.struct(
            ts_us.alias("t"),
            F.coalesce(lvl_map[F.col(type_col)], F.lit(0)).alias("lv"))
    else:
        pair = F.when(lvl_map[F.col(type_col)].isNotNull(),
                      F.struct(ts_us.alias("t"),
                               lvl_map[F.col(type_col)].alias("lv")))
    return (events
            .groupBy(user_col)
            .agg(F.collect_list(pair).alias("evs"))
            .select(F.col(user_col), funnels(F.col("evs")).alias("__f"))
            .select(F.col(user_col),
                    *[F.col(f"__f.{c}").alias(c) for c in out_cols]))


def retention(events: DataFrame, conds: list[Column],
              user_col: str = "user_id") -> DataFrame:
    """ClickHouse ``retention(c1..cN)`` rolled up to counts.

    Per user: r1 = c1 held; r_i = c1 AND c_i (i ≥ 2). Returns ONE row
    of user counts per step — the cohort-retention headline numbers.
    Pure expression aggregation: shuffle carries one boolean vector
    per user, partial aggs map-side.
    """
    flags = [F.max(F.when(c, F.lit(1)).otherwise(F.lit(0)))
             .alias(f"c{i}") for i, c in enumerate(conds, 1)]
    per_user = events.groupBy(user_col).agg(*flags)
    r = [F.sum(F.col("c1")).cast("long").alias("r1")]
    for i in range(2, len(conds) + 1):
        r.append(F.sum(F.col("c1") * F.col(f"c{i}"))
                  .cast("long").alias(f"r{i}"))
    return per_user.agg(*r)


#: condition-label alphabets: single digits for <= 9 conditions (the
#: historical encoding — every existing oracle's label strings stay
#: byte-identical), a 32-char letter alphabet for 10-32 (the CH
#: condition limit). '0' stays the non-match marker in both.
_SEQ_ALPHABET = "123456789"
_SEQ_ALPHABET_WIDE = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdef"


def seq_alphabet(n_conds: int) -> str:
    """The label alphabet for ``n_conds`` conditions (round 13 —
    previously >9 was refused outright; CH's own limit is 32)."""
    if n_conds <= 9:
        return _SEQ_ALPHABET
    if n_conds <= 32:
        return _SEQ_ALPHABET_WIDE
    raise ValueError(
        f"sequence match supports at most 32 conditions (the "
        f"ClickHouse limit); got {n_conds}")


def _cond_char(num: str, n_conds: "int | None") -> str:
    """Pattern atom number → its label char under the alphabet for
    ``n_conds`` (None = the historical digit encoding, <= 9 only)."""
    n = int(num)
    alphabet = _SEQ_ALPHABET if n_conds is None \
        else seq_alphabet(n_conds)
    if not 1 <= n <= len(alphabet) or (n_conds is not None
                                       and n > n_conds):
        raise ValueError(f"sequenceMatch pattern references "
                         f"condition {n} but only "
                         f"{n_conds if n_conds is not None else 9} "
                         f"condition(s) are available")
    return alphabet[n - 1]


def translate_sequence_pattern(pattern: str,
                               n_conds: "int | None" = None) -> str:
    """ClickHouse sequenceMatch pattern → plain regex over the per-event
    condition-label string: ``(?N)`` → condition N's label char,
    ``.*`` kept, ``.`` (exactly one event of any kind) kept. Time
    constraints (``(?t>3600)``) are not supported — raise rather than
    silently drop a constraint that changes semantics."""
    import re

    out, pos = [], 0
    for m in re.finditer(r"\(\?(\d{1,2})\)|\.\*|\.", pattern):
        if m.start() != pos:
            raise ValueError(f"unsupported sequenceMatch pattern "
                             f"fragment {pattern[pos:m.start()]!r}")
        out.append(_cond_char(m.group(1), n_conds)
                   if m.group(1) else m.group(0))
        pos = m.end()
    if pos != len(pattern):
        raise ValueError(f"unsupported sequenceMatch pattern tail "
                         f"{pattern[pos:]!r} (time constraints like "
                         f"(?t>3600) are not implemented)")
    return "".join(out)


#: time-constraint comparators ClickHouse's (?t op N) accepts
_TIME_OPS = {
    ">": lambda d, v: d > v,
    "<": lambda d, v: d < v,
    ">=": lambda d, v: d >= v,
    "<=": lambda d, v: d <= v,
    "==": lambda d, v: d == v,
}


def parse_sequence_pattern(pattern: str,
                           n_conds: "int | None" = None) -> list[tuple]:
    """ClickHouse sequenceMatch pattern → token list (round 12 —
    previously time constraints were refused outright):

    - ``(?N)``   → ('cond', <label char>, tc) where the char is N's
      label under the alphabet for ``n_conds`` (digits for <= 9,
      letters for 10-32 — round 13 lifted the 9-condition limit to
      the CH 32) and tc is the pending time constraint
      (op, seconds) or None;
    - ``.*``     → ('star',); ``.`` → ('any',);
    - ``(?t op N)`` → attaches to the FOLLOWING condition atom and is
      checked against the event matched by the PRECEDING one. CH
      defines the constraint between the two events matched by
      adjacent condition atoms, so it is accepted ONLY directly
      between two ``(?N)`` atoms — anything else ((?t) at the start,
      after ``.*``/``.``, trailing, doubled) is refused loudly.
    """
    import re

    toks: list[tuple] = []
    pending: "tuple | None" = None
    pos = 0
    for m in re.finditer(
            r"\(\?(\d{1,2})\)|\(\?t\s*(>=|<=|==|>|<)\s*(\d+)\)"
            r"|\.\*|\.",
            pattern):
        if m.start() != pos:
            raise ValueError(f"unsupported sequenceMatch pattern "
                             f"fragment {pattern[pos:m.start()]!r}")
        pos = m.end()
        if m.group(2):  # (?t op N)
            if pending is not None:
                raise ValueError(
                    "sequenceMatch: doubled time constraint")
            if not toks or toks[-1][0] != "cond":
                raise ValueError(
                    "sequenceMatch: (?t op N) must sit directly "
                    "between two (?N) condition atoms — it "
                    "constrains the two events those atoms match")
            pending = (m.group(2), int(m.group(3)))
        elif m.group(1):
            toks.append(("cond", _cond_char(m.group(1), n_conds),
                         pending))
            pending = None
        else:
            if pending is not None:
                raise ValueError(
                    "sequenceMatch: (?t op N) must sit directly "
                    "between two (?N) condition atoms — it "
                    "constrains the two events those atoms match")
            toks.append(("star",) if m.group(0) == ".*" else ("any",))
    if pos != len(pattern):
        raise ValueError(f"unsupported sequenceMatch pattern tail "
                         f"{pattern[pos:]!r}")
    if pending is not None:
        raise ValueError("sequenceMatch: trailing time constraint")
    return toks


def _seq_scanner(labs: str, ts: list, toks: list):
    """start → minimal event index just past a match of ``toks`` that
    begins consuming at start (None if no match from there) — the
    lazy end a regex engine's non-greedy scan would take, with time
    constraints checked between adjacent condition atoms. ONE memo
    over (event index, token index) shared by every start (the DP is
    start-independent — ADVICE r12), so a full multi-start scan stays
    O(events × tokens) total."""
    n = len(labs)
    memo: dict[tuple[int, int], "int | None"] = {}

    def go(i: int, k: int) -> "int | None":
        if k == len(toks):
            return i
        key = (i, k)
        if key in memo:
            return memo[key]
        memo[key] = None  # cycle guard (star self-recursion)
        t = toks[k]
        best: "int | None" = None
        if t[0] == "star":
            a = go(i, k + 1)
            b = go(i + 1, k) if i < n else None
            best = a if b is None else (b if a is None else min(a, b))
        elif t[0] == "any":
            if i < n:
                best = go(i + 1, k + 1)
        else:  # cond
            _, c, tc = t
            if i < n and labs[i] == c and (
                    tc is None
                    or (i > 0 and _TIME_OPS[tc[0]](
                        ts[i] - ts[i - 1], tc[1] * 1_000_000))):
                best = go(i + 1, k + 1)
        memo[key] = best
        return best

    return lambda start: go(start, 0)


def _seq_match_end(labs: str, ts: list, toks: list,
                   start: int) -> "int | None":
    """Single-start form of _seq_scanner (existence checks)."""
    return _seq_scanner(labs, ts, toks)(start)


def _seq_count(labs: str, ts: list, toks: list) -> int:
    """Non-overlapping leftmost-lazy count — scan starts left to
    right, take the FIRST matching start's minimal end, resume there
    (the regex findall discipline the no-time path uses, and CH's
    resume-after-chain). The scanner's memo is shared across starts,
    so the whole count is O(events × tokens)."""
    count, pos, n = 0, 0, len(labs)
    scan = _seq_scanner(labs, ts, toks)
    while pos <= n:
        end = None
        for s in range(pos, n + 1):
            end = scan(s)
            if end is not None:
                break
        if end is None:
            break
        count += 1
        pos = end if end > pos else pos + 1  # empty match advances
    return count


def sequence_label(conds: list[Column]) -> Column:
    """Per-event condition label: '1'..'N' for the FIRST matching
    condition, '0' for none — '0' events are DROPPED from the
    sequence string before matching (ClickHouse stores only events
    satisfying at least one condition, so its ``.`` and condition
    adjacency operate over that filtered sequence — ADVICE r7).
    ClickHouse evaluates conditions independently (one event may
    satisfy several); this encoding is equivalent when the conditions
    are mutually exclusive — the event_type-equality conditions every
    query here uses — and that restriction keeps the whole aggregate
    a pure-expression string build both engines replay identically.
    One char per label is a hard encoding requirement (str(10)'s '1'
    would falsely match condition 1 in the regex — ADVICE r7), so
    10-32 conditions switch to a letter alphabet (round 13; 32 is
    ClickHouse's own condition limit, seq_alphabet)."""
    alphabet = seq_alphabet(len(conds))
    lab = F.lit("0")
    for i in range(len(conds), 0, -1):
        lab = F.when(conds[i - 1], F.lit(alphabet[i - 1])) \
            .otherwise(lab)
    return lab


def sequence_match(events: DataFrame, conds: list[Column], pattern: str,
                   user_col: str = "user_id",
                   time_col: str = "ts") -> DataFrame:
    """(user, matched): ClickHouse ``sequenceMatch(pattern)(t, c1..cN)``.

    Spark-first formulation — no UDF, no per-user state machine: each
    event becomes one label char, the per-user labels concatenate in
    (ts, label) order into a sequence string (collect_list + array_sort
    + filter + transform + array_join, all codegen-able expressions;
    one shuffle on user), and the pattern is a single ``rlike``. The
    string holds one char per event satisfying ≥1 condition
    (non-matches dropped — ClickHouse's storage rule), so
    ``(?1).*(?2)`` subsequence-exists, bare ``.`` (exactly one stored
    event) and ``(?1)(?2)`` adjacency all coincide with ClickHouse.
    Equal-timestamp ties order by label (deterministic, and identical
    to the oracle's ``ORDER BY ts, lab``); per-user state is the
    bounded label string — at 100 TB the shuffle carries one char per
    event, nothing quadratic.
    """
    toks = parse_sequence_pattern(pattern, len(conds))
    if any(t[0] == "cond" and t[2] for t in toks):
        # time-constrained pattern (round 12): the label string cannot
        # carry timestamps, so the match runs as an Arrow-batched DP
        # over the per-user (ts, label) pairs — same single shuffle,
        # O(events × tokens) per user, unanchored like rlike
        toks = [("star",)] + toks

        @F.pandas_udf(T.BooleanType())
        def matcher(pairs: pd.Series) -> pd.Series:
            def run(evs) -> bool:
                labs, ts = _seq_pairs(evs)
                return _seq_match_end(labs, ts, toks, 0) is not None

            return pairs.map(run)

        per_user = _per_user_label_pairs(events, conds, user_col,
                                         time_col)
        return per_user.select(
            F.col(user_col), matcher(F.col("evs")).alias("matched"))
    regex = translate_sequence_pattern(pattern, len(conds))
    per_user = _per_user_label_sequence(events, conds, user_col,
                                        time_col)
    return per_user.select(
        F.col(user_col),
        F.col("seq").rlike(regex).alias("matched"))


def _seq_pairs(evs) -> tuple[str, list]:
    """Sorted (ts, label) structs → (label string, ts_us list)."""
    if evs is None or len(evs) == 0:
        return "", []
    pairs = sorted((e["t"], e["lab"]) for e in evs)
    return "".join(p[1] for p in pairs), [p[0] for p in pairs]


def _per_user_label_pairs(events: DataFrame, conds: list[Column],
                          user_col: str, time_col: str) -> DataFrame:
    """(user, evs): per-user (ts_us, label) structs for the
    time-constrained matcher — the pair-carrying twin of
    _per_user_label_sequence (same storage rule: non-matching events
    dropped inside the aggregate, every user keeps a row)."""
    lab = sequence_label(conds)
    ts_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    pair = F.when(lab != F.lit("0"),
                  F.struct(ts_us.alias("t"), lab.alias("lab")))
    return (events
            .groupBy(user_col)
            .agg(F.collect_list(pair).alias("evs")))


def _per_user_label_sequence(events: DataFrame, conds: list[Column],
                             user_col: str, time_col: str) -> DataFrame:
    """(user, seq): the per-user condition-label string shared by
    sequence_match and sequence_count — one shuffle on user, one char
    per matching event.

    Events matching NO condition (label '0') are filtered out of the
    string AFTER the per-user sort but BEFORE concatenation: ClickHouse
    stores only events satisfying at least one condition
    (events.any() storage rule), so its ``.`` and ``(?1)(?2)``
    adjacency operate over the filtered sequence — labelling
    non-matches '0' and letting ``.`` match them diverged for those
    patterns (ADVICE r7). The filter sits inside the aggregate
    expression (not a WHERE), so every user keeps a row — ClickHouse's
    sequenceMatch still aggregates over groups whose events all fail
    the conditions (empty sequence → no match), and dropping those
    users would change n_users."""
    lab = sequence_label(conds).alias("lab")
    ts = F.col(time_col).cast("timestamp")
    return (events
            .select(F.col(user_col), ts.alias("__ts"), lab)
            .groupBy(user_col)
            .agg(F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(
                            F.struct(F.col("__ts"), F.col("lab")))),
                        lambda x: x["lab"] != F.lit("0")),
                    lambda x: x["lab"]),
                "").alias("seq")))


def sequence_count(events: DataFrame, conds: list[Column], pattern: str,
                   user_col: str = "user_id",
                   time_col: str = "ts") -> DataFrame:
    """(user, n_chains): ClickHouse ``sequenceCount(pattern)(t, c1..cN)``.

    sequenceCount counts NON-OVERLAPPING chains, resuming the scan at
    the event after each completed chain. Over the label string that
    is exactly non-overlapping regex matching with LAZY quantifiers:
    the minimal match ends at the earliest event completing the chain
    (ClickHouse's state-machine advance), and findall resumes at
    match-end (ClickHouse's resume-after-chain). Greedy ``.*`` would
    swallow later chains — on labels "1212", lazy ``1.*?2`` counts 2
    chains (== ClickHouse), greedy ``1.*2`` counts 1 — so ``.*``
    translates to ``.*?`` here and ONLY here; sequence_match keeps the
    greedy form (existence is quantifier-insensitive). Same single
    user-shuffle plan as sequence_match; the count is one
    regexp_extract_all size, no UDF.
    """
    toks = parse_sequence_pattern(pattern, len(conds))
    if any(t[0] == "cond" and t[2] for t in toks):
        # time-constrained count (round 12): leftmost-lazy
        # non-overlapping scan in the Arrow DP — the same findall
        # discipline the regex path uses

        @F.pandas_udf(T.LongType())
        def counter(pairs: pd.Series) -> pd.Series:
            def run(evs) -> int:
                labs, ts = _seq_pairs(evs)
                return _seq_count(labs, ts, toks)

            return pairs.map(run).astype("int64")

        per_user = _per_user_label_pairs(events, conds, user_col,
                                         time_col)
        return per_user.select(
            F.col(user_col), counter(F.col("evs")).alias("n_chains"))
    regex = translate_sequence_pattern(
        pattern, len(conds)).replace(".*", ".*?")
    per_user = _per_user_label_sequence(events, conds, user_col,
                                        time_col)
    return per_user.select(
        F.col(user_col),
        F.size(F.regexp_extract_all("seq", F.lit(regex), F.lit(0)))
         .cast("long").alias("n_chains"))
