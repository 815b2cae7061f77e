"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The driver records only the LAST 2000 chars of stdout (measured:
BENCH_r0{1,2,3}.json all have len(tail)==2000; the full 100-query dict
is ~3 KB, which is why r2/r3 recorded "parsed": null). So the stdout
line is kept under that window: it carries the headline plus as many
of the SLOWEST per-query timings as fit a 1700-char budget, with
"queries_omitted"/"queries_file" marking the cut, and the COMPLETE
object is always written to BENCH_LAST.json at the repo root.

Each query is executed end-to-end (plan + execute + collect) once after
a session warm-up; per-query wall seconds reported. Runs the full
registry so the benchmark covers every declared operator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rsyslog_nginx_clickhouse_spark.queries import load_all
from rsyslog_nginx_clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

REPO = os.path.dirname(os.path.abspath(__file__))
#: adjudication thresholds — match tools/benchdiff.py
ADJ_RATIO = 1.5
ADJ_FLOOR_S = 0.3
#: absolute slack: run-to-run variance at sf0.1 is ADDITIVE fixed
#: overhead (JVM/codegen/scheduler, ~0.2-0.4 s), not multiplicative —
#: and BENCH_BEST ratchets to the MINIMUM across every recorded run,
#: so a sub-second query sits 1.5x above its luckiest-ever sample on a
#: perfectly healthy run (observed: 6 ghost 'real' verdicts on 0.4-0.9s
#: queries in one back-to-back run). A regression must clear BOTH the
#: ratio and this absolute margin to be worth a probe.
ADJ_ABS_SLACK_S = 0.6
#: a 1-min load above this BEFORE the bench starts means another
#: tenant is on the box — the run is CONTENDED: it records that fact,
#: would-be 'real' regression verdicts ship as 'contended' (the r11
#: driver pass at load 7.05 labeled 7 ghosts 'real'; the quiet
#: same-tree run refuted every one), and BENCH_BEST does not ratchet
#: (a new plan signature must not baseline against a loaded sample).
#: Only the PRE-bench load is meaningful: the suite's own Spark work
#: legitimately drives 1-min load to ~7 on local[32] (quiet r11 run:
#: start 1.57, after pass 1: 7.08), so mid-run loads diagnose, never
#: convict.
CONTENDED_LOAD_1M = 2.0
#: ... and the 5-min load catches what the 1-min gate misses: a box
#: whose previous tenant just left reads 1-min ~0 while the 5-min
#: average still carries the heat (the r12 "quiet" run started at
#: 1-min 0.05 / 5-min 3.91 and its probes then ran at load 2.3-10.3 —
#: VERDICT r12 item 2). The 5-min average decays with a ~5-min time
#: constant, so the drain-wait below is long enough for genuine
#: suite-heat to clear; a 5-min load that persists past it is a
#: co-tenant, not an echo.
CONTENDED_LOAD_5M = 2.5
#: bounded drain-wait at start: give a transient spike (or the 5-min
#: average's decay) this long to clear before declaring the run
#: contended. Raised 450 → 900 in round 15 (VERDICT r14 item 4): the
#: r14 driver run started at 5-min load 2.5 — exactly the gate — after
#: the 450 s wait ran out; the 5-min average decays with a ~5-min time
#: constant, so 450 s (1.5 constants) strands a run that 900 s (3
#: constants, 2.5 → ~0.4 from a vacated box) would have cleared. A
#: genuine co-tenant still pins the load and the run is declared
#: contended exactly as before.
DRAIN_WAIT_S = 900
#: bounded re-drain BETWEEN interleaved passes (round 15, VERDICT r14
#: item 4): pass 1's own Spark work legitimately drives the 1-min load
#: to ~7, and that heat decays with a ~1-min time constant once the
#: pass pauses — so pass 2's samples start into the suite's own echo
#: (or a co-tenant that arrived mid-run). Waiting, bounded, for the
#: 1-min average to fall back under the gate costs ≤ REDRAIN_WAIT_S of
#: UNTIMED wall and keeps pass-2 minimums comparable to pass-1's.
#: Own-heat clears in ~60·ln(7/2.0) ≈ 75 s; the bound covers that with
#: slack while a persistent co-tenant just eats the bound once.
REDRAIN_WAIT_S = 240
#: a probe sampled at-or-above this 1-min load is not a clean sample:
#: its verdict caps at 'contended' and it may not seed a BENCH_BEST
#: re-baseline
PROBE_LOAD_CEILING = 3.0
#: ... and SEEDING/RESETTING a BENCH_BEST entry needs a stricter bar
#: than CLEARING a regression (round 14, VERDICT r13 item 6): a
#: 'steal' verdict only needs the probe to return to the existing
#: floor — load can only make that conclusion conservative — but a
#: probe that BECOMES the floor ratchets every later round against
#: its number, so a sample at load 2.7-2.94 (r13's probes, legal for
#: clearing) would bake box noise into the baseline. Seeds require a
#: genuinely idle box.
SEED_LOAD_CEILING = 1.5


def _plan_sig(df) -> str:
    """Stable shape signature of a query's physical plan: expression
    ids, object addresses, paths, and UUIDs stripped, md5'd. Recorded
    per query in BENCH_LAST.json so the NEXT round's adjudication can
    tell 'the plan changed' (expected time shift) from 'same plan,
    slower' (steal or a real regression) without any manual diffing."""
    import hashlib
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    norm = re.sub(
        r"#\d+|@[0-9a-f]+|file:[^\s,\)\]]*|/tmp/[^\s,\)\]]*"
        r"|[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
        r"|plan_id=\d+|epoch: \d+|ver = \d+",
        "·", plan)
    return hashlib.md5(norm.encode()).hexdigest()[:12]


def _fold_best(docs: list[tuple[str, dict]]) -> tuple[
        dict[str, float], dict[str, str], dict[str, str],
        dict[str, tuple[str, str]]]:
    """Fold per-round bench docs (sorted by round) into per-query best
    wall, its round, that round's plan signature (absent when the best
    round recorded none — pre-r5 rounds), and the EARLIEST recorded
    signature per query (fallback baseline for the plan-changed check
    when the best round predates signatures — VERDICT r6 item 5).
    Factored pure so tests can drive it with synthetic rounds."""
    best: dict[str, float] = {}
    rnd: dict[str, str] = {}
    sigs: dict[str, str] = {}
    first_sigs: dict[str, tuple[str, str]] = {}  # name -> (sig, round)
    for path, doc in docs:
        for name, t in doc.get("queries", {}).items():
            sig = doc.get("plan_sig", {}).get(name)
            if sig and name not in first_sigs:
                first_sigs[name] = (sig, path)
            if t is None or t <= 0:
                continue
            if name not in best or t < best[name]:
                best[name] = t
                rnd[name] = path
                # a sig recorded by a PREVIOUS best round must not
                # survive a new sig-less best (ADVICE r6): the stale
                # pair would mislabel a real regression 'plan-changed'
                sigs.pop(name, None)
                if sig:
                    sigs[name] = sig
    return best, rnd, sigs, first_sigs


def _best_known() -> tuple[dict[str, float], dict[str, str],
                           dict[str, str], dict[str, tuple[str, str]]]:
    """Per-query best wall across recorded rounds (see _fold_best)."""
    import re as _re

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from benchdiff import load_bench

    docs = []
    for path in sorted(os.listdir(REPO)):
        if not _re.match(r"BENCH_r\d+\.json$", path):
            continue
        try:
            docs.append((path, load_bench(os.path.join(REPO, path))))
        except (Exception, SystemExit):
            # r2/r3 recorded truncated tails with no parseable JSON —
            # load_bench raises SystemExit for those, not Exception
            continue
    return _fold_best(docs)


#: Durable per-query best wall FOR THE CURRENT PLAN SIGNATURE.
#: BENCH_r{N}.json round records are the driver's 2000-char compact
#: tails — per-query plan signatures do NOT survive in them — so the
#: same-plan baseline the adjudicator needs when the all-time best
#: round predates signatures (r1-r3) is kept here instead, committed
#: to git and rolled forward by every bench run: a matching signature
#: lowers the stored best; a changed signature RESETS the entry (a
#: new plan starts its own baseline).
BEST_PATH = os.path.join(REPO, "BENCH_BEST.json")


def _load_best_by_sig() -> dict:
    try:
        with open(BEST_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _update_best_by_sig(timings: dict, plan_sigs: dict,
                        adjudications: dict) -> None:
    best = _load_best_by_sig()
    for name, t in timings.items():
        sig = plan_sigs.get(name)
        if sig is None or t <= 0:
            continue
        # an isolated re-probe is a cleaner sample than the in-suite
        # wall — use the smaller of the two, but only when the probe
        # itself ran under the load ceiling
        adj = adjudications.get(name, {})
        probe = adj.get("probe")
        clean_probe = (probe is not None
                       and adj.get("probe_load", 99.0)
                       < PROBE_LOAD_CEILING)
        # seeding (resetting an entry to a new signature) holds the
        # probe to the stricter idle bar — a clearing-grade sample
        # (load < 3.0) may refute a regression but must not become
        # the floor later rounds ratchet against (VERDICT r13 item 6)
        seed_probe = (probe is not None
                      and adj.get("probe_load", 99.0)
                      < SEED_LOAD_CEILING)
        wall = min(t, probe) if clean_probe else t
        cur = best.get(name)
        if cur and cur.get("sig") == sig:
            cur["best"] = min(cur["best"], round(wall, 3))
        elif cur is None or seed_probe or name not in adjudications:
            # RESETTING an existing entry to a new signature discards
            # its baseline, so the new number must be a sample worth
            # baselining against: either a solo probe taken under the
            # load ceiling, or an in-suite wall the adjudicator never
            # flagged (i.e. within noise of the all-time best — it
            # cannot be badly suite-inflated). An adjudicated wall
            # with no clean probe keeps the OLD entry: r12's
            # plan-changed branch wrote q2_min_cost_supplier 5.539s
            # (prior best 1.292s) and curation_pipeline 9.504s from
            # in-suite walls — VERDICT r12 item 1. A fresh entry
            # (cur is None) seeds from whatever we have; it can only
            # ratchet downward later.
            best[name] = {"sig": sig, "best": round(wall, 3)}
    with open(BEST_PATH, "w") as f:
        json.dump(dict(sorted(best.items())), f, indent=1)
        f.write("\n")


def _adjudicate(registry, spark, timings, plan_sigs, gc,
                best_known=None, best_by_sig=None,
                contended=False) -> dict:
    """Pre-adjudicate regressions (VERDICT r5 item 7): any query >=
    ADJ_RATIO× its best recorded round gets (a) a plan-signature
    check — a changed plan is an EXPECTED shift, not steal — then (b)
    an immediate isolated re-probe (min of 2, suite contention gone).
    A probe back near best ⇒ the bench sample hit box steal; a probe
    that reproduces ⇒ real, investigate. Verdicts ship inside the
    bench artifact so no round burns a turn on contention ghosts."""
    import time as _time

    # injectable for the synthetic adjudication tests
    best, rnd, old_sigs, first_sigs = best_known or _best_known()
    if best_by_sig is None:
        best_by_sig = _load_best_by_sig()
    out = {}

    def _solo_probe(name, entry, ceiling=PROBE_LOAD_CEILING):
        """Isolated re-run (min of 2) with a bounded drain-wait down
        to ``ceiling``; the sample and its start load ship in the
        entry. Seeding probes pass SEED_LOAD_CEILING — they wait for
        a genuinely idle box (and if it never drains, the recorded
        load makes _update_best_by_sig refuse the reset)."""
        # the probe's whole point is a contention-free sample, but
        # straight after the suite the 1-min load is still 10+ and
        # the probe itself reads 2x its settled wall (observed:
        # embedding_neardup_exact probe 1.76 s at load 12.8 vs
        # 1.04 s settled — a 'real' verdict on a ghost). Wait,
        # bounded, for the box to drain before sampling.
        # no drain-wait on a contended run: the start-of-run wait
        # already failed, and the verdict is capped anyway — don't
        # burn 90 s per adjudication confirming the box is busy
        for _ in range(0 if contended else 18):
            if os.getloadavg()[0] < ceiling:
                break
            _time.sleep(5)
        start_load = os.getloadavg()[0]
        probe = None
        for _ in range(2):
            t0 = _time.time()
            registry[name].spark(spark, SF_DIR) \
                .write.mode("overwrite").format("noop").save()
            dt = _time.time() - t0
            probe = dt if probe is None else min(probe, dt)
            spark.catalog.clearCache()
            gc.collect()
        entry["probe"] = round(probe, 3)
        # the ratchet gate: a probe at-or-above the ceiling at START
        # is not a clean sample (recorded from the start load, not
        # the after-load, so the probe's own work can't convict it)
        entry["probe_load"] = round(start_load, 2)
        return probe, start_load

    for name, t in timings.items():
        b = best.get(name)
        if b is None or t <= 0 or t / b < ADJ_RATIO \
                or max(t, b) < ADJ_FLOOR_S:
            continue
        # the additive-variance margin silences sub-second ghosts —
        # but a wall ≥ 2× its all-time best must still adjudicate even
        # inside the margin, so a plan rewrite's re-baseline (verdict
        # 'plan-changed' + best_same_plan) ships IN the artifact
        # instead of reading as an unexplained 2× against a plan that
        # no longer exists (VERDICT r9 item 4: embedding_neardup_pairs
        # 0.37→0.79 s, banded-LSH rewrite, flagged by hand)
        if (t - b) < ADJ_ABS_SLACK_S and t / b < 2.0:
            continue
        entry = {"bench": t, "best": round(b, 3),
                 "best_round": rnd[name].replace(".json", ""),
                 "ratio": round(t / b, 2)}
        # plan-changed baseline: the best round's signature when it
        # recorded one; else the EARLIEST signature-bearing round
        # (pre-signature best rounds — r1..r3 — would otherwise make
        # every deliberate plan rewrite read as 'real'; the r3
        # per-bucket-GEMM rewrite of embedding_neardup_pairs was
        # exactly this misclassification, VERDICT r6 item 5)
        base_sig = old_sigs.get(name)
        if base_sig is None and name in first_sigs:
            base_sig, sig_round = first_sigs[name]
            entry["sig_baseline"] = sig_round.replace(".json", "")
        # when even the fallback signature matches (the plan changed
        # BEFORE signatures existed — r1 best, r3 rewrite, r5 sig),
        # RE-BASELINE against the durable same-plan best: a wall
        # consistent with its own plan's baseline is not a regression,
        # the all-time best simply belongs to a plan that no longer
        # exists (VERDICT r6 item 5, second remedy)
        same = best_by_sig.get(name)
        b_same = (same["best"] if same
                  and same.get("sig") == plan_sigs.get(name) else None)
        if base_sig is not None and base_sig != plan_sigs.get(name):
            entry["verdict"] = "plan-changed"
            # a changed signature will RESET this query's BENCH_BEST
            # entry, and an in-suite wall is suite-inflated (r12 wrote
            # q2_min_cost_supplier 5.539s / curation_pipeline 9.504s
            # this way — VERDICT r12 item 1): take the solo probe so
            # the re-baseline comes from a clean sample. Skipped on a
            # contended run (no ratchet happens anyway) and when the
            # stored same-sig baseline already exists (no reset).
            if not contended and b_same is None and registry is not None:
                _solo_probe(name, entry, ceiling=SEED_LOAD_CEILING)
        elif b_same is not None and (t / b_same < ADJ_RATIO
                                     or t - b_same < ADJ_ABS_SLACK_S):
            entry["best_same_plan"] = b_same
            entry["verdict"] = "plan-changed"
        else:
            probe, probe_start_load = _solo_probe(name, entry)
            ref = b_same if b_same is not None else b
            if b_same is not None:
                entry["best_same_plan"] = b_same
            if probe > t:
                # an ISOLATED run cannot be slower than the same query
                # inside a busy suite — a probe above the in-suite wall
                # means the box never drained (observed: source_overlap
                # probe 5.88 s vs in-suite 2.93 s at load 4.9, shipped
                # as 'real' on a ghost). Say so instead of convicting.
                entry["verdict"] = "probe-invalid"
            elif probe / ref < ADJ_RATIO \
                    or probe - ref < ADJ_ABS_SLACK_S:
                entry["verdict"] = "steal"
            elif contended or probe_start_load >= PROBE_LOAD_CEILING:
                # a loaded box cannot convict: the suite sample AND
                # the solo re-probe both ran under external load, so
                # "it reproduces" proves nothing (VERDICT r11: the
                # driver's load-7.05 pass labeled 7 ghosts 'real';
                # the quiet same-tree run refuted every one). Ship
                # the context; a quiet round re-adjudicates.
                entry["verdict"] = "contended"
            else:
                entry["verdict"] = "real"
        out[name] = entry
    return out


def main() -> None:
    # drain-wait BEFORE any Spark work: give a transient external
    # spike DRAIN_WAIT_S to clear; a load that persists marks the
    # whole run contended (recorded in the artifact, blocks 'real'
    # verdicts and the BENCH_BEST ratchet)
    waited = 0
    while waited < DRAIN_WAIT_S:
        l1, l5, _ = os.getloadavg()
        if l1 < CONTENDED_LOAD_1M and l5 < CONTENDED_LOAD_5M:
            break
        time.sleep(5)
        waited += 5
    l1, l5, _ = os.getloadavg()
    load_start = round(l1, 2)
    load_start_5m = round(l5, 2)
    # gate on BOTH averages: a just-vacated box reads 1-min ~0 while
    # the 5-min average still carries the previous tenant's heat, and
    # probes launched into that tail run at load 2-10 (the r12 "quiet"
    # run: 1-min 0.05, 5-min 3.91 — VERDICT r12 item 2)
    contended = (load_start >= CONTENDED_LOAD_1M
                 or load_start_5m >= CONTENDED_LOAD_5M)
    if contended:
        print(f"# bench contended: load {load_start} (1m) / "
              f"{load_start_5m} (5m) vs gates {CONTENDED_LOAD_1M}/"
              f"{CONTENDED_LOAD_5M} after {waited}s drain-wait — "
              "verdicts capped at 'contended', no ratchet",
              file=sys.stderr)
    registry = load_all()
    spark = get_spark("bench")
    # Warm up the JVM / parquet footer caches AND the Python worker pool
    # (first pandas-UDF query otherwise pays ~10 s of worker forking)
    # outside the timed region.
    from rsyslog_nginx_clickhouse_spark.catalog import load
    load(spark, SF_DIR, "lineitem").count()
    import pandas as pd  # noqa: F401

    def _noop(batches):
        # importing the package inside the worker warms the worker
        # POOL, not just the fork: the first registry query whose UDF
        # closure references package modules otherwise pays ~1 s × 32
        # workers of simultaneous cold imports (measured: a 5 000-row
        # decode query profiled at 294 s task CPU on a cold pool vs a
        # 1.2 s same-plan floor). min-of-2 already kept it out of the
        # recorded minimums; this keeps it out of pass-1 samples and
        # solo probes too.
        import rsyslog_nginx_clickhouse_spark.operators.multimodal  # noqa: F401
        for b in batches:
            yield b

    spark.range(64).repartition(32).mapInPandas(
        _noop, schema="id long").count()
    # ... and the rest of the heavy-query machinery, so the first
    # registry entry that uses it isn't charged the one-time setup
    # (grouped-Arrow python workers, broadcast-exchange thread pool,
    # checkpoint block manager): whichever query runs first shifts
    # with the front-load rotation, and per-query numbers should be
    # comparable across rounds.
    warm = spark.range(64).selectExpr("id", "id % 8 AS g")

    def _warm_grouped(pdf):
        # same package-import warm-up for the grouped-apply worker
        # pool (a separate pool from the iterator one above)
        import rsyslog_nginx_clickhouse_spark.operators.similarity  # noqa: F401
        return pdf

    warm.groupBy("g").applyInPandas(
        _warm_grouped, schema="id long, g long").count()
    from pyspark.sql.functions import broadcast
    warm.join(broadcast(spark.range(8).selectExpr("id AS g")),
              "g").count()
    warm.localCheckpoint(eager=True).count()

    import gc

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    timings: dict[str, float] = {}
    plan_sigs: dict[str, str] = {}
    dead: set[str] = set()
    # box load recorded at start and after each pass: a reader of
    # BENCH_r{N}.json can separate microVM steal (load >> local work)
    # from a real regression without re-running anything (VERDICT r4
    # item 8 / PLANS.md variance note)
    loads = [load_start]
    # min over INTERLEAVED passes (pass 1 runs every query, then pass 2
    # runs every query): a contention spike taxes one pass of many
    # queries instead of both samples of the same query, so the min
    # survives it. Back-to-back same-query iterations shared the spike.
    for it in range(iters):
        if it:
            # re-drain between passes (untimed, bounded): let the
            # previous pass's own 1-min heat — or a mid-run co-tenant
            # spike — decay before the next pass samples, so pass-2
            # minimums are as clean as pass-1's (VERDICT r14 item 4)
            redrained = 0
            while redrained < REDRAIN_WAIT_S \
                    and os.getloadavg()[0] >= CONTENDED_LOAD_1M:
                time.sleep(5)
                redrained += 5
        for name, q in registry.items():
            if name in dead:
                continue
            try:
                t0 = time.time()
                df = q.spark(spark, SF_DIR)
                # noop sink: forces evaluation of EVERY output column
                # (count() lets Catalyst prune the projections being
                # benchmarked), writes nothing.
                df.write.mode("overwrite").format("noop").save()
                dt = round(time.time() - t0, 3)
                prev = timings.get(name)
                timings[name] = dt if prev is None else min(prev, dt)
                if name not in plan_sigs:
                    plan_sigs[name] = _plan_sig(df)
            except Exception as e:  # report, don't abort the bench
                timings[name] = -1.0
                dead.add(name)
                # one stderr line, no multiline tracebacks: a failed
                # round must not garble the stdout JSON or flood logs
                msg = " ".join(str(e).split())[:300]
                print(f"# bench error {name}: {type(e).__name__}: {msg}",
                      file=sys.stderr)
            # Release per-query state so later queries aren't
            # taxed by leftover executor memory: clearCache drops
            # CacheManager entries, and gc.collect() releases the
            # Python DataFrame wrappers so ContextCleaner can free
            # localCheckpoint blocks (which clearCache does NOT
            # touch — they'd otherwise accumulate across the suite)
            spark.catalog.clearCache()
            gc.collect()
        loads.append(round(os.getloadavg()[0], 2))
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    failed = sorted(n for n, t in timings.items() if t < 0)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    adjudications = _adjudicate(registry, spark, timings, plan_sigs,
                                gc, contended=contended)
    if not contended:
        # a contended pass must not ratchet: minimums can't improve
        # under load, but a NEW plan signature would otherwise reset
        # its BENCH_BEST baseline to a load-inflated sample
        _update_best_by_sig(timings, plan_sigs, adjudications)
    out = {
        "metric": "query_set_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "iters": iters,
        "load_avg": loads,
        "load_5m_start": load_start_5m,
        "plan_sig": plan_sigs,
    }
    if contended:
        out["contended"] = True
    if adjudications:
        out["adjudications"] = adjudications
    if failed:
        # a crashed query must not read as a speedup of the total
        out["failed"] = failed
    # COMPLETE result object → file (survives any stdout truncation)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_LAST.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    # stdout line: fit the driver's 2000-char tail window. Keep the
    # headline intact and greedily include the slowest queries until
    # the serialized line would exceed the budget.
    budget = 1700
    compact = dict(out)
    compact.pop("plan_sig", None)  # full table lives in BENCH_LAST
    if adjudications:
        # verdicts are the headline — always in the recorded tail
        compact["adjudications"] = {
            n: a["verdict"] for n, a in adjudications.items()}
    compact["queries"] = {}
    compact["queries_file"] = "BENCH_LAST.json"
    for name in sorted(timings, key=lambda n: -timings[n]):
        trial = dict(compact)
        trial["queries"] = {**compact["queries"], name: timings[name]}
        trial["queries_omitted"] = len(timings) - len(trial["queries"])
        if len(json.dumps(trial)) > budget:
            break
        compact = trial
    compact["queries_omitted"] = len(timings) - len(compact["queries"])
    # single parseable line, last on stdout: drain stderr first so an
    # interleaving log line can't split the JSON mid-string
    sys.stderr.flush()
    sys.stdout.flush()
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
