"""Per-query bench regression diff.

Compares a current bench result against a baseline (e.g. the previous
round's BENCH_r{N}.json) and flags per-query slowdowns — the total can
hide a 5× regression in one operator behind noise in fifty fast ones.

    python tools/benchdiff.py BENCH_r01.json [current.json]

With one argument, runs ``bench.py`` now and diffs against the given
baseline. Accepts either bench.py's raw one-line JSON or the driver's
wrapper ({"tail": "...<json line>..."}). Exit 1 if any query regressed
beyond THRESHOLD (new queries and sub-0.3 s jitter are reported but
never fatal — at sf0.1 per-query times under ~0.3 s are dominated by
Spark fixed overhead and scheduler noise, not the operator).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

THRESHOLD = 1.5
NOISE_FLOOR_S = 0.3


def load_bench(path: str) -> dict:
    """Extract the bench JSON from a raw bench line or driver wrapper.

    Since r4 bench.py's stdout line is a COMPACT subset (slowest
    queries only, to fit the driver's 2000-char tail window) pointing
    at the complete object via "queries_file"; follow that pointer
    when the file is available so the diff covers every query.
    """
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc:
        m = re.search(r'\{"metric".*\}', doc.get("tail", ""))
        if not m:
            raise SystemExit(f"{path}: no bench JSON found")
        doc = json.loads(m.group(0))
    qf = doc.get("queries_file")
    if qf:
        for cand in (os.path.join(os.path.dirname(path), qf), qf):
            if os.path.exists(cand):
                with open(cand) as f:
                    full = json.load(f)
                # the pointer target is overwritten by every bench run
                # — only trust it when it is the SAME run (else two
                # different round records would silently both resolve
                # to the current file and diff as all-zeros)
                if full.get("value") == doc.get("value") \
                        and full.get("sf") == doc.get("sf"):
                    return full
                print(f"# note: {cand} is from a different run "
                      f"(value {full.get('value')} != {doc.get('value')})"
                      f" — using the compact record from {path}")
                break
    return doc


def run_bench() -> dict:
    repo = os.path.join(os.path.dirname(__file__), os.pardir)
    subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                   capture_output=True, text=True, check=True)
    with open(os.path.join(repo, "BENCH_LAST.json")) as f:
        return json.load(f)


def best_known_baseline() -> dict:
    """Synthetic baseline: per-query BEST wall across every recorded
    BENCH_r*.json round (VERDICT r5 item 7) — the hardest honest bar,
    immune to one slow round resetting expectations."""
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir)
    best: dict[str, float] = {}
    for path in sorted(os.listdir(repo)):
        if not re.match(r"BENCH_r\d+\.json$", path):
            continue
        try:
            doc = load_bench(os.path.join(repo, path))
        except (Exception, SystemExit):
            # r2/r3 recorded truncated tails; load_bench raises
            # SystemExit (not Exception) for those — same handling
            # as bench._best_known
            continue
        for name, t in doc.get("queries", {}).items():
            if t and t > 0 and (name not in best or t < best[name]):
                best[name] = t
    return {"value": round(sum(best.values()), 3), "queries": best}


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    if sys.argv[1] == "--best":
        base = best_known_baseline()
    else:
        base = load_bench(sys.argv[1])
    cur = load_bench(sys.argv[2]) if len(sys.argv) > 2 else run_bench()
    bq, cq = base["queries"], cur["queries"]
    regressed = []
    for name, t in sorted(cq.items()):
        b = bq.get(name)
        if b is None:
            print(f"  NEW  {name}: {t:.2f}s")
            continue
        if b <= 0 or t <= 0:
            print(f"  ERR  {name}: base={b} cur={t}")
            continue
        ratio = t / b
        tag = "  ok "
        # ABS_SLACK mirrors bench.ADJ_ABS_SLACK_S: run variance is
        # additive fixed overhead, so a sub-second query 1.5x above
        # its luckiest-ever sample is noise, not a regression
        if ratio >= THRESHOLD and (t - b) >= 0.6 \
                and max(t, b) >= NOISE_FLOOR_S:
            tag = "SLOW "
            regressed.append((name, b, t, ratio))
        elif ratio <= 1 / THRESHOLD and max(t, b) >= NOISE_FLOOR_S:
            tag = "FAST "
        print(f"{tag} {name}: {b:.2f}s -> {t:.2f}s ({ratio:.2f}x)")
    gone = sorted(set(bq) - set(cq))
    for name in gone:
        print(f"  GONE {name} (was {bq[name]:.2f}s)")
    print(f"\ntotal: {base['value']:.1f}s -> {cur['value']:.1f}s; "
          f"{len(regressed)} regressed >{THRESHOLD}x")
    for name, b, t, r in sorted(regressed, key=lambda x: -x[3]):
        print(f"  REGRESSION {name}: {b:.2f}s -> {t:.2f}s ({r:.2f}x)")
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
