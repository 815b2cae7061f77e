"""Rotation-invariant checker: the staleness policy, executable.

The driver verifies only the FIRST ``WINDOW`` entries of ``load_all()``
per round, so the registry's ``_FRONTLOAD_R{N}`` ordering IS the
round's verification coverage. The policy lived in a comment
(queries/__init__.py) and a q9-style oracle-constant rename slipped
past it in r5 (VERDICT r5 item 8). This tool makes it fail loudly:

1. every NEW query (no green CORRECTNESS row in any round) and every
   TEXT-CHANGED query (resolved function source + oracle differs from
   the tree its last green row verified) must sit in the window;
2. the remaining slots fill oldest-verified-first: no query outside
   the window may carry an OLDER last-verified round than a
   non-mandatory query inside it.

"Text-changed" is computed against the per-round boundary trees
(``round N: verdict/...`` commits): each boundary tree is checked out
to a temp worktree and its registry imported in a subprocess, so
oracle strings BUILT BY HELPERS resolve fully — a helper edit that
changes the emitted SQL flags the query even though its decorator
text is byte-identical (the failure mode ast/span diffing misses).

Usage: python tools/rotationcheck.py [--selftest]
Exit nonzero on violations. gate.sh runs it.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50

_DUMP_SNIPPET = r"""
import hashlib, inspect, json, sys
sys.path.insert(0, sys.argv[1])
from rsyslog_nginx_clickhouse_spark.queries import load_all
out = {}
for n, q in load_all().items():
    blob = inspect.getsource(q.spark) + "\0" + (q.oracle or "")
    out[n] = hashlib.md5(blob.encode()).hexdigest()
print(json.dumps(out))
"""


def check_rotation(ordered_names: list[str], last_round: dict[str, int],
                   mandatory: set[str], window: int = WINDOW) -> list[str]:
    """Pure policy check → list of violations (empty = compliant).

    ordered_names: full load_all() ordering; last_round: query →
    latest green driver round (absent = never verified); mandatory:
    new/text-changed queries that MUST be verified this round."""
    win = ordered_names[:window]
    win_set = set(win)
    v = []
    for name in sorted(mandatory):
        if name not in win_set:
            v.append(f"{name}: new/text-changed but outside the "
                     f"first-{window} verification window")
    for name in ordered_names:
        if name not in last_round and name not in mandatory:
            v.append(f"{name}: never driver-verified yet not marked "
                     "mandatory (caller bug)")
    optional_in = [n for n in win if n not in mandatory]
    outside = [n for n in ordered_names[window:] if n in last_round]
    if optional_in and outside:
        oldest_out = min(outside, key=lambda n: last_round[n])
        r_out = last_round[oldest_out]
        for n in optional_in:
            if last_round.get(n, 0) > r_out:
                v.append(
                    f"{n} (verified r{last_round[n]}) holds a window "
                    f"slot while older {oldest_out} (r{r_out}) rotates "
                    "past — fill remaining slots oldest-first")
    return v


def _selftest() -> None:
    """Synthetic fixtures — the tool must FAIL on a stale rotation."""
    lr = {"a": 3, "b": 4, "c": 5, "d": 5}
    # compliant: new query first, then oldest; newest outside
    assert check_rotation(["n", "a", "b", "c", "d"], lr, {"n"},
                          window=3) == []
    # stale: text-changed query left outside the window
    bad = check_rotation(["a", "b", "c", "n"], lr, {"n"}, window=3)
    assert any("outside the first-3" in x for x in bad), bad
    # stale: newer query occupies the slot the oldest one needed
    bad = check_rotation(["n", "c", "d", "a", "b"], lr, {"n"}, window=3)
    assert any("oldest-first" in x and x.startswith(("c", "d"))
               for x in bad), bad
    # unverified-but-unmarked is flagged as a caller bug
    bad = check_rotation(["x", "a", "b", "c", "d"], lr, set(), window=5)
    assert any("caller bug" in x for x in bad), bad
    print("rotationcheck selftest ok")


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, check=True,
                          capture_output=True, text=True).stdout


def _round_commits() -> dict[int, str]:
    out = {}
    for line in _git("log", "--format=%h %s").splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m and int(m.group(2)) not in out:
            out[int(m.group(2))] = m.group(1)
    return out


def _last_green_rounds() -> dict[str, int]:
    last = {}
    for path in sorted(os.listdir(REPO)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(os.path.join(REPO, path)) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = (row.get("err") is None and row.get("rows_match")
                  and row.get("hash_match", True))
            if ok:
                last[name] = max(last.get(name, 0), int(m.group(1)))
    return last


def _dump_hashes(tree_dir: str) -> dict[str, str]:
    r = subprocess.run([sys.executable, "-c", _DUMP_SNIPPET, tree_dir],
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"registry dump failed for {tree_dir}:\n"
                           f"{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def _hashes_at(commit: str) -> dict[str, str]:
    wt = tempfile.mkdtemp(prefix=f"rot_{commit}_")
    os.rmdir(wt)
    _git("worktree", "add", "--detach", "--force", wt, commit)
    try:
        return _dump_hashes(wt)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)


def main() -> int:
    if "--selftest" in sys.argv:
        _selftest()
        return 0
    import rsyslog_nginx_clickhouse_spark.queries as qmod

    rounds = [int(m.group(1)) for a in dir(qmod)
              if (m := re.match(r"_FRONTLOAD_R(\d+)$", a))]
    frontload = getattr(qmod, f"_FRONTLOAD_R{max(rounds)}")
    ordered = list(qmod.load_all().keys())
    assert ordered[:len(frontload)] == list(frontload)

    last_round = _last_green_rounds()
    head = _dump_hashes(REPO)
    commits = _round_commits()
    mandatory = {n for n in head if n not in last_round}  # new
    for rnd in sorted({r for r in last_round.values()}):
        if rnd not in commits:
            # untraceable boundary: conservatively treat its queries
            # as changed so they re-verify
            mandatory |= {n for n, r in last_round.items() if r == rnd}
            continue
        old = _hashes_at(commits[rnd])
        for name, r in last_round.items():
            if r == rnd and old.get(name) != head.get(name):
                mandatory.add(name)
    mandatory &= set(head)  # drop queries deleted since their row

    violations = check_rotation(ordered, last_round, mandatory)
    for v in violations:
        print("VIOLATION " + v)
    print(f"rotationcheck: {len(head)} queries, "
          f"{len([n for n in head if n not in last_round])} new, "
          f"{len(mandatory)} mandatory, {len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
