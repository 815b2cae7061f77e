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
    # helper-coverage: a changed token with its only exercising row
    # OUTSIDE the window fires; window-resident row passes; a token
    # no row exercises fires the add-a-row message; ignored/absent
    # tokens are silent
    blobs = {"r1": "SELECT windowFunnel(10)(ts, a, b) FROM t",
             "r2": "SELECT anyLast(v) FROM s"}
    bad = check_helper_coverage({"anyLast"}, blobs, {"r1"})
    assert any("window-resident" in x and "r2" in x for x in bad), bad
    assert check_helper_coverage({"anyLast"}, blobs, {"r2"}) == []
    bad = check_helper_coverage({"groupArray"}, blobs, {"r1", "r2"})
    assert any("NO registry row" in x for x in bad), bad
    assert check_helper_coverage(set(), blobs, set()) == []
    # substring tokens don't cross word boundaries (anyLastIf is not
    # an anyLast hit)
    bad = check_helper_coverage({"anyLastIf"},
                                {"r2": "anyLast(v)"}, {"r2"})
    assert any("NO registry row" in x for x in bad), bad
    print("rotationcheck selftest ok")


#: pyspark/python API camelCase names that legitimately appear in
#: helper diffs and row sources but are NOT ClickHouse surface tokens
#: — excluded from the helper-coverage check below (extend as needed;
#: a ubiquitous token self-neutralizes anyway since some window row
#: almost surely contains it, so this list only needs the rare ones)
_HELPER_TOKEN_IGNORE = {
    "createOrReplaceTempView", "getOrCreate", "orderBy", "groupBy",
    "withColumn", "withColumnRenamed", "applyInPandas", "mapInPandas",
    "partitionBy", "rowsBetween", "rangeBetween", "localCheckpoint",
    "approxQuantile", "getsource", "fullmatch", "finditer",
    "lstrip", "rstrip", "startswith", "endswith", "getloadavg",
    "isStreaming", "readStream", "writeStream", "foreachBatch",
    "outputMode", "queryName", "sparkSession",
    # ClickHouse INTERNALS cited in docstrings (Moments.h accessors),
    # not user-facing surface
    "getMoment3", "getMoment4", "getSample", "getPopulation",
}

#: camelCase word: the ClickHouse function-name shape (windowFunnel,
#: groupArray, anyLast, uniqState, toYYYYMMDD, …); snake_case Python
#: and UpperCamel class names don't match. ASCII-only so docstring
#: math glyphs (varSamp²) can't extend a token.
_CAMEL_RE = re.compile(r"\b[a-z][a-z0-9]*[A-Z][A-Za-z0-9_]*\b",
                       re.ASCII)


def _changed_helper_tokens(boundary: str) -> set[str]:
    """CamelCase tokens on lines added/removed in the rewrite layer
    (``functions/*.py``) since the round-boundary commit — the
    mechanical 'which CH spellings did this round's helper edits
    touch' signal (round 14, VERDICT r13 item 7: two r13 helper-only
    commits changed emitted rewrites without flagging any row
    text-changed, one of them a real bug)."""
    diff = _git("diff", boundary, "--",
                "rsyslog_nginx_clickhouse_spark/functions/")
    toks: set[str] = set()
    for line in diff.splitlines():
        if line.startswith(("+", "-")) \
                and not line.startswith(("+++", "---")):
            # strip regex escapes first: the \b in a pattern source
            # would otherwise mint a 'bcountState' token
            toks |= set(_CAMEL_RE.findall(
                re.sub(r"\\[A-Za-z]", " ", line)))
    return toks - _HELPER_TOKEN_IGNORE


def check_helper_coverage(tokens: set[str],
                          row_blobs: dict[str, str],
                          window_names: set[str]) -> list[str]:
    """Pure policy: every changed-helper token that any registry row
    exercises must have at least one exercising row INSIDE the
    verification window; a token NO row exercises is the
    groupArray(N) failure mode (helper shipped with pytest-only
    coverage) and flags too. Tokens exercised only via other tokens'
    rows pass when one of those rows sits in the window."""
    v = []
    for tok in sorted(tokens):
        rx = re.compile(rf"\b{re.escape(tok)}\b")
        rows = [n for n, blob in row_blobs.items() if rx.search(blob)]
        if not rows:
            v.append(
                f"helper token {tok}: changed in functions/*.py this "
                f"round but NO registry row exercises it — add a row "
                f"(or, for a non-surface token, extend "
                f"_HELPER_TOKEN_IGNORE)")
        elif not any(n in window_names for n in rows):
            v.append(
                f"helper token {tok}: changed in functions/*.py this "
                f"round but none of its {len(rows)} exercising row(s) "
                f"is window-resident — rotate one in (edit its doc= "
                f"to force text-changed); candidates: "
                f"{', '.join(sorted(rows)[:4])}")
    return v


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
    # helper-coverage mode (round 14, VERDICT r13 item 7): rewrite
    # helpers changed since the last round boundary must have a
    # window-resident row exercising their tokens — the blind spot
    # the source-hash check above cannot see (a helper edit leaves
    # every row's own source byte-identical)
    n_helper = 0
    if commits:
        import inspect as _inspect

        boundary = commits[max(commits)]
        tokens = _changed_helper_tokens(boundary)
        blobs = {n: _inspect.getsource(q.spark) + "\0"
                 + (q.oracle or "") for n, q in qmod.load_all().items()}
        hv = check_helper_coverage(tokens, blobs, set(ordered[:WINDOW]))
        n_helper = len(hv)
        violations += hv
    for v in violations:
        print("VIOLATION " + v)
    print(f"rotationcheck: {len(head)} queries, "
          f"{len([n for n in head if n not in last_round])} new, "
          f"{len(mandatory)} mandatory, {len(violations)} violations "
          f"({n_helper} helper-coverage)")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
