"""Runtime loaders for user-editable parser config.

The reference treats its parse rule and its lookup table as CONFIG the
user edits, not code (/root/reference/README.md:49 tells users to
extend the rule per added field):

- ``nginx.rule`` — a liblognorm v2 rulebase (``version=2`` header, one
  ``rule=`` line; loaded by rsyslog's mmnormalize). The engine
  previously hardcoded its regex transliteration
  (sources/nginx_log.py:36); this module compiles the SAME regex shape
  from the rule file at runtime, so a user who edits their rule file
  gets the new parser without touching engine source.
- ``nginx.table`` — an rsyslog lookup-table JSON
  (/root/reference/nginx.table:1: ``{"version":1, "nomatch":"unk",
  "type":"string", "table":[{"index":..,"value":..}, ...]}``; loaded by
  ``lookup_table(...)`` at nginx.conf:1). Previously the 12-entry month
  map was a literal (sources/lookup.py:27).

Scale note: both loads happen ONCE on the driver at plan-build time;
the compiled regex and the lookup map travel to executors inside the
serialized plan (literal expressions), so runtime config costs nothing
per row and nothing per executor beyond the plan broadcast.

Token → regex mapping (the 5 liblognorm field types the reference rule
uses, nginx.rule:3):

=============  =====================  =============================
token          regex                  liblognorm semantics
=============  =====================  =============================
``word``       ``\\S+``               chars up to next space
``char-to:C``  ``[^C]*``              chars up to (not incl.) ``C``
``number``     ``\\d+``               decimal digits
``float``      ``\\d+(?:\\.\\d+)?``   digits w/ optional fraction
``rest``       ``.*``                 everything remaining
=============  =====================  =============================

Unknown token types raise — a silently-skipped field would shift every
later capture group and corrupt the typed table.
"""

from __future__ import annotations

import json
import re
from collections.abc import Mapping
from dataclasses import dataclass

#: token type → regex fragment builder (extra arg used by char-to only)
_TOKEN_REGEX = {
    "word": lambda extra: r"\S+",
    "char-to": lambda extra: f"[^{re.escape(extra)}]*",
    "number": lambda extra: r"\d+",
    "float": lambda extra: r"\d+(?:\.\d+)?",
    "rest": lambda extra: r".*",
}


@dataclass(frozen=True)
class CompiledRule:
    """One rulebase rule compiled to an anchored regex.

    ``fields[i]`` names capture group ``i+1`` of ``regex``.
    """

    regex: str
    fields: tuple[str, ...]
    tags: tuple[str, ...] = ()


def compile_rule(pattern: str, tags: tuple[str, ...] = ()) -> CompiledRule:
    """Compile one liblognorm v2 rule pattern to a ``CompiledRule``.

    The pattern is literal text interleaved with ``%name:type%`` or
    ``%name:type:extra%`` tokens; ``%%`` is a literal percent. Literal
    text is regex-escaped; each token becomes one capture group.
    """
    parts: list[str] = ["^"]
    fields: list[str] = []
    i, n = 0, len(pattern)
    lit: list[str] = []

    def flush_literal() -> None:
        if lit:
            parts.append(re.escape("".join(lit)))
            lit.clear()

    while i < n:
        ch = pattern[i]
        if ch != "%":
            lit.append(ch)
            i += 1
            continue
        if pattern.startswith("%%", i):  # escaped literal percent
            lit.append("%")
            i += 2
            continue
        end = pattern.find("%", i + 1)
        if end < 0:
            raise ValueError(f"unterminated %token% at offset {i}: "
                             f"{pattern[i:i + 30]!r}")
        body = pattern[i + 1:end]
        # name:type[:extra] — extra may contain ':' (take at most 3)
        name, sep, rest = body.partition(":")
        if not sep or not name:
            raise ValueError(f"malformed token {('%' + body + '%')!r}: "
                             "expected %name:type[:extra]%")
        ftype, _, extra = rest.partition(":")
        builder = _TOKEN_REGEX.get(ftype)
        if builder is None:
            raise ValueError(
                f"unsupported liblognorm field type {ftype!r} in token "
                f"{('%' + body + '%')!r}; supported: "
                f"{sorted(_TOKEN_REGEX)}")
        if ftype == "char-to" and len(extra) != 1:
            raise ValueError(
                f"char-to needs exactly one stop char, got {extra!r}")
        flush_literal()
        parts.append(f"({builder(extra)})")
        fields.append(name)
        i = end + 1
    flush_literal()
    parts.append("$")
    regex = "".join(parts)
    re.compile(regex)  # fail at load time, not inside an executor
    if not fields:
        raise ValueError("rule has no fields — nothing to parse")
    return CompiledRule(regex=regex, fields=tuple(fields), tags=tags)


def parse_rulebase(text: str) -> list[CompiledRule]:
    """Parse a liblognorm v2 rulebase file body into compiled rules.

    Honors ``version=2``, blank lines, ``#`` comments, and
    ``rule=[tag,tag]:pattern`` lines (the reference's rule carries no
    tags: ``rule=:...`` — nginx.rule:3). Other directives (prefix=,
    annotate=, include=) are rejected loudly rather than half-applied.
    """
    rules: list[CompiledRule] = []
    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("version="):
            v = line.partition("=")[2].strip()
            if v != "2":
                raise ValueError(f"line {lineno}: only rulebase version=2 "
                                 f"is supported, got {v!r}")
            continue
        if line.startswith("rule="):
            body = line[len("rule="):]
            tagstr, sep, pattern = body.partition(":")
            if not sep:
                raise ValueError(f"line {lineno}: rule= missing ':' "
                                 "between tags and pattern")
            tags = tuple(t for t in tagstr.split(",") if t)
            rules.append(compile_rule(pattern, tags))
            continue
        raise ValueError(f"line {lineno}: unsupported rulebase directive "
                         f"{line.split('=')[0]!r}")
    if not rules:
        raise ValueError("rulebase contains no rule= lines")
    return rules


def load_rulebase(path: str) -> list[CompiledRule]:
    """Read and compile a rulebase file (↔ mmnormalize ruleBase=...)."""
    with open(path, encoding="utf-8") as f:
        return parse_rulebase(f.read())


@dataclass(frozen=True)
class LookupTable:
    """An rsyslog string lookup table: mapping + no-match default."""

    mapping: Mapping[str, str]
    nomatch: str


def parse_lookup_table(text: str) -> LookupTable:
    """Parse rsyslog lookup-table JSON (nginx.table:1 shape).

    Honors ``"nomatch"`` (default ``""`` per rsyslog docs when absent)
    and requires ``type":"string"`` — the only type the reference uses.
    """
    obj = json.loads(text)
    ttype = obj.get("type", "string")
    if ttype != "string":
        raise ValueError(f"only string lookup tables are supported, "
                         f"got type={ttype!r}")
    rows = obj.get("table")
    if not isinstance(rows, list) or not rows:
        raise ValueError("lookup table has no 'table' rows")
    mapping: dict[str, str] = {}
    for row in rows:
        try:
            mapping[str(row["index"])] = str(row["value"])
        except (KeyError, TypeError) as e:
            raise ValueError(f"malformed table row {row!r}") from e
    return LookupTable(mapping=mapping, nomatch=str(obj.get("nomatch", "")))


def load_lookup_table(path: str) -> LookupTable:
    """Read a lookup-table file (↔ lookup_table(file=...), nginx.conf:1)."""
    with open(path, encoding="utf-8") as f:
        return parse_lookup_table(f.read())
