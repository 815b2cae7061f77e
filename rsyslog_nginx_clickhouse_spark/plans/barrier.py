"""Plan barrier: ``localCheckpoint`` with an explain-only audit bypass.

Operators use eager ``localCheckpoint()`` as a materialization barrier
(required where CollapseProject would otherwise inline an expensive
expression into every consumer, and in iterative loops to truncate
O(rounds) lineage). The side effect: a checkpointed DataFrame's plan
starts at the checkpoint read, so the plan auditor (tools/plancheck.py)
saw ``scans=0 exch=0`` for those queries — a blind spot VERDICT r4
item 3 called out.

``barrier(df)`` is the one checkpoint call site for the engine. The
auditor opts in via ``set_audit_mode(True)`` — a module-level flag, NOT
an environment variable (ADVICE r5): an inheritable env var could leak
into a shell running selfcheck/bench/production, where skipping
barriers IS correctness-load-bearing (prefix.py freezes
repartitionByRange sampling behind one; minhash/ngram paths rely on one
to avoid dual evaluation). With the flag set, ``barrier`` returns
``df`` unchanged so the auditor explains the REAL end-to-end plan.

Audit mode is safe only for explain-style use: plans are built and
explained, and the few driver-side probes plancheck triggers (count /
collect of parameter-sized frames) recompute against un-truncated
lineage — acceptable for a diagnostic, wrong for result-producing runs.
``rsyslog_nginx_clickhouse_spark.session.get_spark`` therefore refuses
to start when the legacy ``SPARK_GRAFT_PLAN_AUDIT`` env var is set, so
a stale wrapper script fails loudly instead of silently changing
results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_audit = False


def set_audit_mode(on: bool) -> None:
    """Explain-only mode: plan auditors call this; nothing else should."""
    global _audit
    _audit = on


def audit_mode() -> bool:
    return _audit


def barrier(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` (eager localCheckpoint) unless plan-auditing."""
    if _audit:
        return df
    return df.localCheckpoint(eager=eager)
