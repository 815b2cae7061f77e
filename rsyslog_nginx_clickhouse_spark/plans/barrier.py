"""Plan barrier: ``localCheckpoint`` with an audit-mode bypass.

Operators use eager ``localCheckpoint()`` as a materialization barrier
(required where CollapseProject would otherwise inline an expensive
expression into every consumer, and in iterative loops to truncate
O(rounds) lineage). The side effect: a checkpointed DataFrame's plan
starts at the checkpoint read, so the plan auditor (tools/plancheck.py)
saw ``scans=0 exch=0`` for those queries — a blind spot VERDICT r4
item 3 called out.

``barrier(df)`` is the one checkpoint call site for the engine. With
``SPARK_GRAFT_PLAN_AUDIT=1`` in the environment it returns ``df``
unchanged, so the auditor sees the REAL end-to-end plan (scans,
exchanges, join strategies) while production/selfcheck/bench runs keep
the exact previous checkpoint semantics. Audit mode never executes the
plans it builds, so skipping the barrier cannot change any result.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def audit_mode() -> bool:
    return os.environ.get("SPARK_GRAFT_PLAN_AUDIT", "") == "1"


def barrier(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` (eager localCheckpoint) unless plan-auditing."""
    if audit_mode():
        return df
    return df.localCheckpoint(eager=eager)
