"""Executed micro-batch plan capture for the plan auditor.

The streaming registry queries execute their stream INSIDE the query
callable (availableNow run → memory/rollup table) and return the
materialized result, so the DataFrame the auditor explains is just a
LocalTableScan of the sink — ``scans=0`` rows in PLANS.md (VERDICT r5
item 4), the same blind-spot family the audit-mode barrier fix closed
for checkpoints.

Fix: while audit mode is on (plans/barrier.set_audit_mode — plancheck
only), the streaming run chokepoint records the LAST micro-batch's
executed physical plan (``StreamingQuery.explainInternal``) here before
stopping the query; the auditor drains and counts it alongside the
final plan. Per-batch plan shape is identical across an availableNow
run's batches, so the last batch is representative. No-op outside
audit mode — production runs are untouched.
"""

from __future__ import annotations

_plans: list[str] = []


def record_stream_plan(plan: str) -> None:
    _plans.append(plan)


def drain_stream_plans() -> list[str]:
    out = list(_plans)
    _plans.clear()
    return out
