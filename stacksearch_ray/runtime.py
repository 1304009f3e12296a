"""Process-level Ray Data execution tuning.

This sandbox VM advertises 32 vCPUs but measurably degrades beyond ~16
concurrent CPU-bound workers (kernel system-time inflation: 881 CPU-s
system vs 58 CPU-s user at 32 procs — measured, BASELINE.md). Entry
code therefore caps the streaming executor's CPU budget at the thrash
threshold so a 32-cpu driver session never enters the degraded regime.
On a real multi-node cluster this cap corresponds to per-node stage
sizing (concurrency × num_cpus per stage ≤ node cores), not a global
limit — the constant is a host property, not a pipeline property.

Override with GRAFT_CPU_CAP (0 disables the cap entirely).
"""

from __future__ import annotations

import os

_DEFAULT_CAP = 16
_applied: bool = False


def cap_execution_cpus(cap: int | None = None) -> None:
    """Idempotently cap DataContext.execution_options.resource_limits.cpu.

    Safe to call before ray.init (DataContext is a process singleton and
    datasets snapshot it at execution). No-op when the session has fewer
    CPUs than the cap, when the caller already set a tighter limit, or
    when GRAFT_CPU_CAP=0.
    """
    global _applied
    if cap is None:
        cap = int(os.environ.get("GRAFT_CPU_CAP", str(_DEFAULT_CAP)))
    if cap <= 0:
        return
    if _applied:
        return
    from ray.data import DataContext
    from ray.data._internal.execution.interfaces.execution_options import (
        ExecutionResources,
    )

    ctx = DataContext.get_current()
    lim = ctx.execution_options.resource_limits
    cur = lim.cpu
    if cur is None or cur == float("inf") or cur > cap:
        ctx.execution_options.resource_limits = ExecutionResources(
            cpu=float(cap), gpu=lim.gpu,
            object_store_memory=lim.object_store_memory,
            memory=lim.memory)
    _applied = True
