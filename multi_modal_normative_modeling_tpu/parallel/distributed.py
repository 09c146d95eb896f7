"""Multi-process (multi-host) initialization helpers.

A single v5e slice is driven by one process per host; this module wraps
jax.distributed initialization and builds the ('fold', 'data') mesh over the
global device set so the fold-parallel trainer scales past one host without
code changes: parameters shard over 'fold' (no cross-fold communication at
all), and the only collective — the grad psum over 'data' — stays on ICI
within the slice (SURVEY.md §2.6).

Single-host (or single-process) callers can skip this module entirely;
parallel.mesh.make_mesh over jax.devices() is equivalent there.
"""
from __future__ import annotations

import os
from typing import Optional

from .mesh import make_mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on Cloud
    TPU all three are auto-detected and may be omitted)."""
    import jax

    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def global_fold_mesh(n_folds: int):
    """('fold', 'data') mesh over the GLOBAL device set (all processes).

    Folds land on whole hosts when device counts allow, so per-fold training
    never crosses hosts; remaining devices widen the 'data' axis.
    """
    import jax

    devices = jax.devices()
    local = max(1, jax.local_device_count())

    def host_aligned(cand: int) -> bool:
        # fold rows span whole hosts only when the 'data' width divides the
        # per-host device count or is a multiple of it
        n_data = len(devices) // cand
        return n_data % local == 0 or local % n_data == 0

    candidates = [c for c in range(min(n_folds, len(devices)), 0, -1)
                  if len(devices) % c == 0]
    # prefer the largest host-aligned factorization (per-fold collectives
    # then ride intra-host ICI, not DCN); fall back to the largest divisor
    n_fold = next((c for c in candidates if host_aligned(c)),
                  candidates[0] if candidates else 1)
    return make_mesh(n_fold=n_fold, devices=devices)
