"""Multi-host process-group bootstrap.

The communication backend is XLA's collective runtime over ICI/DCN; process
groups are formed by ``jax.distributed`` (SURVEY.md §5: the reference has no
distributed machinery — this subsystem is new).  On a pod slice, call
:func:`initialize` once per host before any device use; single-process runs are
a no-op.  Meshes built afterwards (parallel/mesh.py) span all hosts' devices,
and the sharded lifecycle / distributed NTT work unchanged — shard_map
collectives ride ICI within a slice and DCN across slices.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-process.

    With no arguments, reads the standard JAX env vars / cloud metadata and
    no-ops for single-process runs (so library code can call this
    unconditionally).
    """
    import jax

    if num_processes is None and coordinator_address is None:
        env_np = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("NUM_PROCESSES")
        if env_np is None or int(env_np) <= 1:
            return  # single process — nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multi_process() -> bool:
    import jax

    return jax.process_count() > 1
