"""Multi-host initialization helpers.

The reference has no distributed backend at all — its "communication" is
POSIX shared memory plus PSOCK task dispatch on one node (SURVEY.md §5.8).
Here multi-host runs use JAX's standard runtime: call
:func:`initialize_distributed` once per host process before building
meshes; every mesh/sharding in ``parallel/`` then spans the global device
set, with pjit/shard_map emitting ICI collectives within a slice and DCN
collectives across hosts.

This module is a thin, documented wrapper (tested only in its
single-process no-op form here — multi-host hardware is exercised by the
driver's dryrun over virtual devices; the call pattern is the standard
``jax.distributed`` one and carries no framework-specific state).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize the multi-host runtime; returns the global device count.

    With no arguments, JAX auto-detects cluster environment variables
    (TPU pod metadata / ``JAX_COORDINATOR_ADDRESS`` etc.); on a single
    host this is a no-op.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def global_mesh(shape: Optional[Sequence[int]] = None):
    """A 2-D ("i","j") mesh over ALL global devices (all hosts)."""
    from .sharded import make_mesh
    return make_mesh(shape=shape, devices=jax.devices())
