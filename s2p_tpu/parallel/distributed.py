"""Multi-host (multi-slice) bootstrap.

The reference has no distributed backend at all (SURVEY §2.11); the
TPU-native scale-out story is: `jax.distributed` for multi-host process
groups (DCN), one global mesh spanning all hosts' devices (ICI within a
slice), per-host data loading feeding host-local shards. These helpers keep
that bootstrap one call, and are no-ops in single-process runs so the same
entry point works everywhere."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; returns True
    if a process group was created. Resolution order: explicit args → env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) → TPU
    auto-detection via bare ``jax.distributed.initialize()``."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        return False  # single-process run; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def host_local_batch_slice(global_batch: int) -> slice:
    """The row range of the global batch this host should load (per-host
    data loading; SURVEY §5.8)."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_mesh(data: int = -1, model: int = 1):
    """Mesh over ALL processes' devices (jax.devices() is global after
    jax.distributed initialization)."""
    from s2p_tpu.parallel.mesh import MeshSpec, make_mesh

    return make_mesh(MeshSpec(data=data, model=model), devices=jax.devices())
