"""Device-mesh bootstrap and sharding rules.

The reference is single-GPU: one process-global CUDA device
(rlkit/torch/pytorch_util.py:222-247) and no distributed backend at all
(SURVEY §2.11, §5.8). The TPU-native replacement is a first-class mesh layer:

- a ``('data', 'model')`` mesh over ICI — 'data' for batch sharding (the
  GAN/RL hot loops are embarrassingly data-parallel), 'model' reserved for
  sharding the widest generator convs when chips outnumber useful batch
  splits;
- ``NamedSharding`` constructors so train steps are written once and run
  unchanged on 1 chip or a v5e-8 (XLA inserts the psum/all-gather
  collectives);
- helpers to shard host batches and replicate params.

Multi-chip correctness is validated on a CPU-simulated 8-device mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``) — see
tests/test_parallel.py and __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape. ``-1`` means 'all remaining devices'."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int]:
        data, model = self.data, self.model
        if data == -1 and model == -1:
            raise ValueError("at most one axis may be -1")
        if model == -1:
            model = n_devices // max(data, 1)
        if data == -1:
            data = n_devices // max(model, 1)
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def make_mesh(
    spec: MeshSpec = MeshSpec(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def local_device_count() -> int:
    return jax.local_device_count()


def batch_sharding(mesh: Mesh, ndim: int = 1, batch_dim: int = 0) -> NamedSharding:
    """Shard dimension ``batch_dim`` over the data axis, replicate the rest."""
    spec = [None] * ndim
    spec[batch_dim] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, batch_dim: int = 0) -> Any:
    """Device-put a host batch pytree, sharding each leaf's batch dim."""

    def put(x: Any) -> Any:
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, batch_dim))

    return jax.tree_util.tree_map(put, batch)


def shard_pytree(mesh: Mesh, tree: Any, sharding: Optional[NamedSharding] = None) -> Any:
    """Device-put a pytree fully replicated (params/opt-state default)."""
    sharding = sharding or replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def model_shard_params(
    mesh: Mesh, params: Any, min_features: int = 256
) -> Any:
    """Tensor-parallel placement over the 'model' axis.

    Shards the widest layers' kernels on their OUTPUT-feature dim —
    conv HWIO kernels on O, dense kernels on the last dim, matching
    biases on their only dim — and replicates everything else. XLA's SPMD
    partitioner then splits those layers' compute across the model axis
    and inserts the all-gathers where activations are consumed by
    replicated layers (the scaling-book recipe: annotate shardings, let
    XLA place collectives). Only dims divisible by the axis size and
    ≥ ``min_features`` are sharded, so the same code runs unchanged on a
    model=1 mesh (everything replicates).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def place(x: Any) -> Any:
        x = jnp.asarray(x) if not hasattr(x, "ndim") else x
        shardable = (
            n_model > 1
            and x.ndim >= 1
            and x.shape[-1] >= min_features
            and x.shape[-1] % n_model == 0
        )
        if shardable:
            spec = [None] * (x.ndim - 1) + [MODEL_AXIS]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, params)
