"""Device mesh + sharding helpers — the NCCL/DDP replacement.

Behavioral spec: the reference's distributed surface (SURVEY.md §2.8):
process-per-GPU DDP with NCCL gradient all-reduce
(/root/reference/tools/train.py:114,170-178, dist_params backend='nccl').
TPU-native equivalent: one jit'd SPMD program over a `jax.sharding.Mesh`
with a 'data' axis; gradients are reduced by XLA collectives over ICI —
no wrapper module, no find_unused_parameters machinery (functional grads).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Place a host batch with the leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(put, {k: v for k, v in batch.items() if k != "meta"})


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def data_shardings(mesh: Mesh, axis: str = "data"):
    """(replicated, batch-sharded) NamedShardings for jit in_shardings."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(axis))
