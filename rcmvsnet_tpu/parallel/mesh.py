"""Device-mesh runtime: data-parallel training over ICI via jit + GSPMD.

This is the TPU-native replacement for the reference's NCCL stack
(/root/reference/train_rcmvsnet.py:502-606 — mp.spawn + DDP + SyncBatchNorm
+ DistributedSampler):

  * mp.spawn/DDP        → one process, jit over a jax.sharding.Mesh; XLA
                          inserts the gradient all-reduce (and it rides ICI)
  * SyncBatchNorm       → batch-stat reductions under jit are global by
                          construction (see nn/layers.py TorchBatchNorm)
  * DistributedSampler  → shard_batch places per-host batches on the mesh
  * dist.reduce metrics → jnp means over the sharded batch axis

Multi-host extension: call jax.distributed.initialize() before make_mesh;
the same code paths then span hosts over DCN.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits axis 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a pytree of host arrays with batch axis 0 sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
