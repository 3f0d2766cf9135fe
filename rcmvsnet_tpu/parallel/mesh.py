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

Multi-host: call initialize_multihost() (jax.distributed) before make_mesh;
the same jit'd code paths then span hosts, with gradient all-reduce and BN
stat reductions riding DCN between hosts and ICI within them. shard_batch/
replicate assemble global jax.Arrays from per-process host data, playing
the reference DistributedSampler's role across hosts
(tests/test_multihost.py runs a real 2-process Gloo-backed parity check).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         local_device_ids: Optional[Sequence[int]] = None):
    """Join the multi-host runtime (DCN analogue of the reference's
    init_process_group, train_rcmvsnet.py:505). Must run before the first
    backend use. Arguments left None fall back to jax's cluster-env
    autodetection (TPU pods set them automatically)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def is_main_process() -> bool:
    """Rank-0 guard for logging/checkpointing (reference utils.py:165-206
    semantics: only rank 0 writes)."""
    return jax.process_index() == 0


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
    """Place a pytree of host arrays on the mesh with batch axis 0 sharded.

    Single-process: a plain device_put. Multi-process: each process passes
    only ITS slice of the global batch (the loader's process shard) and the
    slices are assembled into global jax.Arrays — the DistributedSampler
    semantics of train_rcmvsnet.py:592-600."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh. Multi-process: every
    process must hold identical values (e.g. same-seed init)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
