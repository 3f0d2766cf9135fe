"""Subprocess worker for test_multihost: one process of a 2-process
jax.distributed run (Gloo collectives over localhost — the CPU stand-in
for DCN between TPU hosts).

Each process owns 4 virtual CPU devices; together they form the same
8-device data-parallel mesh tests/test_multichip.py uses single-process.
The worker loads its HALF of the global synthetic batch (the loader's
process-shard semantics), runs ONE fused train step through the exact
rcmvsnet_tpu.parallel.mesh code paths, and prints the loss for the parent
test to compare against the single-process value.

argv: process_id num_processes port
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
# must win over the shell profile's TPU platform BEFORE the backend exists;
# jax is already imported by the host's sitecustomize, so assign the config
# directly too.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from rcmvsnet_tpu.parallel.mesh import (initialize_multihost,  # noqa: E402
                                        is_main_process, make_mesh,
                                        replicate, shard_batch)

initialize_multihost(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid,
                     local_device_ids=list(range(4)))
assert jax.device_count() == 4 * nproc, jax.devices()
assert jax.local_device_count() == 4
assert is_main_process() == (pid == 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rcmvsnet_tpu.config import (BackboneConfig, Config,  # noqa: E402
                                 RenderConfig, RunConfig)
from rcmvsnet_tpu.data.synthetic import make_synthetic_batch  # noqa: E402
from rcmvsnet_tpu.train.state import create_train_state  # noqa: E402
from rcmvsnet_tpu.train.step import make_train_step  # noqa: E402

GLOBAL_B = 8
config = Config(backbone=BackboneConfig(ndepths=(8, 8, 8)),
                render=RenderConfig(n_rays=32, n_samples=8, num_planes=16),
                run=RunConfig(batch_size=1, n_devices=GLOBAL_B))

full = make_synthetic_batch(B=GLOBAL_B, V=3, H=32, W=32, ndepth=8, seed=3)
per = GLOBAL_B // nproc
shard_local = lambda v: jax.tree_util.tree_map(
    lambda a: a[pid * per:(pid + 1) * per], v)
local = {k: (v if k == "w_aug" else shard_local(v))
         for k, v in full.items()}

mesh = make_mesh(GLOBAL_B)
state = create_train_state(config, local, steps_per_epoch=10,
                           rng=jax.random.PRNGKey(0))
train_step = make_train_step(config, steps_per_epoch=10)
with mesh:
    sharded = shard_batch({k: v for k, v in local.items() if k != "w_aug"},
                          mesh)
    sharded["w_aug"] = jnp.asarray(full["w_aug"])
    state = replicate(state, mesh)
    new_state, metrics = jax.jit(train_step)(state, sharded,
                                             jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert int(new_state.step) == 1
print(f"MHLOSS pid={pid} loss={loss!r}", flush=True)
