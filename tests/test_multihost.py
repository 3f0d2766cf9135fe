"""Real multi-PROCESS data parallelism: 2 jax.distributed processes × 4
virtual CPU devices vs the same step single-process on 8 devices.

tests/test_multichip.py validates GSPMD sharding inside one process; this
validates the cross-host layer the reference implements with mp.spawn +
NCCL (train_rcmvsnet.py:502-606): jax.distributed.initialize (Gloo over
localhost here, DCN on a real pod), per-process batch shards assembled
into global arrays (mesh.shard_batch), replicated state
(mesh.replicate), and collective-backed gradient/BN reductions under jit.
The loss must match the single-process 8-device value.
"""
from __future__ import annotations

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).with_name("_mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    import jax
    import jax.numpy as jnp

    from rcmvsnet_tpu.config import (BackboneConfig, Config, RenderConfig,
                                     RunConfig)
    from rcmvsnet_tpu.data.synthetic import make_synthetic_batch
    from rcmvsnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from rcmvsnet_tpu.train.state import create_train_state
    from rcmvsnet_tpu.train.step import make_train_step

    # single-process reference on the in-process 8-device mesh
    config = Config(backbone=BackboneConfig(ndepths=(8, 8, 8)),
                    render=RenderConfig(n_rays=32, n_samples=8,
                                        num_planes=16),
                    run=RunConfig(batch_size=1, n_devices=8))
    batch = make_synthetic_batch(B=8, V=3, H=32, W=32, ndepth=8, seed=3)
    mesh = make_mesh(8)
    state = create_train_state(config, batch, steps_per_epoch=10,
                               rng=jax.random.PRNGKey(0))
    train_step = make_train_step(config, steps_per_epoch=10)
    with mesh:
        sharded = shard_batch({k: v for k, v in batch.items()
                               if k != "w_aug"}, mesh)
        sharded["w_aug"] = jnp.asarray(batch["w_aug"])
        rstate = replicate(state, mesh)
        _, metrics = jax.jit(train_step)(rstate, sharded,
                                         jax.random.PRNGKey(1))
        ref_loss = float(metrics["loss"])
    assert np.isfinite(ref_loss)

    # 2 distributed processes × 4 devices over a localhost coordinator
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-2000:]}"

    losses = []
    for _, out, _ in outs:
        line = next(ln for ln in out.splitlines() if ln.startswith("MHLOSS"))
        losses.append(float(line.split("loss=")[1]))

    # both processes see the same replicated loss, equal to single-process
    # (f32 reduction-order jitter across collective impls — same bound as
    # the 1-vs-8-device test)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(losses[0], ref_loss, rtol=3e-3)
