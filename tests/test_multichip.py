"""Multi-device (virtual 8-way CPU mesh) parity tests.

The TPU-native replacement for the reference's DDP + SyncBatchNorm stack
(/root/reference/train_rcmvsnet.py:502-606, SyncBN at :524-525) is GSPMD
over a jax.sharding.Mesh (rcmvsnet_tpu/parallel/mesh.py + train/step.py).
SURVEY.md §4's distributed test plan: run the SAME fused train step on a
1-device and an 8-device mesh with the same global batch and assert the
losses match; plus a TorchBatchNorm collective (pmean/psum) unit test.

conftest.py provisions 8 virtual CPU devices via
--xla_force_host_platform_device_count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcmvsnet_tpu.config import BackboneConfig, Config, RenderConfig, RunConfig
from rcmvsnet_tpu.data.synthetic import make_synthetic_batch
from rcmvsnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from rcmvsnet_tpu.train.state import create_train_state
from rcmvsnet_tpu.train.step import make_train_step


def _tiny_config(n_devices: int) -> Config:
    return Config(
        backbone=BackboneConfig(ndepths=(8, 8, 8)),
        render=RenderConfig(n_rays=32, n_samples=8, num_planes=16),
        run=RunConfig(batch_size=1, n_devices=n_devices))


def _run_one_step(n_devices: int, batch_np):
    """Jit the fused train step over an n-device mesh, one step, return
    (loss metrics dict, updated params pytree as host arrays)."""
    config = _tiny_config(n_devices)
    mesh = make_mesh(n_devices)
    state = create_train_state(config, batch_np, steps_per_epoch=10,
                               rng=jax.random.PRNGKey(0))
    train_step = make_train_step(config, steps_per_epoch=10)
    with mesh:
        sharded = shard_batch({k: v for k, v in batch_np.items()
                               if k != "w_aug"}, mesh)
        sharded["w_aug"] = jnp.asarray(batch_np["w_aug"])
        state = replicate(state, mesh)
        new_state, metrics = jax.jit(train_step)(state, sharded,
                                                 jax.random.PRNGKey(1))
        metrics = {k: float(v) for k, v in metrics.items()}
        params = jax.device_get(new_state.params)
        stats = jax.device_get(new_state.batch_stats)
    return metrics, params, stats


@pytest.mark.slow
def test_train_step_1dev_vs_8dev_parity():
    """Same global batch (B=8) through the fused train step on a 1-device
    mesh and an 8-device mesh: losses, updated params, and BN running stats
    must agree — GSPMD data parallelism is semantics-preserving, exactly
    like the reference's DDP grad all-reduce + SyncBatchNorm."""
    assert jax.device_count() >= 8, "conftest must provision 8 CPU devices"
    batch = make_synthetic_batch(B=8, V=3, H=32, W=32, ndepth=8, seed=3)

    m1, p1, s1 = _run_one_step(1, batch)
    m8, p8, s8 = _run_one_step(8, batch)

    assert np.isfinite(m1["loss"]) and np.isfinite(m8["loss"])
    # fp32 reduction order differs across shardings (conv/grad reductions
    # reassociate at shard boundaries) — observed ~6e-4 rel on the loss
    np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=3e-3)
    for key in ("repr_loss", "aug_loss", "img_loss", "ray_depth_loss"):
        np.testing.assert_allclose(m1[key], m8[key], rtol=5e-3, atol=1e-5)

    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(p8)}
    for path, leaf1 in flat1:
        leaf8 = flat8[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf8),
                                   rtol=2e-2, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(path))

    for (pa, a), (pb, b) in zip(jax.tree_util.tree_leaves_with_path(s1),
                                jax.tree_util.tree_leaves_with_path(s8)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_batchnorm_axis_name_syncs_stats():
    """TorchBatchNorm(axis_name=...) under shard_map reproduces full-batch
    (SyncBN) statistics: per-device batches with different distributions
    must produce the same normalized output and running stats as one
    global-batch forward (reference SyncBatchNorm semantics,
    train_rcmvsnet.py:524-525)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from rcmvsnet_tpu.nn.layers import TorchBatchNorm

    n_dev = 8
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("data",))

    rs = np.random.RandomState(0)
    # deliberately non-identical per-shard stats: shard i ~ N(i, (1+i/4)^2)
    x = np.stack([rs.randn(4, 6, 5).astype(np.float32) * (1 + i / 4.0) + i
                  for i in range(n_dev)]).reshape(n_dev * 4, 6, 5)

    bn_sync = TorchBatchNorm(axis_name="data")
    bn_ref = TorchBatchNorm()
    variables = bn_ref.init(jax.random.PRNGKey(0), jnp.asarray(x), True)

    ref_out, ref_mut = bn_ref.apply(variables, jnp.asarray(x), True,
                                    mutable=["batch_stats"])

    def per_shard(xs):
        out, mut = bn_sync.apply(variables, xs, True,
                                 mutable=["batch_stats"])
        return out, mut["batch_stats"]

    with mesh:
        sync_fn = shard_map(per_shard, mesh=mesh,
                            in_specs=P("data"),
                            out_specs=(P("data"), P()))
        sync_out, sync_stats = jax.jit(sync_fn)(jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(sync_out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(sync_stats[key]),
            np.asarray(ref_mut["batch_stats"][key]),
            rtol=1e-5, atol=1e-6, err_msg=key)


def test_shard_batch_partitions_axis0():
    """shard_batch splits axis 0 across the mesh; replicate leaves values
    whole on every device (DistributedSampler/broadcast semantics)."""
    n_dev = 8
    mesh = make_mesh(n_dev)
    x = np.arange(n_dev * 3 * 2, dtype=np.float32).reshape(n_dev * 3, 2)
    sharded = shard_batch({"x": x}, mesh)["x"]
    assert sharded.shape == x.shape
    shard_rows = {s.data.shape[0] for s in sharded.addressable_shards}
    assert shard_rows == {3}
    np.testing.assert_array_equal(np.asarray(sharded), x)

    rep = replicate({"x": x}, mesh)["x"]
    for s in rep.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), x)
