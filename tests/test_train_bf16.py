"""Mixed-precision (train_dtype='bfloat16') backbone training path.

The backbone conv stacks and warp gathers run bf16 while params, BN
statistics, Σx/Σx² variance accumulation (ops/warp.py), depth regression,
losses and the render branch stay f32. These tests pin: the step runs and
optimizes, depths come out f32, and the loss tracks the f32 path closely
on identical data (VERDICT r2 next-step #2).
"""
import jax
import jax.numpy as jnp
import numpy as np

from rcmvsnet_tpu.config import BackboneConfig, Config, RenderConfig
from rcmvsnet_tpu.data.synthetic import make_synthetic_batch
from rcmvsnet_tpu.train.state import create_train_state
from rcmvsnet_tpu.train.step import make_train_step


def _run(train_dtype, steps=3, render_kw=None, run_kw=None):
    from rcmvsnet_tpu.config import RunConfig
    config = Config(
        backbone=BackboneConfig(ndepths=(8, 8, 8), train_dtype=train_dtype),
        render=RenderConfig(n_rays=32, n_samples=8, num_planes=16,
                            **(render_kw or {})),
        run=RunConfig(**(run_kw or {})))
    batch = make_synthetic_batch(B=1, V=3, H=32, W=32, ndepth=8, seed=0)
    state = create_train_state(config, batch, steps_per_epoch=10,
                               rng=jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(config, steps_per_epoch=10))
    fed = jax.tree_util.tree_map(jnp.asarray, batch)
    metrics = None
    for i in range(steps):
        state, metrics = step(state, fed,
                              jax.random.fold_in(jax.random.PRNGKey(1), i))
    return state, metrics


def test_bf16_train_step_tracks_f32():
    _, m32 = _run(None)
    state, m16 = _run("bfloat16")
    for k in ("loss", "repr_loss", "img_loss", "ray_depth_loss"):
        a, b = float(m16[k]), float(m32[k])
        assert np.isfinite(a), k
        assert abs(a - b) <= 0.05 * abs(b) + 1e-3, (k, a, b)
    # params stay f32 master copies
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    # BN running stats stay f32
    stats = jax.tree_util.tree_leaves(state.batch_stats)
    assert all(s.dtype == jnp.float32 for s in stats)


def test_round5_fast_combo_tracks_default():
    """The round-5 train fast-path combo — single-level remat
    (remat_modules=False), bf16 neural-volume U-Net (render train_dtype),
    ray-major volume lookup — must track the default-config losses."""
    _, m0 = _run(None)
    _, m5 = _run(None, render_kw={"train_dtype": "bfloat16",
                                  "ray_major_lookup": True},
                 run_kw={"remat_modules": False})
    for k in ("loss", "repr_loss", "img_loss", "ray_depth_loss"):
        a, b = float(m5[k]), float(m0[k])
        assert np.isfinite(a), k
        assert abs(a - b) <= 0.05 * abs(b) + 1e-3, (k, a, b)


def test_bf16_forward_outputs_are_f32():
    from rcmvsnet_tpu.train.state import make_models
    config = Config(
        backbone=BackboneConfig(ndepths=(8, 8, 8), train_dtype="bfloat16"),
        render=RenderConfig(n_rays=32, n_samples=8, num_planes=16))
    cascade, _ = make_models(config)
    batch = make_synthetic_batch(B=1, V=3, H=32, W=32, ndepth=8, seed=1)
    imgs = jnp.asarray(batch["imgs"])
    projs = jax.tree_util.tree_map(jnp.asarray, batch["proj_matrices"])
    dv = jnp.asarray(batch["depth_values"])
    variables = cascade.init(jax.random.PRNGKey(0), imgs, projs, dv,
                             train=True)
    (out, vol), _ = cascade.apply(variables, imgs, projs, dv, train=True,
                                  return_volume=True,
                                  mutable=["batch_stats"])
    # soft-argmax tail emits f32 depth/confidence regardless of compute dtype
    assert out["depth"].dtype == jnp.float32
    assert out["photometric_confidence"].dtype == jnp.float32
    # the stage-1 volume feeds the f32 render branch (step C upcasts; the
    # bilinear resize in the want_volume path already emits f32 today —
    # either dtype is acceptable here, the contract is finiteness)
    assert vol.dtype in (jnp.float32, jnp.bfloat16)
    assert np.isfinite(np.asarray(vol, np.float32)).all()
    assert np.isfinite(np.asarray(out["depth"], np.float32)).all()
