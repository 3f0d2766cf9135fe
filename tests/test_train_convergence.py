"""Training actually learns: the fused unsupervised step reduces its loss
and improves depth accuracy on synthetic textured-plane scenes.

Single-step oracles (tests/test_multichip.py, tests/test_unsup_real_oracle)
pin VALUES; this pins DYNAMICS — a sign flip in a gradient path, a
mis-scaled loss term, or a detached-but-shouldn't-be subgraph would keep
values plausible while breaking descent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcmvsnet_tpu.config import BackboneConfig, Config, RenderConfig, RunConfig
from rcmvsnet_tpu.data.synthetic import make_synthetic_batch
from rcmvsnet_tpu.train.state import create_train_state
from rcmvsnet_tpu.train.step import make_train_step


@pytest.mark.slow
def test_unsup_training_descends():
    steps = 40
    config = Config(
        backbone=BackboneConfig(ndepths=(8, 8, 8)),
        render=RenderConfig(n_rays=32, n_samples=8, num_planes=16),
        run=RunConfig(batch_size=2, lr=1e-3))
    batches = [make_synthetic_batch(B=2, V=3, H=32, W=32, ndepth=8, seed=s)
               for s in range(4)]

    state = create_train_state(config, batches[0], steps_per_epoch=steps,
                               rng=jax.random.PRNGKey(0))
    train_step = jax.jit(make_train_step(config, steps_per_epoch=steps))

    rng = jax.random.PRNGKey(42)
    losses, depth_errs = [], []
    for i in range(steps):
        batch = batches[i % len(batches)]
        fed = {k: jnp.asarray(v) if not isinstance(v, dict) else
               jax.tree_util.tree_map(jnp.asarray, v)
               for k, v in batch.items()}
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, fed, step_rng)
        losses.append(float(metrics["loss"]))
        depth_errs.append(float(metrics["abs_depth_error"]))

    assert all(np.isfinite(losses)), losses
    first, last = np.mean(losses[:4]), np.mean(losses[-4:])
    assert last < 0.7 * first, (
        f"loss did not descend: first4 {first:.4f} -> last4 {last:.4f}\n"
        f"{losses}")
    # depth should move toward the true plane as the photometric loss drops
    assert np.mean(depth_errs[-4:]) < np.mean(depth_errs[:4]), depth_errs
