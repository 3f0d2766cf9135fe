"""Checkpoint conversion: the official trained NeRF checkpoint must map
1:1 onto our RenderingConsistencyNet parameter tree (shapes included) —
a strong architecture-parity check against the reference's real weights."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

NERF_CKPT = "/root/reference/pretrain/model_000014_nerf.ckpt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(NERF_CKPT), reason="reference checkpoint not mounted")


def test_render_checkpoint_matches_our_tree():
    from rcmvsnet_tpu.models.render_net import RenderingConsistencyNet
    from rcmvsnet_tpu.train.convert import convert_render_checkpoint

    params, stats = convert_render_checkpoint(NERF_CKPT)

    B, V, H, W = 1, 4, 32, 64
    model = RenderingConsistencyNet(n_rays=16, n_samples=8, num_planes=16)
    volume_feature = jnp.zeros((B, 8, H // 4, W // 4, 3 * (V - 1) + 32))
    args = (volume_feature, jnp.ones((B, H, W)),
            jnp.zeros((B, V, H, W, 3)),
            jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4)),
            jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4)),
            jnp.broadcast_to(jnp.eye(3), (B, V, 3, 3)),
            jnp.broadcast_to(jnp.asarray([10.0, 20.0]), (B, V, 2)))
    variables = model.init(jax.random.PRNGKey(0), *args,
                           rng=jax.random.PRNGKey(1), train=False)

    def flat_shapes(tree):
        return {jax.tree_util.keystr(p): tuple(np.asarray(v).shape)
                for p, v in jax.tree_util.tree_leaves_with_path(tree)}

    ours_p = flat_shapes(variables["params"])
    conv_p = flat_shapes(params)
    assert ours_p == conv_p, (
        f"only-ours: {sorted(set(ours_p) - set(conv_p))}\n"
        f"only-conv: {sorted(set(conv_p) - set(ours_p))}\n"
        f"shape-diff: {[(k, ours_p[k], conv_p[k]) for k in ours_p if k in conv_p and ours_p[k] != conv_p[k]]}")
    assert flat_shapes(variables["batch_stats"]) == flat_shapes(stats)

    # converted weights actually run
    result = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params),
                          "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
                         *args, rng=jax.random.PRNGKey(1), train=False)
    assert np.isfinite(np.asarray(result.rgb)).all()
