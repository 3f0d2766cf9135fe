"""Model-level invariants: shapes, prob-volume normalization, depth ranges."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rcmvsnet_tpu.models.cascade import CascadeMVSNet, depth_regression, photometric_confidence
from rcmvsnet_tpu.models.render_net import RenderingConsistencyNet

RS = np.random.RandomState(3)


def _dtu_like_inputs(B=1, V=3, H=64, W=64, ndepth=32):
    imgs = RS.rand(B, V, H, W, 3).astype(np.float32)
    projs = {}
    base = np.zeros((B, V, 2, 4, 4), np.float32)
    for b in range(B):
        for v in range(V):
            angle = v * 0.04
            c, s = np.cos(angle), np.sin(angle)
            E = np.eye(4, dtype=np.float32)
            E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            E[:3, 3] = [v * 2.0, 0, 0]
            K = np.array([[W * 1.2, 0, W / 2], [0, W * 1.2, H / 2], [0, 0, 1]],
                         np.float32)
            base[b, v, 0] = E
            base[b, v, 1, :3, :3] = K
    stage1 = base.copy()
    stage1[:, :, 1, :2] /= 4.0
    stage2 = base.copy()
    stage2[:, :, 1, :2] /= 2.0
    projs = {"stage1": stage1, "stage2": stage2, "stage3": base}
    depth_values = np.linspace(40.0, 90.0, ndepth, dtype=np.float32)[None].repeat(B, 0)
    return imgs, projs, depth_values


@pytest.fixture(scope="module")
def cascade_forward():
    imgs, projs, depth_values = _dtu_like_inputs()
    model = CascadeMVSNet(ndepths=(8, 8, 8), depth_intervals_ratio=(4, 2, 1),
                          cr_base_chs=(8, 8, 8))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs),
                           jax.tree_util.tree_map(jnp.asarray, projs),
                           jnp.asarray(depth_values), train=False)
    outputs = model.apply(variables, jnp.asarray(imgs),
                          jax.tree_util.tree_map(jnp.asarray, projs),
                          jnp.asarray(depth_values), train=False)
    return imgs, depth_values, outputs, model, variables, projs


def test_cascade_output_shapes(cascade_forward):
    imgs, depth_values, outputs, *_ = cascade_forward
    B, V, H, W, _ = imgs.shape
    assert outputs["stage1"]["depth"].shape == (B, H // 4, W // 4)
    assert outputs["stage2"]["depth"].shape == (B, H // 2, W // 2)
    assert outputs["stage3"]["depth"].shape == (B, H, W)
    assert outputs["depth"].shape == (B, H, W)
    assert outputs["photometric_confidence"].shape == (B, H, W)


def test_cascade_depth_in_plausible_range(cascade_forward):
    _, depth_values, outputs, *_ = cascade_forward
    d1 = np.asarray(outputs["stage1"]["depth"])
    # stage 1 soft-argmax stays inside the sweep range
    assert d1.min() >= depth_values.min() - 1e-3
    assert d1.max() <= depth_values.max() + 1e-3
    conf = np.asarray(outputs["photometric_confidence"])
    assert conf.min() >= 0.0 and conf.max() <= 1.0 + 1e-5


def test_cascade_train_mode_returns_volume(cascade_forward):
    imgs, depth_values, _, model, variables, projs = cascade_forward
    (outputs, volume), _ = model.apply(
        variables, jnp.asarray(imgs),
        jax.tree_util.tree_map(jnp.asarray, projs),
        jnp.asarray(depth_values), train=True, return_volume=True,
        mutable=["batch_stats"])
    B, V, H, W, _ = imgs.shape
    # 3·(V−1) warped-img channels + 32 feature-variance channels
    assert volume.shape == (B, 8, H // 4, W // 4, 3 * (V - 1) + 32)


def test_depth_regression_and_confidence():
    B, D, H, W = 2, 16, 4, 5
    logits = RS.randn(B, D, H, W).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    depths = np.linspace(10, 25, D, dtype=np.float32)[None].repeat(B, 0)
    depth = depth_regression(jnp.asarray(prob), jnp.asarray(depths))
    expected = (prob * depths[:, :, None, None]).sum(1)
    np.testing.assert_allclose(np.asarray(depth), expected, rtol=1e-5)

    conf = photometric_confidence(jnp.asarray(prob))
    # oracle: pad depth dim (1, 2), window-4 sliding sum, gather at trunc(Σp·i)
    padded = np.pad(prob, ((0, 0), (1, 2), (0, 0), (0, 0)))
    sum4 = np.stack([padded[:, d:d + 4].sum(1) for d in range(D)], 1)
    idx = np.clip((prob * np.arange(D)[None, :, None, None]).sum(1).astype(np.int32),
                  0, D - 1)
    expected_conf = np.take_along_axis(sum4, idx[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(np.asarray(conf), expected_conf, atol=1e-5)


def test_render_net_forward(net_type="v0"):
    B, V, H, W = 1, 4, 32, 64  # H/4, W/4 must divide by 8 (3-level 3D U-Net)
    D0, C = 8, 3 * 3 + 32
    volume_feature = RS.randn(B, D0, H // 4, W // 4, C).astype(np.float32)
    pseudo_depth = (RS.rand(B, H, W).astype(np.float32) * 40 + 45)
    imgs = RS.rand(B, V, H, W, 3).astype(np.float32)
    w2cs = np.broadcast_to(np.eye(4, dtype=np.float32), (B, V, 4, 4)).copy()
    c2ws = w2cs.copy()
    for v in range(V):
        w2cs[0, v, 0, 3] = v * 0.5
        c2ws[0, v] = np.linalg.inv(w2cs[0, v])
    intr = np.array([[W * 1.1, 0, W / 2], [0, W * 1.1, H / 2], [0, 0, 1]],
                    np.float32)
    intrinsics = np.broadcast_to(intr, (B, V, 3, 3)).copy()
    near_fars = np.broadcast_to(np.array([40.0, 90.0], np.float32), (B, V, 2)).copy()

    model = RenderingConsistencyNet(n_rays=64, n_samples=16,
                                    volume_channels=8, net_type=net_type)
    args = tuple(jnp.asarray(a) for a in
                 (volume_feature, pseudo_depth, imgs, w2cs, c2ws,
                  intrinsics, near_fars))
    variables = model.init(jax.random.PRNGKey(0), *args,
                           rng=jax.random.PRNGKey(1), train=False)
    result = model.apply(variables, *args, rng=jax.random.PRNGKey(1),
                         train=False)
    assert result.rgb.shape == (B, 64, 3)
    assert result.depth.shape == (B, 64)
    assert result.target_rgb.shape == (B, 64, 3)
    assert result.rays_depth.shape == (B, 64)
    rgb = np.asarray(result.rgb)
    assert np.isfinite(rgb).all()
    # weights are a sub-probability distribution along each ray
    w = np.asarray(result.weights)
    assert (w >= 0).all() and (w.sum(-1) <= 1.0 + 1e-4).all()
    # z_vals sorted ⇒ rendered depth inside [near−3σ-ish, far+3σ-ish] band
    assert np.isfinite(np.asarray(result.depth)).all()


def test_sample_rays_odd_n_rays():
    """Odd n_rays must still yield n_rays rows: half gaussian + the REST
    uniform (reference overwrites rays [N//2:], render_utils.py:212-224),
    not 2·(n//2) rows followed by an opaque broadcast crash."""
    import jax

    from rcmvsnet_tpu.render.rays import sample_rays

    H = W = 16
    imgs = jnp.asarray(RS.rand(2, H, W, 3), jnp.float32)
    depth = jnp.full((H, W), 60.0, jnp.float32)
    w2cs = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    intr = jnp.asarray([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]],
                       jnp.float32)
    intrinsics = jnp.broadcast_to(intr, (2, 3, 3))
    near_fars = jnp.broadcast_to(jnp.asarray([40.0, 90.0]), (2, 2))
    rays = sample_rays(jax.random.PRNGKey(0), imgs, depth, w2cs, w2cs,
                       intrinsics, near_fars, n_rays=33, n_samples=8)
    assert rays.z_vals.shape == (33, 8)
    assert rays.pts_world.shape == (33, 8, 3)


def test_render_net_forward_v1_attention():
    """net_type='v1' (Renderer_attention) end-to-end through the branch."""
    test_render_net_forward(net_type="v1")
