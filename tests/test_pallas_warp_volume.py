"""Fused warp+volume train kernel (ops/pallas_warp_volume.py) vs the XLA
composition it replaces — interpret mode on CPU, f32 so the comparison is
tight.

Forward parity targets (the stage-1 want_volume path of the clean train
pass, /root/reference/models/casmvsnet.py:58-100,231):
  variance    ≡ ops.warp.plane_sweep_variance (all V views)
  var_no_ref  ≡ ops.warp.plane_sweep_variance_no_ref(homo_warp srcs)
  warped imgs ≡ ops.warp.homo_warp per source view, view-major concat
Backward parity target: jax.grad THROUGH that XLA composition, w.r.t.
BOTH the source features and the stage images."""
import jax
import jax.numpy as jnp
import numpy as np

from rcmvsnet_tpu.core.geometry import (compose_projection,
                                        linspace_depth_samples)
from rcmvsnet_tpu.data.synthetic import make_synthetic_views
from rcmvsnet_tpu.ops.pallas_costreg import make_layout
from rcmvsnet_tpu.ops.pallas_warp2 import check_group_coverage
from rcmvsnet_tpu.ops.pallas_warp_train import lanes_to_ndhwc
from rcmvsnet_tpu.ops.pallas_warp_volume import (
    plane_sweep_volume_fused_train, volume_backward_vmem_bytes)
from rcmvsnet_tpu.ops.warp import (homo_warp, plane_sweep_variance,
                                   plane_sweep_variance_no_ref)


def _setup(H=16, W=24, V=4, D=8, seed=3):
    s = make_synthetic_views(H=H, W=W, V=V, depth0=600.0, seed=seed,
                             baseline=4.0)
    rs = np.random.RandomState(seed)
    C = 8
    feats = jnp.asarray(rs.randn(V, H, W, C).astype(np.float32))
    imgs = jnp.asarray(rs.rand(V, H, W, 3).astype(np.float32))
    pairs = np.zeros((1, V, 2, 4, 4), np.float32)
    for v in range(V):
        pairs[0, v, 0] = s["extrinsics"][v]
        pairs[0, v, 1, :3, :3] = s["intrinsics"]
    projs = compose_projection(jnp.asarray(pairs))[0]        # [V, 4, 4]
    dvals = jnp.linspace(s["depth_min"], s["depth_max"], D)[None]
    dv = linspace_depth_samples(dvals.astype(jnp.float32), D, H, W)[0]
    lo = jnp.broadcast_to(dvals[0, 0], (H, W)).astype(jnp.float32)
    step = jnp.broadcast_to((dvals[0, -1] - dvals[0, 0]) / (D - 1),
                            (H, W)).astype(jnp.float32)
    return feats, imgs, projs, dv, jnp.asarray(pairs), (lo, step, D)


def _fused(feats, imgs, projs, planes, **kw):
    lay = make_layout(feats.shape[1], feats.shape[2])
    C = feats.shape[3]
    V = feats.shape[0]
    var, var_nr, img, viol = plane_sweep_volume_fused_train(
        feats, imgs, projs, planes, compute_dtype=jnp.float32,
        out_dtype=jnp.float32, interpret=True, **kw)
    return (lanes_to_ndhwc(var, lay, C), lanes_to_ndhwc(var_nr, lay, C),
            lanes_to_ndhwc(img, lay, 3 * (V - 1)), viol)


def _xla(feats, imgs, projs, dv):
    """The cascade's XLA want_volume composition (models/cascade.py)."""
    V = feats.shape[0]
    src = [feats[v][None] for v in range(1, V)]
    prj = [projs[v][None] for v in range(1, V)]
    ref_p = projs[0][None]
    var, _ = plane_sweep_variance(feats[0][None], src, prj, ref_p, dv[None])
    warped_feats = [homo_warp(f, p, ref_p, dv[None]) for f, p in zip(src, prj)]
    var_nr = plane_sweep_variance_no_ref(warped_feats)
    warped_imgs = [homo_warp(imgs[v][None], projs[v][None], ref_p, dv[None])
                   for v in range(1, V)]
    return var[0], var_nr[0], jnp.concatenate(warped_imgs, axis=-1)[0]


def test_forward_matches_xla():
    feats, imgs, projs, dv, pairs, planes = _setup()
    H, W = feats.shape[1:3]
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8)
    var, var_nr, img, viol = _fused(feats, imgs, projs, planes,
                                    rows_per_step=4, band=8)
    x_var, x_nr, x_img = _xla(feats, imgs, projs, dv)
    assert int(viol) == 0
    np.testing.assert_allclose(np.asarray(var), np.asarray(x_var),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_nr), np.asarray(x_nr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(img), np.asarray(x_img),
                               rtol=1e-4, atol=1e-4)


def test_backward_matches_xla_grad():
    """d(Σ wᵢ·outᵢ)/d (features, imgs): custom kernel vs XLA autodiff."""
    feats, imgs, projs, dv, pairs, planes = _setup()
    H, W = feats.shape[1:3]
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8)
    rs = np.random.RandomState(11)
    D, C, V = planes[2], feats.shape[3], feats.shape[0]
    w_var = jnp.asarray(rs.randn(D, H, W, C).astype(np.float32))
    w_nr = jnp.asarray(rs.randn(D, H, W, C).astype(np.float32))
    w_img = jnp.asarray(rs.randn(D, H, W, 3 * (V - 1)).astype(np.float32))

    def f_fused(x, im):
        var, var_nr, img, _ = _fused(x, im, projs, planes,
                                     rows_per_step=4, band=8)
        return (jnp.sum(var * w_var) + jnp.sum(var_nr * w_nr)
                + jnp.sum(img * w_img))

    def f_xla(x, im):
        var, var_nr, img = _xla(x, im, projs, dv)
        return (jnp.sum(var * w_var) + jnp.sum(var_nr * w_nr)
                + jnp.sum(img * w_img))

    gf_f, gi_f = jax.grad(f_fused, argnums=(0, 1))(feats, imgs)
    gf_x, gi_x = jax.grad(f_xla, argnums=(0, 1))(feats, imgs)
    np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gi_f), np.asarray(gi_x),
                               rtol=1e-4, atol=1e-4)


def test_var_only_cotangent():
    """Zero img/var_nr cotangents (e.g. the render branch disabled) must
    still reproduce the XLA feature gradient — and imgs get zero grad."""
    feats, imgs, projs, dv, pairs, planes = _setup()
    H, W = feats.shape[1:3]
    rs = np.random.RandomState(7)
    w_var = jnp.asarray(
        rs.randn(planes[2], H, W, feats.shape[3]).astype(np.float32))

    def f_fused(x, im):
        var, _, _, _ = _fused(x, im, projs, planes, rows_per_step=4, band=8)
        return jnp.sum(var * w_var)

    def f_xla(x):
        var, _, _ = _xla(x, imgs, projs, dv)
        return jnp.sum(var * w_var)

    gf, gi = jax.grad(f_fused, argnums=(0, 1))(feats, imgs)
    gx = jax.grad(f_xla)(feats)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(gi), 0.0)


def test_nondiff_cotangents_zero():
    feats, imgs, projs, dv, pairs, planes = _setup()

    def f(p, lo, st):
        var, var_nr, img, _ = _fused(feats, imgs, p, (lo, st, planes[2]),
                                     rows_per_step=4, band=8)
        return jnp.sum(var) + jnp.sum(var_nr) + jnp.sum(img)

    gp, glo, gst = jax.grad(f, argnums=(0, 1, 2))(
        projs, planes[0], planes[1])
    assert np.all(np.asarray(gp) == 0)
    assert np.all(np.asarray(glo) == 0)
    assert np.all(np.asarray(gst) == 0)


def test_backward_vmem_estimate_monotone():
    a = volume_backward_vmem_bytes(4, 128, 160, 32)
    b = volume_backward_vmem_bytes(4, 256, 320, 16)
    assert a > 24 * 1024 * 1024 and b > a  # scales with the stage size
