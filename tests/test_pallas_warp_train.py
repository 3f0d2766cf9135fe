"""Custom-VJP fused warp+variance (train fast path) vs XLA autodiff —
interpret mode on CPU, f32 so the comparison is tight.

Forward parity target: ops.warp.plane_sweep_variance (oracle-tested vs
the literal torch port in tests/test_warp.py). Backward parity target:
jax.grad THROUGH that XLA path — the custom backward kernel must
reproduce XLA's gather-scatter gradient to float tolerance."""
import jax
import jax.numpy as jnp
import numpy as np

from rcmvsnet_tpu.core.geometry import (compose_projection,
                                        linspace_depth_samples)
from rcmvsnet_tpu.data.synthetic import make_synthetic_views
from rcmvsnet_tpu.ops.pallas_costreg import make_layout
from rcmvsnet_tpu.ops.pallas_warp2 import check_group_coverage
from rcmvsnet_tpu.ops.pallas_warp_train import (
    lanes_to_ndhwc, plane_sweep_variance_fused_train)
from rcmvsnet_tpu.ops.warp import plane_sweep_variance


def _setup(H=16, W=24, V=4, D=8, seed=3):
    s = make_synthetic_views(H=H, W=W, V=V, depth0=600.0, seed=seed,
                             baseline=4.0)
    rs = np.random.RandomState(seed)
    C = 8
    feats = jnp.asarray(rs.randn(V, H, W, C).astype(np.float32))
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
    return feats, projs, dv, jnp.asarray(pairs), (lo, step, D)


def _fused_ndhwc(feats, projs, planes, **kw):
    lay = make_layout(feats.shape[1], feats.shape[2])
    vol, viol = plane_sweep_variance_fused_train(
        feats, projs, planes, compute_dtype=jnp.float32,
        out_dtype=jnp.float32, interpret=True, **kw)
    return lanes_to_ndhwc(vol, lay, feats.shape[3]), viol


def _xla_ndhwc(feats, projs, dv):
    V = feats.shape[0]
    var, _ = plane_sweep_variance(
        feats[0][None], [feats[v][None] for v in range(1, V)],
        [projs[v][None] for v in range(1, V)], projs[0][None], dv[None])
    return var[0]


def test_forward_matches_xla():
    feats, projs, dv, pairs, planes = _setup()
    H, W = feats.shape[1:3]
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8)
    got, viol = _fused_ndhwc(feats, projs, planes, rows_per_step=4, band=8)
    assert int(viol) == 0
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_xla_ndhwc(feats, projs, dv)),
                               rtol=1e-4, atol=1e-4)


def test_backward_matches_xla_grad():
    """d(Σ var·Wr)/d features: custom kernel vs XLA autodiff."""
    feats, projs, dv, pairs, planes = _setup()
    H, W = feats.shape[1:3]
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8)
    rs = np.random.RandomState(11)
    wr = jnp.asarray(rs.randn(*(planes[2],) + feats.shape[1:3]
                              + (feats.shape[3],)).astype(np.float32))

    def f_fused(x):
        v, _ = _fused_ndhwc(x, projs, planes, rows_per_step=4, band=8)
        return jnp.sum(v * wr)

    def f_xla(x):
        return jnp.sum(_xla_ndhwc(x, projs, dv) * wr)

    g_fused = jax.grad(f_fused)(feats)
    g_xla = jax.grad(f_xla)(feats)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-4)


def test_backward_banded_matches_dense():
    feats, projs, dv, pairs, planes = _setup()
    H, W = feats.shape[1:3]
    x_band, x_tile, x_align = 16, 8, 8
    assert check_group_coverage(pairs, dv[None], H, W, 4, 8,
                                x_band=x_band, x_tile=x_tile,
                                x_align=x_align)
    rs = np.random.RandomState(5)
    wr = jnp.asarray(rs.randn(planes[2], H, W,
                              feats.shape[3]).astype(np.float32))

    def f(x, banded):
        kw = (dict(x_band=x_band, x_tile=x_tile, x_align=x_align)
              if banded else {})
        v, _ = _fused_ndhwc(x, projs, planes, rows_per_step=4, band=8,
                            **kw)
        return jnp.sum(v * wr)

    g_b = jax.grad(lambda x: f(x, True))(feats)
    g_d = jax.grad(lambda x: f(x, False))(feats)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               rtol=1e-4, atol=1e-4)
    g_xla = jax.grad(
        lambda x: jnp.sum(_xla_ndhwc(x, projs, dv) * wr))(feats)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-4)


def test_nondiff_cotangents_zero():
    """projs / depth planes are stop-gradient by the reference's
    semantics (homo_warping grid under no_grad) — their cotangents must
    come back zero, not NaN."""
    feats, projs, dv, pairs, planes = _setup()

    def f(p, lo, st):
        v, _ = _fused_ndhwc(feats, p, (lo, st, planes[2]),
                            rows_per_step=4, band=8)
        return jnp.sum(v)

    gp, glo, gst = jax.grad(f, argnums=(0, 1, 2))(
        projs, planes[0], planes[1])
    assert np.all(np.asarray(gp) == 0)
    assert np.all(np.asarray(glo) == 0)
    assert np.all(np.asarray(gst) == 0)
