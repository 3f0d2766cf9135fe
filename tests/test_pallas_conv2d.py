"""Pallas flat channel-major conv chain vs lax.conv_general_dilated —
interpret mode on CPU. Covers the FeatureNet layer shapes (3×3 s1 p1,
5×5 s2 p2), fused BN-fold scale/shift + ReLU, multi-view batching, and
the geometry ops (/root/reference/models/modules.py:28-43)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcmvsnet_tpu.ops.pallas_conv2d import (cm_from_nhwc, cm_to_nhwc,
                                            conv2d_cm, lane_mask, make_geo,
                                            matmul_cm, subsample2_cm,
                                            upsample2_cm)

DN = ("NHWC", "HWIO", "NHWC")


def _xla_conv(x, kernel, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=[(pad, pad)] * 2, dimension_numbers=DN,
        precision=jax.lax.Precision.HIGHEST)


def _run(x, kern, stride, pad, scale=None, shift=None, relu=False):
    N, H, W, _ = x.shape
    geo = make_geo(N, H, W, margin=4)
    flat = cm_from_nhwc(x, geo)
    out, geo_out = conv2d_cm(flat, geo, kern, stride=stride, padding=pad,
                             scale=scale, shift=shift, relu=relu,
                             rows_per_band=8, interpret=True)
    return cm_to_nhwc(out, geo_out)


@pytest.mark.parametrize("ci,co,k,stride,pad,shape", [
    (3, 8, 3, 1, 1, (2, 16, 20)),
    (8, 8, 3, 1, 1, (1, 12, 28)),
    (8, 16, 5, 2, 2, (2, 16, 24)),
    (16, 32, 5, 2, 2, (1, 12, 16)),
    (32, 32, 3, 1, 1, (2, 8, 12)),
])
def test_matches_xla(ci, co, k, stride, pad, shape):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape, ci).astype(np.float32))
    kern = jnp.asarray(rs.randn(k, k, ci, co).astype(np.float32) * 0.1)
    got = _run(x, kern, stride, pad)
    want = _xla_conv(x, kern, stride, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_bn_relu():
    rs = np.random.RandomState(1)
    ci, co = 8, 16
    x = jnp.asarray(rs.randn(2, 12, 16, ci).astype(np.float32))
    kern = jnp.asarray(rs.randn(3, 3, ci, co).astype(np.float32) * 0.1)
    scale = jnp.asarray(rs.rand(co).astype(np.float32) + 0.5)
    shift = jnp.asarray(rs.randn(co).astype(np.float32))
    got = _run(x, kern, 1, 1, scale=scale, shift=shift, relu=True)
    want = jax.nn.relu(_xla_conv(x, kern) * scale + shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_chain_preserves_margins():
    """A chained second conv must see true zero padding (zero margins)."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 12, 8).astype(np.float32))
    k1 = jnp.asarray(rs.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rs.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    geo = make_geo(2, 8, 12, margin=4)
    f, g = conv2d_cm(cm_from_nhwc(x, geo), geo, k1, padding=1,
                     rows_per_band=8, relu=True, interpret=True)
    f, g = conv2d_cm(f, g, k2, padding=1, rows_per_band=8, interpret=True)
    want = _xla_conv(jax.nn.relu(_xla_conv(x, k1)), k2)
    np.testing.assert_allclose(np.asarray(cm_to_nhwc(f, g)),
                               np.asarray(want), rtol=1e-4, atol=1e-4)


def test_geometry_ops():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 8, 12, 4).astype(np.float32))
    geo = make_geo(2, 8, 12, margin=4)
    flat = cm_from_nhwc(x, geo)
    # roundtrip
    np.testing.assert_array_equal(np.asarray(cm_to_nhwc(flat, geo)),
                                  np.asarray(x))
    # subsample == x[:, ::2, ::2]
    sub, geo_s = subsample2_cm(flat, geo)
    np.testing.assert_array_equal(np.asarray(cm_to_nhwc(sub, geo_s)),
                                  np.asarray(x[:, ::2, ::2]))
    # upsample == nearest ×2 (repeat)
    up, geo_u = upsample2_cm(sub, geo_s)
    want_up = np.repeat(np.repeat(np.asarray(x[:, ::2, ::2]), 2, 1), 2, 2)
    np.testing.assert_array_equal(np.asarray(cm_to_nhwc(up, geo_u)), want_up)
    # 1×1 matmul head with masked bias
    w = jnp.asarray(rs.randn(4, 6).astype(np.float32))
    b = jnp.asarray(rs.randn(6).astype(np.float32))
    head = matmul_cm(flat, geo, w, b)
    want_head = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(cm_to_nhwc(head, geo)),
                               want_head, rtol=1e-5, atol=1e-5)
    # margins stay exactly zero after the masked-bias head
    m = np.asarray(lane_mask(geo))[0]
    assert np.all(np.asarray(head)[:, m == 0] == 0)


@pytest.mark.parametrize("rpb,stride,k,pad", [
    (None, 1, 3, 1),   # auto divisor band → edge-DMA path
    (None, 2, 5, 2),   # divisor band + in-kernel col de-interleave
    (6, 1, 3, 1),      # non-divisor band → padded-x_hbm fallback
    (6, 2, 5, 2),      # non-divisor band, stride 2
])
def test_band_paths_match_xla(rpb, stride, k, pad):
    """Edge-DMA divisor bands vs the padded fallback: same numbers."""
    rs = np.random.RandomState(3)
    ci, co = 8, 16
    x = jnp.asarray(rs.randn(2, 16, 20, ci).astype(np.float32))
    kern = jnp.asarray(rs.randn(k, k, ci, co).astype(np.float32) * 0.1)
    geo = make_geo(2, 16, 20, margin=4)
    out, geo_out = conv2d_cm(cm_from_nhwc(x, geo), geo, kern,
                             stride=stride, padding=pad,
                             rows_per_band=rpb, interpret=True)
    got = cm_to_nhwc(out, geo_out)
    want = _xla_conv(x, kern, stride, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
