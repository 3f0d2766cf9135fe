"""Pallas 3D conv kernel vs lax.conv_general_dilated — interpret mode on
CPU. Covers stride-1, stride-2 and transposed (torch ConvTranspose3d
k=3/s=2/p=1/op=1) paths used by CostRegNet
(/root/reference/models/modules.py:470-501)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcmvsnet_tpu.ops.pallas_conv3d import conv3d_lanewise

DN = ("NDHWC", "DHWIO", "NDHWC")


def _xla_conv(x, kernel, strides=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x[None], kernel, window_strides=strides,
        padding=[(1, 1)] * 3, dimension_numbers=DN,
        precision=jax.lax.Precision.HIGHEST)[0]


def _xla_deconv(x, kernel):
    # torch ConvTranspose3d(k=3, s=2, p=1, op=1) as in nn/layers.py
    return jax.lax.conv_general_dilated(
        x[None], kernel, window_strides=(1, 1, 1),
        padding=[(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=DN,
        precision=jax.lax.Precision.HIGHEST)[0]


@pytest.mark.parametrize("ci,co,shape", [
    (32, 8, (6, 10, 12)),
    (16, 16, (4, 9, 11)),   # odd spatial sizes
    (8, 1, (5, 8, 8)),      # prob head: Co=1 exercises channel padding
])
def test_stride1_matches_xla(ci, co, shape):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape, ci).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    got = conv3d_lanewise(x, k, interpret=True, lane_tile=256)
    want = _xla_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(6, 10, 12), (5, 9, 7)])
def test_stride2_matches_xla(shape):
    rs = np.random.RandomState(1)
    ci, co = 8, 16
    x = jnp.asarray(rs.randn(*shape, ci).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    got = conv3d_lanewise(x, k, strides=(2, 2, 2), interpret=True,
                          lane_tile=256)
    want = _xla_conv(x, k, strides=(2, 2, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_transposed_matches_xla():
    rs = np.random.RandomState(2)
    ci, co = 16, 8
    x = jnp.asarray(rs.randn(3, 5, 6, ci).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    got = conv3d_lanewise(x, k, transposed=True, interpret=True,
                          lane_tile=256)
    want = _xla_deconv(x, k)
    assert got.shape == want.shape  # doubled spatial dims
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_multi_lane_tile_boundaries():
    """Lane tiling must be seamless across tile boundaries (the halo
    windows overlap; every tap shift must stay within its block)."""
    rs = np.random.RandomState(3)
    ci, co = 8, 8
    x = jnp.asarray(rs.randn(4, 16, 24, ci).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    got = conv3d_lanewise(x, k, interpret=True, lane_tile=128)  # many tiles
    want = _xla_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
