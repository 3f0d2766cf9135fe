"""Lanes-resident CostRegNet (ops/pallas_costreg.py) vs the XLA NDHWC path
(nn/costreg.py conv_impl='xla') — interpret mode on CPU.

Covers: single conv layer (borders/margins, channel padding, multi lane
tile), stride-2 z+hw, transposed conv via lane-space stuffing, skip adds,
BN folding, and the full 11-layer U-Net."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcmvsnet_tpu.nn.costreg import CostRegNet
from rcmvsnet_tpu.ops.pallas_costreg import (conv_lanes, cost_from_lanes,
                                             costreg_lanes, fold_bn,
                                             fold_costreg_variables,
                                             make_layout, stuff_hw_z,
                                             subsample_hw, to_lanes)

DN = ("NDHWC", "DHWIO", "NDHWC")


def _xla_conv(x, kernel, strides=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x[None], kernel, window_strides=strides, padding=[(1, 1)] * 3,
        dimension_numbers=DN, precision=jax.lax.Precision.HIGHEST)[0]


def _xla_deconv(x, kernel):
    return jax.lax.conv_general_dilated(
        x[None], kernel, window_strides=(1, 1, 1), padding=[(1, 2)] * 3,
        lhs_dilation=(2, 2, 2), dimension_numbers=DN,
        precision=jax.lax.Precision.HIGHEST)[0]


def _from_lanes(y, lay, co):
    """[P, C', lanesp] → NDHWC interior [D, h, w, co]."""
    v = np.asarray(y)[1:-1, :co, lay.halo:lay.halo + lay.lanes0]
    v = v.reshape(v.shape[0], co, lay.hp, lay.wp)[:, :, 1:-1, 1:1 + lay.w]
    return np.transpose(v, (0, 2, 3, 1))


@pytest.mark.parametrize("ci,co,shape,lane_tile", [
    (16, 8, (8, 8, 16), 128),     # multi lane tile
    (8, 16, (8, 16, 8), 512),
    (8, 1, (8, 8, 8), 256),       # prob head channel padding
])
def test_single_conv_matches_xla(ci, co, shape, lane_tile):
    rs = np.random.RandomState(0)
    d, h, w = shape
    x = jnp.asarray(rs.randn(d, h, w, ci).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    lay = make_layout(h, w, lane_tile)
    xl = to_lanes(x, lay, -(-ci // 8) * 8, jnp.float32)
    y = conv_lanes(xl, k, b, lay, relu=True, compute_dtype=jnp.float32,
                   interpret=True)
    got = _from_lanes(y, lay, co)
    want = jax.nn.relu(_xla_conv(x, k) + b)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_stride2_matches_xla():
    rs = np.random.RandomState(1)
    ci, co, (d, h, w) = 8, 16, (8, 16, 16)
    x = jnp.asarray(rs.randn(d, h, w, ci).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    lay, lay2 = make_layout(h, w, 512), make_layout(h // 2, w // 2, 512)
    xl = to_lanes(x, lay, 8, jnp.float32)
    y = conv_lanes(xl, k, b, lay, z_stride=2, relu=True,
                   compute_dtype=jnp.float32, interpret=True)
    y = subsample_hw(y, lay, lay2)
    got = _from_lanes(y, lay2, co)
    want = jax.nn.relu(_xla_conv(x, k, strides=(2, 2, 2)) + b)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_transposed_with_skip_matches_xla():
    rs = np.random.RandomState(2)
    ci, co, (d, h, w) = 16, 8, (4, 4, 8)
    x = jnp.asarray(rs.randn(d, h, w, ci).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(co).astype(np.float32))
    skip = jnp.asarray(rs.randn(2 * d, 2 * h, 2 * w, co).astype(np.float32))
    lay, lay2 = make_layout(h, w, 512), make_layout(2 * h, 2 * w, 512)
    xl = to_lanes(x, lay, 16, jnp.float32)
    skipl = to_lanes(skip, lay2, 8, jnp.float32)
    y = conv_lanes(stuff_hw_z(xl, lay, lay2), k, b, lay2, relu=True,
                   skip=skipl, compute_dtype=jnp.float32, interpret=True)
    got = _from_lanes(y, lay2, co)
    want = skip + jax.nn.relu(_xla_deconv(x, k) + b)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_full_costreg_matches_xla_module():
    """The 11-layer pipeline with folded BN vs CostRegNet eval (random
    BN stats so folding is actually exercised)."""
    rs = np.random.RandomState(3)
    B, D, h, w, C = 1, 8, 16, 16, 16
    x = jnp.asarray(rs.randn(B, D, h, w, C).astype(np.float32))
    reg = CostRegNet(8, conv_impl="xla")
    variables = reg.init(jax.random.PRNGKey(0), x, False)
    # randomize BN stats away from the (0, 1) init
    bs = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(
            rs.rand(*v.shape).astype(np.float32)) * 0.3,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    want = reg.apply(variables, x, False)[..., 0]

    folded = fold_costreg_variables(variables["params"],
                                    variables["batch_stats"])
    got = costreg_lanes(x, folded, lane_tile=512,
                        compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_lanes_module_param_tree_matches_xla():
    """CostRegNet(conv_impl='lanes') must init the exact same param tree
    (names, shapes, values) as the XLA impl, and its apply must agree."""
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(1, 8, 16, 16, 16).astype(np.float32))
    vx = CostRegNet(8, conv_impl="xla").init(jax.random.PRNGKey(7), x, False)
    import rcmvsnet_tpu.ops.pallas_costreg as pc
    import functools
    lanes_interp = functools.partial(pc.costreg_lanes,
                                     compute_dtype=jnp.float32,
                                     interpret=True)
    orig = pc.costreg_lanes
    pc.costreg_lanes = lanes_interp
    try:
        vl = CostRegNet(8, conv_impl="lanes").init(
            jax.random.PRNGKey(7), x, False)
        flat_x = jax.tree_util.tree_flatten_with_path(vx)[0]
        flat_l = jax.tree_util.tree_flatten_with_path(vl)[0]
        assert [p for p, _ in flat_x] == [p for p, _ in flat_l]
        for (px, ax), (_, al) in zip(flat_x, flat_l):
            np.testing.assert_array_equal(np.asarray(ax), np.asarray(al),
                                          err_msg=str(px))
        want = CostRegNet(8, conv_impl="xla").apply(vx, x, False)
        got = CostRegNet(8, conv_impl="lanes").apply(vx, x, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
    finally:
        pc.costreg_lanes = orig
