"""Differentiable lanes CostRegNet (ops/pallas_costreg_train.py +
nn/costreg.py train_impl='lanes') vs the XLA NDHWC train path — interpret
mode on CPU, f32 compute so the contract is near-exact.

Covers: the conv primitive's forward and custom-VJP backward (dx and dw,
z-stride 1 and 2, channel padding, multi lane tile), the train BN halves,
and the full U-Net modules (CostRegNet and RenderCostReg): outputs,
parameter/input gradients, and batch-stat updates against the reference
XLA implementation with an identical param tree.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from rcmvsnet_tpu.nn.costreg import CostRegNet, RenderCostReg
from rcmvsnet_tpu.ops.pallas_costreg import make_layout, to_lanes
from rcmvsnet_tpu.ops.pallas_costreg_train import (bn_apply_lanes,
                                                   bn_stats_lanes,
                                                   conv_lanes_t,
                                                   interpret_ctx)

DN = ("NDHWC", "DHWIO", "NDHWC")


def _xla_conv(x, kernel, strides=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x[None], kernel, window_strides=strides, padding=[(1, 1)] * 3,
        dimension_numbers=DN, precision=jax.lax.Precision.HIGHEST)[0]


def _from_lanes(y, lay, co):
    v = np.asarray(y)[1:-1, :co, lay.halo:lay.halo + lay.lanes0]
    v = v.reshape(v.shape[0], co, lay.hp, lay.wp)[:, :, 1:-1, 1:1 + lay.w]
    return np.transpose(v, (0, 2, 3, 1))


@pytest.mark.parametrize("ci,co,shape,zs,lane_tile", [
    (16, 8, (8, 8, 16), 1, 128),     # multi lane tile
    (8, 16, (8, 16, 8), 1, 512),
    (8, 1, (8, 8, 8), 1, 256),       # prob head channel padding
    (8, 16, (8, 16, 16), 2, 512),    # z-stride 2
    (12, 8, (6, 8, 8), 2, 256),      # odd D, non-multiple channels
])
def test_conv_fwd_and_grads_match_xla(ci, co, shape, zs, lane_tile):
    rs = np.random.RandomState(0)
    d, h, w = shape
    x = jnp.asarray(rs.randn(d, h, w, ci).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    g = jnp.asarray(rs.randn(*_xla_conv(x, k, (zs, 1, 1)).shape)
                    .astype(np.float32))
    lay = make_layout(h, w, lane_tile)
    ci_p = -(-ci // 8) * 8

    def lanes_fn(x, k):
        xl = to_lanes(x, lay, ci_p, jnp.float32)
        y = conv_lanes_t(xl, k, lay, z_stride=zs,
                         compute_dtype=jnp.float32, interpret=True)
        return jnp.asarray(_from_lanes_j(y, lay, co))

    def _from_lanes_j(y, lay, co):
        v = y[1:-1, :co, lay.halo:lay.halo + lay.lanes0]
        v = v.reshape(v.shape[0], co, lay.hp, lay.wp)[:, :, 1:-1,
                                                      1:1 + lay.w]
        return jnp.transpose(v, (0, 2, 3, 1))

    def xla_fn(x, k):
        return _xla_conv(x, k, (zs, 1, 1))

    got = lanes_fn(x, k)
    want = xla_fn(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    loss = lambda fn: (lambda x, k: jnp.sum(fn(x, k) * g))
    gx_got, gk_got = jax.grad(loss(lanes_fn), argnums=(0, 1))(x, k)
    gx_want, gk_want = jax.grad(loss(xla_fn), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_got), np.asarray(gk_want),
                               rtol=1e-4, atol=1e-5)


def test_bn_lanes_matches_torch_semantics():
    """bn_stats + bn_apply on a lanes tensor == TorchBatchNorm train mode
    on the NDHWC equivalent (biased var normalization)."""
    from rcmvsnet_tpu.nn.layers import TorchBatchNorm
    rs = np.random.RandomState(1)
    D, h, w, C = 4, 8, 16, 12
    x = jnp.asarray(rs.randn(D, h, w, C).astype(np.float32))
    scale = jnp.asarray(rs.rand(C).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.randn(C).astype(np.float32))
    lay = make_layout(h, w, 512)
    xl = to_lanes(x, lay, 16, jnp.float32)

    mean, var, n = bn_stats_lanes(xl, lay, C)
    assert n == D * h * w
    y = bn_apply_lanes(xl, lay, mean, var, scale, bias, relu=True)
    got = _from_lanes(y, lay, C)

    bn = TorchBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x[None], True)
    variables = {"params": {"scale": scale, "bias": bias},
                 "batch_stats": variables["batch_stats"]}
    want, mut = bn.apply(variables, x[None], True,
                         mutable=["batch_stats"])
    want = jax.nn.relu(want)[0]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)
    # running-stat update parity (torch momentum + unbiased var)
    m = 0.1
    unbiased = var * (n / (n - 1.0))
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), np.asarray(m * mean),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        np.asarray((1 - m) * 1.0 + m * unbiased), rtol=1e-5, atol=1e-6)


def _tree_allclose(a, b, rtol, atol):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (p, va), (_, vb) in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=rtol, atol=atol, err_msg=str(p))


@pytest.mark.parametrize("mod_cls,kwargs,out_slice", [
    (CostRegNet, dict(base_channels=8), True),
    (RenderCostReg, dict(base_channels=8), False),
])
def test_unet_train_lanes_matches_xla(mod_cls, kwargs, out_slice):
    """Full train-mode U-Net: identical init tree, matching outputs,
    parameter + input gradients, and batch-stat updates."""
    rs = np.random.RandomState(2)
    B, D, h, w, C = 1, 8, 16, 16, 16
    x = jnp.asarray(rs.randn(B, D, h, w, C).astype(np.float32))

    xla_mod = mod_cls(**kwargs)
    lanes_mod = mod_cls(train_impl="lanes", **kwargs)
    vx = xla_mod.init(jax.random.PRNGKey(3), x, True)
    with interpret_ctx():
        vl = lanes_mod.init(jax.random.PRNGKey(3), x, True)
    _tree_allclose(vx, vl, 0, 0)

    # randomize running stats so the update math is exercised
    bs = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(rs.rand(*v.shape).astype(np.float32)) * 0.3,
        vx["batch_stats"])
    vx = {"params": vx["params"], "batch_stats": bs}

    def run(mod, interpret):
        def loss_fn(params, xin):
            out, mut = mod.apply(
                {"params": params, "batch_stats": bs}, xin, True,
                mutable=["batch_stats"])
            return jnp.sum(out * out), (out, mut["batch_stats"])
        fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        if interpret:
            with interpret_ctx():
                return fn(vx["params"], x)
        return fn(vx["params"], x)

    (lw, (out_w, bs_w)), (gp_w, gx_w) = run(xla_mod, False)
    (lg, (out_g, bs_g)), (gp_g, gx_g) = run(lanes_mod, True)

    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_w),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(lg), float(lw), rtol=1e-5)
    _tree_allclose(bs_g, bs_w, 1e-4, 1e-5)
    # kernel grads are 2048-term f32 sums with heavy cancellation; the two
    # reduction orders legitimately differ by ~1e-3 abs on a few elements
    _tree_allclose(gp_g, gp_w, 1e-3, 2e-3)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_w),
                               rtol=1e-3, atol=1e-4)
