"""Fused depth-tail kernel vs the unfused cascade path — interpret mode on
CPU. Parity targets: softmax + depth_regression + photometric_confidence
(models/cascade.py:41-69, mirroring /root/reference/models/modules.py:519-525
and /root/reference/models/casmvsnet.py:115-122)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcmvsnet_tpu.models.cascade import (depth_regression,
                                         photometric_confidence)
from rcmvsnet_tpu.ops.pallas_tail import fused_depth_tail


def _unfused(cost, dv):
    prob = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
    return depth_regression(prob, dv), photometric_confidence(prob)


@pytest.mark.parametrize("b,d,h,w", [
    (1, 48, 8, 16),
    (2, 32, 6, 20),
    (1, 8, 12, 12),    # stage-3 depth count
])
def test_matches_unfused(b, d, h, w):
    rs = np.random.RandomState(0)
    cost = jnp.asarray(rs.randn(b, d, h, w).astype(np.float32) * 3)
    dv = jnp.asarray(
        425.0 + 2.5 * np.arange(d, dtype=np.float32)[None, :, None, None]
        + rs.rand(b, d, h, w).astype(np.float32))
    depth, conf = fused_depth_tail(cost, dv, interpret=True)
    want_d, want_c = _unfused(cost, dv)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(want_d),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(want_c),
                               rtol=1e-5, atol=1e-5)


def test_lane_tiling_and_bf16_cost():
    """Multi-tile lane split must be seamless; bf16 cost volumes (the eval
    conv stack's output dtype) are promoted to f32 before the softmax."""
    rs = np.random.RandomState(1)
    b, d, h, w = 1, 16, 16, 24   # h*w = 384 -> 3 tiles of 128
    cost = jnp.asarray(rs.randn(b, d, h, w).astype(np.float32))
    dv = jnp.asarray(np.broadcast_to(
        np.linspace(400, 900, d, dtype=np.float32)[None, :, None, None],
        (b, d, h, w)).copy())
    depth, conf = fused_depth_tail(cost.astype(jnp.bfloat16), dv,
                                   lane_tile=128, interpret=True)
    want_d, want_c = _unfused(cost.astype(jnp.bfloat16), dv)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(want_d),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(want_c),
                               rtol=1e-4, atol=1e-4)


def test_argmax_window_edges():
    """Confidence at the depth-axis edges: the window-4 sum must see zeros
    outside [0, D) exactly like the reference's pad-(1,2) construction."""
    b, d, h, w = 1, 8, 1, 128
    # peaked costs at plane 0 and plane D-1 push idx to the clamp edges
    cost = np.full((b, d, h, w), -10.0, np.float32)
    cost[:, 0, :, :64] = 10.0
    cost[:, -1, :, 64:] = 10.0
    cost = jnp.asarray(cost)
    dv = jnp.asarray(np.broadcast_to(
        np.linspace(1, 2, d, dtype=np.float32)[None, :, None, None],
        (b, d, h, w)).copy())
    depth, conf = fused_depth_tail(cost, dv, interpret=True)
    want_d, want_c = _unfused(cost, dv)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(want_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(want_c),
                               rtol=1e-5, atol=1e-5)
