"""Lane-layout resample kernels (ops/pallas_resample.py) vs the XLA
reference passes they replace (pallas_costreg.subsample_hw / stuff_hw_z)
— interpret mode on CPU.  The kernels only copy values through 0/1
selection matmuls, so parity is exact."""
import jax.numpy as jnp
import numpy as np
import pytest

from rcmvsnet_tpu.ops.pallas_costreg import (make_layout, stuff_hw_z,
                                             subsample_hw)
from rcmvsnet_tpu.ops.pallas_resample import (stuff_lanes, subsample_lanes)


@pytest.mark.parametrize("h,w,P,C", [
    (16, 16, 10, 8),      # even levels
    (54, 72, 6, 16),      # odd halving (stage-1 level 2 → 3)
    (24, 40, 4, 8),
])
def test_subsample_matches_xla_pass(h, w, P, C):
    rs = np.random.RandomState(0)
    lay, lay2 = make_layout(h, w, 512), make_layout(h // 2, w // 2, 512)
    y = np.zeros((P, C, lay.lanesp), np.float32)
    body = rs.randn(P - 2, C, lay.h, lay.w).astype(np.float32)
    v = np.zeros((P, C, lay.hp, lay.wp), np.float32)
    v[1:-1, :, 1:-1, 1:1 + lay.w] = body
    y[:, :, lay.halo:lay.halo + lay.lanes0] = v.reshape(P, C, -1)
    y = jnp.asarray(y)
    want = subsample_hw(y, lay, lay2)
    got = subsample_lanes(y, lay, lay2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("h,w,D,C", [
    (8, 8, 4, 8),
    (27, 36, 3, 16),      # odd level up (stage-1 level 3 → 2)
    (12, 20, 2, 8),
])
def test_stuff_matches_xla_pass(h, w, D, C):
    rs = np.random.RandomState(1)
    lay, lay2 = make_layout(h, w, 512), make_layout(2 * h, 2 * w, 512)
    y = np.zeros((D + 2, C, lay.lanesp), np.float32)
    body = rs.randn(D, C, lay.h, lay.w).astype(np.float32)
    v = np.zeros((D + 2, C, lay.hp, lay.wp), np.float32)
    v[1:-1, :, 1:-1, 1:1 + lay.w] = body
    y[:, :, lay.halo:lay.halo + lay.lanes0] = v.reshape(D + 2, C, -1)
    y = jnp.asarray(y)
    want = stuff_hw_z(y, lay, lay2)
    got = stuff_lanes(y, lay, lay2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
