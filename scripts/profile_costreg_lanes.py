"""Piecewise timing of the lanes costreg pipeline at stage shapes (dev)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rcmvsnet_tpu.ops.pallas_costreg import (conv_lanes, make_layout,
                                             stuff_hw_z, subsample_hw,
                                             to_lanes)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        jax.tree_util.tree_map(lambda x: float(x.reshape(-1)[0]), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(lambda x: float(x.reshape(-1)[0]), r)
    return (time.perf_counter() - t0) / iters * 1000


def stage(D, h, w, C, label):
    print(f"--- {label}: D={D} {h}x{w} C={C}")
    key = jax.random.PRNGKey(0)
    lay0 = make_layout(h, w)
    lay1 = make_layout(h // 2, w // 2)
    var = jax.random.normal(key, (D, h, w, C), jnp.bfloat16)
    cip = -(-C // 8) * 8

    f_to = jax.jit(lambda v: to_lanes(v, lay0, cip, jnp.bfloat16))
    print(f"to_lanes: {timeit(f_to, var):.2f} ms")
    x = f_to(var)

    k = jax.random.normal(key, (3, 3, 3, C, 8), jnp.float32) * 0.1
    b = jnp.zeros((8,), jnp.float32)
    f_c0 = jax.jit(lambda x: conv_lanes(x, k, b, lay0))
    print(f"conv0 ({C}->8): {timeit(f_c0, x):.2f} ms")
    c0 = f_c0(x)

    k1 = jax.random.normal(key, (3, 3, 3, 8, 16), jnp.float32) * 0.1
    b1 = jnp.zeros((16,), jnp.float32)
    f_c1 = jax.jit(lambda c0: conv_lanes(c0, k1, b1, lay0, z_stride=2))
    print(f"conv1 s2 full-lane: {timeit(f_c1, c0):.2f} ms")
    c1 = f_c1(c0)

    f_sub = jax.jit(lambda c1: subsample_hw(c1, lay0, lay1))
    print(f"subsample_hw: {timeit(f_sub, c1):.2f} ms")

    # deconv11-like stuffing: level1 16ch volume -> stuffed level0
    d1 = jax.random.normal(key, (D // 2 + 2, 16, lay1.lanesp), jnp.bfloat16)
    f_st = jax.jit(lambda d1: stuff_hw_z(d1, lay1, lay0))
    print(f"stuff_hw_z (lvl1->lvl0): {timeit(f_st, d1):.2f} ms")
    st = f_st(d1)

    k11 = jax.random.normal(key, (3, 3, 3, 16, 8), jnp.float32) * 0.1
    f_d11 = jax.jit(lambda st, c0: conv_lanes(st, k11, b, lay0, skip=c0))
    print(f"deconv11 conv+skip: {timeit(f_d11, st, c0):.2f} ms")

    kp = jax.random.normal(key, (3, 3, 3, 8, 1), jnp.float32) * 0.1
    f_p = jax.jit(lambda c0: conv_lanes(
        c0, kp, jnp.zeros((1,), jnp.float32), lay0, relu=False,
        out_dtype=jnp.float32))
    print(f"prob: {timeit(f_p, c0):.2f} ms")


if __name__ == "__main__":
    stage(8, 864, 1152, 8, "S3")
    stage(32, 432, 576, 16, "S2")
