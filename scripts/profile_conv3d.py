"""Glue-vs-kernel split of the current pallas conv3d path (dev tool)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        jax.tree_util.tree_map(lambda x: float(x.reshape(-1)[0]), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(lambda x: float(x.reshape(-1)[0]), r)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from rcmvsnet_tpu.ops.pallas_conv3d import conv3d_lanewise

    key = jax.random.PRNGKey(0)
    # (label, D, H, W, Ci, Co, strides, transposed)
    cases = [
        ("S2 conv0 16->8 s1", 32, 432, 576, 16, 8, (1, 1, 1), False),
        ("S2 conv1 8->16 s2", 32, 432, 576, 8, 16, (2, 2, 2), False),
        ("S2 conv2 16->16 s1", 16, 216, 288, 16, 16, (1, 1, 1), False),
        ("S2 deconv11 16->8 t", 16, 216, 288, 16, 8, (2, 2, 2), True),
        ("S2 prob 8->1 s1", 32, 432, 576, 8, 1, (1, 1, 1), False),
        ("S3 conv0 8->8 s1", 8, 864, 1152, 8, 8, (1, 1, 1), False),
        ("S3 deconv11 16->8 t", 4, 432, 576, 16, 8, (2, 2, 2), True),
        ("S3 prob 8->1 s1", 8, 864, 1152, 8, 1, (1, 1, 1), False),
    ]
    for label, D, H, W, Ci, Co, s, tr in cases:
        x = jax.random.normal(key, (D, H, W, Ci), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, 3, Ci, Co), jnp.bfloat16) * 0.1
        f = jax.jit(lambda x, k: conv3d_lanewise(x, k, s, tr))
        t = timeit(f, x, k)
        ovox = (D * H * W) * (8 if tr else 1) // (8 if (s == (2, 2, 2) and not tr) else 1)
        gf = ovox * 27 * Ci * Co * 2 / 1e9
        print(f"{label}: {t:6.2f} ms  ({gf:.1f} GF compute incl waste, "
              f"{gf / t:.2f} TF/s)")


if __name__ == "__main__":
    main()
