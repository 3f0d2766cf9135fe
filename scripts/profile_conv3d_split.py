"""Split conv3d cost into XLA glue vs pallas kernel (dev tool)."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rcmvsnet_tpu.ops import pallas_conv3d as pc


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
    key = jax.random.PRNGKey(0)
    D, H, W, Ci, Co = 32, 432, 576, 16, 8
    x = jax.random.normal(key, (D, H, W, Ci), jnp.bfloat16)
    kern = jax.random.normal(key, (3, 3, 3, Ci, Co), jnp.bfloat16) * 0.1

    xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
    P, hp, wp = xp.shape[0], xp.shape[1], xp.shape[2]
    ci_p, co_p = 16, 8
    lanes0 = hp * wp
    halo = pc._round_up(wp + 1, 128)
    L = 16384
    n_tiles = -(-lanes0 // L)
    lh = L + 2 * halo

    @jax.jit
    def glue(xp):
        x_cm = jnp.transpose(xp, (0, 3, 1, 2)).reshape(P, ci_p, lanes0)
        x_cm = jnp.pad(x_cm, ((0, 0), (0, 0),
                              (halo, halo + n_tiles * L - lanes0)))
        return jnp.stack([x_cm[:, :, i * L:i * L + lh]
                          for i in range(n_tiles)], axis=1)

    t_glue = timeit(glue, xp)
    x_win = glue(xp)
    print(f"glue (transpose+pad+stack): {t_glue:.2f} ms; x_win {x_win.shape}")

    w_packed = pc._pack_weights(kern, ci_p, co_p).astype(jnp.bfloat16)
    k = functools.partial(pc._conv_plane_kernel, co=co_p, wp=wp, halo=halo,
                          lane_tile=L, compute_dtype=jnp.bfloat16)
    bytes_in = 3 * ci_p * lh * 2
    vmem_bytes = int(min(100 * 1024 * 1024,
                         2 * (2 * bytes_in + co_p * L * 4)
                         + 9 * co_p * lh * 4 + 4 * 1024 * 1024))

    @jax.jit
    def run_kernel(w_packed, x_win):
        return pl.pallas_call(
            k,
            grid=(P - 2, n_tiles),
            in_specs=[
                pl.BlockSpec((9 * co_p, 3 * ci_p), lambda d, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ci_p, lh), lambda d, i: (d, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ci_p, lh), lambda d, i: (d + 1, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ci_p, lh), lambda d, i: (d + 2, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, co_p, L), lambda d, i: (d, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P - 2, n_tiles, co_p, L),
                                           jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        )(w_packed, x_win, x_win, x_win)

    t_kern = timeit(run_kernel, w_packed, x_win)
    steps = (P - 2) * n_tiles
    print(f"pallas_call alone: {t_kern:.2f} ms over {steps} steps "
          f"= {t_kern / steps * 1000:.1f} us/step")

    out = run_kernel(w_packed, x_win)

    @jax.jit
    def unglue(out):
        o = jnp.transpose(out, (0, 2, 1, 3)).reshape(P - 2, co_p, n_tiles * L)
        o = o[:, :Co, :lanes0].reshape(P - 2, Co, hp, wp)
        return jnp.transpose(o[:, :, 1:hp - 1, 1:wp - 1], (0, 2, 3, 1))

    print(f"unglue: {timeit(unglue, out):.2f} ms")


if __name__ == "__main__":
    main()
