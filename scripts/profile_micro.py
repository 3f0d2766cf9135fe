"""Microbenchmarks of the train step's suspected non-MXU hot spots.

Times, each as its own jitted callable on the TPU:
  - XLA gather warp fwd (stage-1 want_volume shapes) + its VJP (scatter)
  - the loss-side inverse warp (per-stage shapes) fwd + VJP
  - render-branch grid_sample_3d fwd + VJP (scatter into the neural volume)
  - alternative gather formulations (flat 1D index) for comparison

Dev tool; not part of the bench contract. Run: python scripts/profile_micro.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def timeit(label, fn, *args, iters=10, warmup=2):
    fn = jax.jit(fn)
    for _ in range(warmup):
        r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0]), r)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:46s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    from rcmvsnet_tpu.ops.sampling import grid_sample_2d, grid_sample_3d, loss_bilinear_sample
    from rcmvsnet_tpu.ops.warp import homo_warp

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    # ---- stage-1 want_volume warp: [1,128,160,32] feat, D=48 ----
    h, w, C, D = 128, 160, 32, 48
    feat = jax.random.normal(ks[0], (1, h, w, C))
    px = jax.random.uniform(ks[1], (1, D * h * w), minval=-1, maxval=1)
    py = jax.random.uniform(ks[2], (1, D * h * w), minval=-1, maxval=1)

    def warp_fwd(f):
        return grid_sample_2d(f, px, py).sum()
    timeit("gs2d fwd  D48x128x160xC32", warp_fwd, feat)
    timeit("gs2d grad(feat) [scatter]", jax.grad(warp_fwd), feat)

    def warp3(f):  # 3 source views
        return sum(grid_sample_2d(f, px, py).sum() for _ in range(3))
    timeit("gs2d grad 3 views", jax.grad(warp3), feat)

    # ---- loss warp stage 3: [1,512,640,3] img ----
    H3, W3 = 512, 640
    img3 = jax.random.normal(ks[3], (1, H3, W3, 3))
    px3 = jax.random.uniform(ks[4], (1, H3, W3), minval=-1, maxval=1)
    py3 = jax.random.uniform(ks[5], (1, H3, W3), minval=-1, maxval=1)

    def loss_warp(px_, py_):
        o, m = loss_bilinear_sample(img3, px_, py_)
        return (o * m).sum()
    timeit("loss_bilinear 512x640x3 fwd", lambda: loss_warp(px3, py3))
    timeit("loss_bilinear grad(px,py)", jax.grad(loss_warp, argnums=(0, 1)),
           px3, py3)

    # flat-index alternative
    def loss_warp_flat(px_, py_):
        B, H, W, Cc = img3.shape
        x = (px_.reshape(B, -1) + 1.0) * (W - 1.0) / 2.0
        y = (py_.reshape(B, -1) + 1.0) * (H - 1.0) / 2.0
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        flat = img3.reshape(B, H * W, Cc)
        def g(xx, yy):
            idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
            return jnp.take_along_axis(flat, idx[..., None], axis=1)
        wa = ((x0 + 1 - x) * (y0 + 1 - y))[..., None]
        wb = ((x0 + 1 - x) * (y - y0))[..., None]
        wc = ((x - x0) * (y0 + 1 - y))[..., None]
        wd = ((x - x0) * (y - y0))[..., None]
        out = (wa * g(x0, y0) + wb * g(x0, y0 + 1)
               + wc * g(x0 + 1, y0) + wd * g(x0 + 1, y0 + 1))
        return out.sum()
    timeit("loss warp flat-idx fwd", lambda: loss_warp_flat(px3, py3))
    timeit("loss warp flat-idx grad", jax.grad(loss_warp_flat, argnums=(0, 1)),
           px3, py3)

    # ---- render volume sampling: [128,128,160,8], 1024x128 pts ----
    vol = jax.random.normal(ks[6], (1, 128, 128, 160, 8))
    N, S = 1024, 128
    gx = jax.random.uniform(ks[7], (1, N, S), minval=-1, maxval=1)
    gy = jax.random.uniform(ks[8], (1, N, S), minval=-1, maxval=1)
    gz = jax.random.uniform(ks[9], (1, N, S), minval=-1, maxval=1)

    def vol_sample(v):
        return grid_sample_3d(v, gx, gy, gz).sum()
    timeit("gs3d fwd 128x128x160x8 @131k", vol_sample, vol)
    timeit("gs3d grad(vol) [scatter]", jax.grad(vol_sample), vol)

    # ---- color volume sampling: 3 views x [512,640,3] @131k pts ----
    img = jax.random.normal(ks[10], (1, H3, W3, 3))
    cx = jax.random.uniform(ks[11], (1, N, S), minval=-1, maxval=1)
    cy = jax.random.uniform(ks[12], (1, N, S), minval=-1, maxval=1)

    def color(cx_, cy_):
        return sum(grid_sample_2d(img, cx_, cy_, padding_mode="border").sum()
                   for _ in range(3))
    timeit("color gs2d 3 views @131k fwd", lambda: color(cx, cy))
    timeit("color gs2d grad(coords)", jax.grad(color, argnums=(0, 1)), cx, cy)


if __name__ == "__main__":
    main()
