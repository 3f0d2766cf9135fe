"""Fused softmax + depth regression + photometric confidence (Pallas TPU).

Why: the cascade tail materializes the f32 probability volume several times
(softmax, Σp·d, pad+cumsum window, take_along_axis gather) — XLA lowers the
per-pixel depth-index gather poorly and the tail costs ~35 ms/forward at
1152×864 (round-2 profile). This kernel reads the regularized cost volume
ONCE per pixel tile, keeps the depth axis on sublanes, and emits the final
depth and confidence maps directly:

  * softmax over D in f32 registers (max-subtract, exp, normalize);
  * depth = Σ p·d with the per-pixel hypothesis planes streamed alongside;
  * confidence = 4-window probability mass at the soft-argmax index — the
    window sums are three sublane-shifted adds and the gather is a one-hot
    contraction over D (D ≤ 48, full-lane VPU work, no scatter/gather).

Parity targets: depth_regression (/root/reference/models/modules.py:519-525)
and the photometric-confidence block
(/root/reference/models/casmvsnet.py:115-122): pad (1, 2) along depth,
sliding window-4 sum, gathered at trunc(Σ p·i) clamped to [0, D−1].
Numerical contract: matches models/cascade.py's unfused
softmax/depth_regression/photometric_confidence path (tests/test_pallas_tail.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .pallas_conv3d import _round_up  # shared lane/tile rounding


def _tail_kernel(cost_ref, dv_a, dv_b, depth_ref, conf_ref, *,
                 ndepth: int, planes_mode: bool):
    c = cost_ref[:].astype(jnp.float32)            # [D, L]
    if planes_mode:
        # hypotheses linear in the plane index: dv = lo + d·step
        iota_d = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
        dv = dv_a[:] + iota_d.astype(jnp.float32) * dv_b[:]
    else:
        dv = dv_a[:].astype(jnp.float32)           # [D, L]
    m = jnp.max(c, axis=0, keepdims=True)
    e = jnp.exp(c - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    p = e / s                                      # [D, L] softmax over depth

    depth_ref[0, :] = jnp.sum(p * dv, axis=0)

    # sum4[d] = p[d−1] + p[d] + p[d+1] + p[d+2] (zeros outside), matching the
    # reference's pad-(1,2) + window-4 sliding sum along depth
    D = ndepth
    z1 = jnp.zeros((1, p.shape[1]), p.dtype)
    z2 = jnp.zeros((2, p.shape[1]), p.dtype)
    pm1 = jnp.concatenate([z1, p[:D - 1]], axis=0)
    pp1 = jnp.concatenate([p[1:], z1], axis=0)
    pp2 = jnp.concatenate([p[2:], z2], axis=0)
    sum4 = pm1 + p + pp1 + pp2                     # [D, L]

    iota_i = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    idx_f = jnp.sum(p * iota_i.astype(jnp.float32), axis=0,
                    keepdims=True)                          # [1, L]
    # trunc-toward-zero == torch .long() for the non-negative soft-argmax
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, D - 1)
    onehot = (iota_i == idx).astype(p.dtype)
    conf_ref[0, :] = jnp.sum(sum4 * onehot, axis=0)


def _tail_single(cost: jnp.ndarray, depth_values, lane_tile: int,
                 interpret: bool):
    """cost: [D, H, W]; depth_values: [D, H, W] or planes (lo, step)
    each [H, W] (single batch element)."""
    D, H, W = cost.shape
    lanes = H * W
    L = min(lane_tile, _round_up(lanes, 128))
    n_tiles = -(-lanes // L)
    pad = n_tiles * L - lanes
    planes_mode = isinstance(depth_values, tuple)

    c2 = jnp.pad(cost.reshape(D, lanes).astype(jnp.float32),
                 ((0, 0), (0, pad)))
    if planes_mode:
        lo, step = depth_values
        d_a = jnp.pad(lo.reshape(1, lanes).astype(jnp.float32),
                      ((0, 0), (0, pad)))
        d_b = jnp.pad(step.reshape(1, lanes).astype(jnp.float32),
                      ((0, 0), (0, pad)))
        dv_spec = pl.BlockSpec((1, L), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    else:
        d_a = jnp.pad(
            depth_values.reshape(D, lanes).astype(jnp.float32),
            ((0, 0), (0, pad)))
        # dv_b is only read in planes mode — stream a 1-row dummy instead
        # of a second full [D, L] copy of the depth volume per tile
        d_b = jnp.zeros((1, n_tiles * L), jnp.float32)
        dv_spec = pl.BlockSpec((D, L), lambda i: (0, i),
                               memory_space=pltpu.VMEM)

    dv_b_spec = (dv_spec if planes_mode else
                 pl.BlockSpec((1, L), lambda i: (0, i),
                              memory_space=pltpu.VMEM))
    kern = functools.partial(_tail_kernel, ndepth=D,
                             planes_mode=planes_mode)
    depth, conf = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((D, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            dv_spec,
            dv_b_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_tiles * L), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * L), jnp.float32),
        ],
        # ~6 f32 [D, L] live vectors (p, shifted sums, one-hot) + double-
        # buffered inputs; the 16 MB scoped default is too small at D=48
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(100 * 1024 * 1024,
                                     12 * D * L * 4 + 8 * 1024 * 1024))),
        **({"interpret": True} if interpret else {}),
    )(c2, d_a, d_b)
    return (depth[0, :lanes].reshape(H, W), conf[0, :lanes].reshape(H, W))


def fused_depth_tail(cost: jnp.ndarray, depth_values,
                     lane_tile: int = 8192, interpret: bool = False):
    """Fused softmax → (depth, photometric_confidence) over the depth axis.

    cost: [B, D, H, W] regularized cost volume (any float dtype; softmax in
    f32); depth_values: [B, D, H, W] per-pixel hypothesis planes, or a
    tuple (lo [B, H, W], step [B, H, W]) for hypotheses linear in the
    plane index (dv = lo + d·step) — D× less depth data streamed.
    Returns (depth [B, H, W] f32, confidence [B, H, W] f32) — identical to
    softmax + depth_regression + photometric_confidence in models/cascade.py.
    """
    fn = functools.partial(_tail_single, lane_tile=lane_tile,
                           interpret=interpret)
    if isinstance(depth_values, tuple):
        return jax.vmap(lambda c, lo, st: fn(c, (lo, st)))(
            cost, depth_values[0], depth_values[1])
    return jax.vmap(fn)(cost, depth_values)
