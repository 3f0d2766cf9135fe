"""Pallas TPU kernel for plane-sweep homography warping.

Why: XLA lowers the per-pixel bilinear gather of homo_warp to scalar-ish
gathers running at ~8 GB/s — the warp dominates the whole cascade forward
(SURVEY §5: the cost volume is this model's memory/bandwidth analogue of
long-context attention). This kernel restructures the warp as MXU work:

  * the source feature map stays RESIDENT IN VMEM for the whole sweep,
    laid out [h·C, w] (row-major (y, c)) so a y-band of rows is one
    contiguous dynamic slice;
  * per (depth, output-row) grid step, bilinear interpolation becomes
      band[BAND·C, w] @ hat_x[w, W]          (one MXU matmul)
    followed by a cheap VPU contraction with the 2-tap y hat weights —
    hat(x−k) = max(0, 1−|x−k|) reproduces torch's zeros-padded bilinear
    exactly (out-of-image taps get zero weight);
  * sample coordinates are computed in XLA (f32, Precision.HIGHEST) and
    streamed as per-row blocks.

The y-band (static BAND rows) must cover each 8-row group's source-y
spread. This is a HOST-SIDE PRECONDITION, not an in-kernel fallback: the
kernel silently zeros out-of-band taps when violated. Callers must gate
with `check_band_coverage(...)` once per scan/shape and use the gather
path (ops/warp.py) otherwise — keeping both paths inside one jit behind
lax.cond would double peak HBM, so path selection happens before tracing.

NOTE: this v1 kernel is a library/profiling op (scripts/profile_*) — no
production path calls it anymore. The cascade's fused eval path uses the
v2 lanes kernel (ops/pallas_warp2.py, gated by the drivers'
check_group_coverage via cli/eval_dtu.pick_fast_path), and its non-fused
fallback is always the XLA warp, precisely because this kernel's
precondition cannot be checked from inside jit.

Parity target: homo_warping (/root/reference/models/modules.py:304-339) and
the streamed variance of /root/reference/models/casmvsnet.py:68-100.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.geometry import project_to_grid, relative_projection
from .warp import homo_warp


ROWS_PER_STEP = 8  # TPU sublane granule; also amortizes per-step overhead


def _warp_rows_kernel(src_ref, px_ref, py_ref, out_ref, *, band: int,
                      height: int, channels: int, compute_dtype):
    """One grid step: warp ROWS_PER_STEP output rows (same depth plane,
    adjacent image rows) with ONE shared y-band slice and ONE batched MXU
    matmul. out_ref block: [1, C, R, W]."""
    R = ROWS_PER_STEP
    W = px_ref.shape[-1]
    w_src = src_ref.shape[-1]
    # pin explicitly: bf16 operands must NOT inherit a global 'highest'
    # default (Mosaic rejects fp32 contract precision on bf16 vectors)
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    ymin = jnp.clip(jnp.floor(jnp.min(py_ref[:])).astype(jnp.int32), 0,
                    height - band)
    rows = src_ref[pl.ds(ymin * channels, band * channels), :]
    rows = rows.astype(compute_dtype)          # [band·C, w] — ONE slice/step

    kx = jax.lax.broadcasted_iota(jnp.int32, (w_src, W), 0).astype(jnp.float32)
    jy = (jax.lax.broadcasted_iota(jnp.int32, (band * channels, W), 0)
          // channels).astype(jnp.float32) + ymin.astype(jnp.float32)

    for r in range(R):
        px = px_ref[r, :]
        py = py_ref[r, :]
        hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(px[None, :] - kx))
        out_x = jnp.dot(rows, hat_x.astype(compute_dtype),
                        preferred_element_type=jnp.float32,
                        precision=precision)   # [band·C, W] f32
        hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(py[None, :] - jy))
        acc = (out_x * hat_y).reshape(band, channels, W)
        out_ref[0, :, r] = jnp.sum(acc, axis=0).astype(out_ref.dtype)


def warp_volume_pallas(src_feat: jnp.ndarray, px: jnp.ndarray,
                       py: jnp.ndarray, band: int = 24,
                       compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Warp one source view over all depth hypotheses.

    src_feat: [h, w, C]; px, py: [D, h, W] pixel-space sample coords.
    Returns [D, h, C, W] (channel-major rows; transpose once downstream).
    The y-band is shared across each 8-row group, so `band` must cover the
    group's source-y spread (checked by _band_coverage_ok group-wise).
    """
    h, w, C = src_feat.shape
    D, hh, W = px.shape
    src2d = src_feat.astype(compute_dtype).transpose(0, 2, 1).reshape(h * C, w)
    n_rows = D * hh
    assert hh % ROWS_PER_STEP == 0, (D, hh)
    n_steps = n_rows // ROWS_PER_STEP
    px2 = px.reshape(n_rows, W)
    py2 = py.reshape(n_rows, W)

    kernel = functools.partial(_warp_rows_kernel, band=band, height=h,
                               channels=C, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((h * C, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_PER_STEP, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_PER_STEP, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, ROWS_PER_STEP, W),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        # f32 output unconditionally: Mosaic rejects the strided bf16 store,
        # and the variance accumulation downstream is f32 anyway
        out_shape=jax.ShapeDtypeStruct((n_steps, C, ROWS_PER_STEP, W),
                                       jnp.float32),
        # default scoped-vmem limit is 16MB; the resident source map plus
        # pipeline buffers need more at full-resolution stages (v5e has
        # 128MB physical VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=src2d.size * src2d.dtype.itemsize
            + 24 * 1024 * 1024),
    )(src2d, px2, py2)
    # [steps, C, R, W] → [D, h, C, W]
    out = out.reshape(D, hh // ROWS_PER_STEP, C, ROWS_PER_STEP, W)
    return out.transpose(0, 1, 3, 2, 4).reshape(D, hh, C, W)


def _pixel_coords(proj, depth_values, height, width):
    """Clamped pixel-space sample coords [B, D, H, W] for one view."""
    x, y = project_to_grid(proj, jax.lax.stop_gradient(depth_values),
                           height, width)
    B = x.shape[0]
    D = depth_values.shape[1]
    px = (x + 1.0) * (width - 1) / 2.0
    py = (y + 1.0) * (height - 1) / 2.0
    # clamp wild out-of-image coords (z≈0 projections) to a harmless
    # just-outside range — identical zeros-padding result, finite floors
    px = jnp.clip(px, -2.0, width + 1.0).reshape(B, D, height, width)
    py = jnp.clip(py, -2.0, height + 1.0).reshape(B, D, height, width)
    return px, py


def _band_coverage_ok(py, height, band):
    """Exact condition for each 8-row group's y-band to cover every
    nonzero tap: all taps in [max(0,⌊min⌋), min(h−1,⌊max⌋+1)] must fit in
    the clipped window [clip(⌊min⌋, 0, h−band), +band)."""
    B, D, H, W = py.shape
    groups = py.reshape(B, D, H // ROWS_PER_STEP, ROWS_PER_STEP * W)
    lo = jnp.floor(jnp.min(groups, axis=-1))
    hi = jnp.floor(jnp.max(groups, axis=-1)) + 1.0
    start = jnp.clip(lo, 0.0, float(height - band))
    first = jnp.maximum(jnp.maximum(lo, 0.0), start)
    last = jnp.minimum(float(height - 1), hi)
    return jnp.all(last - first <= band - 1)


def check_band_coverage(proj_pairs, depth_values, height, width,
                        band: int = 24) -> bool:
    """Host-side precondition check for the fast path: can every 8-row
    group's source-y spread fit the static band? Drivers call this once per
    scan/shape (the geometry is per-dataset, not per-step) and select the
    fast or gather path accordingly — keeping both paths inside one jit as
    lax.cond doubles peak HBM.

    proj_pairs: [B, V, 2, 4, 4] numpy; depth_values: [B, D] or [B,D,H,W].
    """
    import numpy as np
    from ..core.geometry import compose_projection
    projs = jax.device_get(compose_projection(jnp.asarray(proj_pairs)))
    dv = jnp.asarray(depth_values)
    if dv.ndim == 2:
        from ..core.geometry import linspace_depth_samples
        dv = linspace_depth_samples(dv, dv.shape[1], height, width)
    ok = True
    for v in range(1, projs.shape[1]):
        proj = relative_projection(jnp.asarray(projs[:, v]),
                                   jnp.asarray(projs[:, 0]))
        _, py = _pixel_coords(proj, dv, height, width)
        ok = ok and bool(jax.device_get(_band_coverage_ok(py, height, band)))
    return ok


def plane_sweep_variance_fast(ref_feat: jnp.ndarray, src_feats,
                              src_projs, ref_proj: jnp.ndarray,
                              depth_values: jnp.ndarray, band: int = 24,
                              compute_dtype=jnp.bfloat16):
    """Variance cost volume with the Pallas warp (eval fast path).

    Same contract as ops.warp.plane_sweep_variance (minus warped outputs).
    PRECONDITION: the static y-band covers every 8-row group's source-y
    spread — validate with check_band_coverage before selecting this path
    (violations silently zero out-of-band taps).
    """
    B, H, W, C = ref_feat.shape
    D = depth_values.shape[1]
    if isinstance(src_feats, (list, tuple)):
        src_list = list(src_feats)
        proj_list = list(src_projs)
    else:
        src_list = [src_feats[:, i] for i in range(src_feats.shape[1])]
        proj_list = [src_projs[:, i] for i in range(src_projs.shape[1])]
    num_views = len(src_list) + 1

    vol_sum = jnp.moveaxis(
        jnp.broadcast_to(ref_feat.transpose(0, 3, 1, 2)[:, None],
                         (B, D, C, H, W)), 2, 3).astype(jnp.float32)
    vol_sq = vol_sum * vol_sum
    for src, src_proj in zip(src_list, proj_list):
        proj = jax.lax.stop_gradient(relative_projection(src_proj, ref_proj))
        px, py = _pixel_coords(proj, depth_values, H, W)
        warped = jax.vmap(
            lambda s, a, b: warp_volume_pallas(s, a, b, band, compute_dtype)
        )(src, px, py).astype(jnp.float32)              # [B, D, H, C, W]
        vol_sum = vol_sum + warped
        vol_sq = vol_sq + warped * warped
    mean = vol_sum / num_views
    var = vol_sq / num_views - mean * mean
    return jnp.moveaxis(var, 3, 4).astype(ref_feat.dtype)  # [B, D, H, W, C]
