"""Sampling primitives: grid-sample parity with the reference's two distinct
bilinear samplers, plus torch-compatible n-linear / nearest resize.

Everything is NHWC / NDHWC (TPU-native channels-last), pure JAX, static
shapes. Gathers lower to XLA gather ops; the fused plane-sweep path in
ops/warp.py avoids materializing intermediate warped volumes.

Parity targets:
  * F.grid_sample(..., align_corners=True, padding_mode='zeros'|'border')
      — /root/reference/models/modules.py:335-336 (warp),
        /root/reference/models/render_utils.py:267-269 (color volume),
        /root/reference/models/render_utils.py:304-330 (3D volume lookup)
  * hand-rolled `_bilinear_sample` with its validity mask
      — /root/reference/losses/homography.py:117-200
  * F.interpolate bilinear/nearest/trilinear with either align_corners
      — used throughout the cascade and losses.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# grid_sample
# ---------------------------------------------------------------------------

def _unnormalize(coord, size):
    """align_corners=True: -1 ↦ 0, +1 ↦ size-1."""
    return (coord + 1.0) * (size - 1) / 2.0


def _gather_flat(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-batch point gather through a FLATTENED spatial axis.

    flat: [B, S, C]; idx: [B, N] int32 (already clipped in-range).
    Returns [B, N, C]. A 1D take_along_axis lowers to a single-axis XLA
    gather (and its VJP to a single-axis scatter-add) — measurably faster
    on TPU than the multi-dim advanced-indexing gather `im[yy, xx]`
    (scripts/profile_micro.py: the coordinate VJP of the 512×640 loss
    warp drops ~1.4×; the 3D volume scatter more)."""
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def grid_sample_2d(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """Bilinear sample img at normalized coords (align_corners=True).

    img: [B, H, W, C]; x, y: [B, *S] in [-1, 1].
    Returns [B, *S, C].

    'zeros' zero-fills each of the four taps that fall outside the image
    (per-tap, not per-sample) — exact torch semantics. 'border' clamps.
    """
    B, H, W, C = img.shape
    sample_shape = x.shape[1:]
    x = _unnormalize(x.reshape(B, -1), W)
    y = _unnormalize(y.reshape(B, -1), H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    flat = img.reshape(B, H * W, C)

    def tap(ix, iy):
        ix_c = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        vals = _gather_flat(flat, iy_c * W + ix_c)     # [B, N, C]
        if padding_mode == "zeros":
            valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
            vals = vals * valid[..., None].astype(vals.dtype)
        return vals

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return out.reshape(B, *sample_shape, C)


def grid_sample_3d(vol: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                   z: jnp.ndarray, padding_mode: str = "zeros") -> jnp.ndarray:
    """Trilinear sample vol at normalized coords (align_corners=True).

    vol: [B, D, H, W, C]; x→W, y→H, z→D each [B, *S] in [-1, 1].
    Returns [B, *S, C]. Matches torch 5-D grid_sample where the grid's last
    axis is ordered (x, y, z).
    """
    B, D, H, W, C = vol.shape
    sample_shape = x.shape[1:]
    x = _unnormalize(x.reshape(B, -1), W)
    y = _unnormalize(y.reshape(B, -1), H)
    z = _unnormalize(z.reshape(B, -1), D)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx, wy, wz = x - x0, y - y0, z - z0

    flat = vol.reshape(B, D * H * W, C)

    def tap(ix, iy, iz):
        ix_c = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        iz_c = jnp.clip(iz, 0, D - 1).astype(jnp.int32)
        vals = _gather_flat(flat, (iz_c * H + iy_c) * W + ix_c)
        if padding_mode == "zeros":
            valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
                     & (iz >= 0) & (iz <= D - 1))
            vals = vals * valid[..., None].astype(vals.dtype)
        return vals

    out = 0.0
    for dz, fz in ((z0, 1 - wz), (z0 + 1, wz)):
        for dy, fy in ((y0, 1 - wy), (y0 + 1, wy)):
            for dx, fx in ((x0, 1 - wx), (x0 + 1, wx)):
                out = out + tap(dx, dy, dz) * (fx * fy * fz)[..., None]
    return out.reshape(B, *sample_shape, C)


def loss_bilinear_sample(img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """The photometric-loss sampler with its validity mask.

    img: [B, H, W, C]; px, py: [B, H', W'] normalized to [-1, 1].
    Returns (sampled [B, H', W', C], mask [B, H', W', 1]).

    Reproduces /root/reference/losses/homography.py:117-200 exactly,
    including its idiosyncratic mask
        (x0 >= 0) & (x1 <= W-1) & (y0 >= 0) & (y0 <= H-1)
    (y1 is NOT range-checked; taps are clamped before gathering, so
    out-of-mask samples still hold border-ish values and are suppressed by
    the 1e4·(1-mask) penalty upstream).
    """
    B, H, W, C = img.shape
    out_shape = px.shape
    x = (px.reshape(B, -1) + 1.0) * (W - 1.0) / 2.0
    y = (py.reshape(B, -1) + 1.0) * (H - 1.0) / 2.0

    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = x0 + 1
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = y0 + 1

    mask = ((x0 >= 0) & (x1 <= W - 1) & (y0 >= 0) & (y0 <= H - 1)).astype(img.dtype)

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    flat = img.reshape(B, H * W, C)
    pa = _gather_flat(flat, y0c * W + x0c)
    pb = _gather_flat(flat, y1c * W + x0c)
    pc = _gather_flat(flat, y0c * W + x1c)
    pd = _gather_flat(flat, y1c * W + x1c)

    x1f = x1.astype(img.dtype)
    y1f = y1.astype(img.dtype)
    wa = ((x1f - x) * (y1f - y))[..., None]
    wb = ((x1f - x) * (1.0 - (y1f - y)))[..., None]
    wc = ((1.0 - (x1f - x)) * (y1f - y))[..., None]
    wd = ((1.0 - (x1f - x)) * (1.0 - (y1f - y)))[..., None]

    out = wa * pa + wb * pb + wc * pc + wd * pd
    return (out.reshape(B, *out_shape[1:], C),
            mask.reshape(B, *out_shape[1:], 1))


# ---------------------------------------------------------------------------
# torch-compatible resize
# ---------------------------------------------------------------------------

def _linear_axis_indices(in_size: int, out_size: int, align_corners: bool):
    """Source taps + weight for linear interpolation along one axis.

    Mirrors torch's area_pixel_compute_source_index: align_corners=True uses
    i*(in-1)/(out-1); False uses max(0, (i+0.5)*in/out - 0.5).
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        src = i * ((in_size - 1) / max(out_size - 1, 1))
    else:
        src = jnp.maximum((i + 0.5) * (in_size / out_size) - 0.5, 0.0)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w = (src - i0.astype(jnp.float32)).astype(jnp.float32)
    return i0, i1, w


def _nearest_axis_indices(in_size: int, out_size: int):
    """torch legacy 'nearest': src = floor(i * in / out)."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    return jnp.clip(jnp.floor(i * (in_size / out_size)).astype(jnp.int32),
                    0, in_size - 1)


def resize(x: jnp.ndarray, sizes, axes, method: str = "linear",
           align_corners: bool = False) -> jnp.ndarray:
    """Separable resize along `axes` to `sizes`, torch-interpolate semantics.

    method: 'linear' (bi/trilinear per torch align_corners flag) or 'nearest'
    (torch legacy floor indexing). Other axes are untouched.
    """
    for axis, out_size in zip(axes, sizes):
        in_size = x.shape[axis]
        if in_size == out_size:
            continue
        if method == "nearest":
            idx = _nearest_axis_indices(in_size, out_size)
            x = jnp.take(x, idx, axis=axis)
        elif method == "linear":
            i0, i1, w = _linear_axis_indices(in_size, out_size, align_corners)
            lo = jnp.take(x, i0, axis=axis)
            hi = jnp.take(x, i1, axis=axis)
            shape = [1] * x.ndim
            shape[axis] = out_size
            w = w.reshape(shape).astype(x.dtype)
            x = lo * (1 - w) + hi * w
        else:
            raise ValueError(f"unknown method {method}")
    return x


def resize_bilinear(x: jnp.ndarray, height: int, width: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """x: [..., H, W, C] → [..., height, width, C]."""
    return resize(x, (height, width), (-3, -2), "linear", align_corners)


def resize_nearest(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """x: [..., H, W, C] → [..., height, width, C] (torch 'nearest')."""
    return resize(x, (height, width), (-3, -2), "nearest")


def resize_trilinear(x: jnp.ndarray, depth: int, height: int, width: int,
                     align_corners: bool = False) -> jnp.ndarray:
    """x: [..., D, H, W, C] → [..., depth, height, width, C]."""
    return resize(x, (depth, height, width), (-4, -3, -2), "linear", align_corners)
