"""Pallas TPU kernels for the 3D U-Net cost regularizers.

Why: XLA lowers 3D convolutions on this chip at ~1-4 TFLOP/s (~2% of MXU
peak even at 128 channels — round-1 profile), making CostRegNet the single
largest eval cost (~272 ms/forward at 1152×864). This module restructures
the 3×3×3 convolution as MXU matmuls over a channel-major, lane-flattened
volume layout:

  * the volume lives as [planes, C, lanes] where lanes = flattened padded
    (h, w) — channels on sublanes, space on lanes;
  * per (output-plane, lane-tile) grid step, ONE matmul computes all 27
    taps' partial products:
        Y[9·Co, lanes] = W_packed[9·Co, 3·Ci] @ X_cat[3·Ci, lanes]
    where K packs the 3 dz-taps (X_cat stacks the d−1/d/d+1 planes on
    sublanes) and N packs the 9 (dy,dx)-taps × Co;
  * the epilogue combines taps with 9 static sublane-slice + lane-shift
    adds (out[co, r] = Σ_t Y[t·Co+co, r+δ(t)], δ(t) = (dy−1)·Wp + (dx−1))
    — full-width VPU work, no gathers;
  * stride-2 convolutions run the same kernel and subsample the output
    (stride-2 FLOPs are ~12% of the stack, the waste is cheaper than a
    second kernel); transposed convolutions zero-stuff the input with
    lax.pad interior dilation and run the same kernel with the torch
    ConvTranspose (k−1−p, k−1−p+op) asymmetric padding.

MXU utilization at Co=8, Ci=32 (conv0): M=72, K=96 of a 128×128 pass
≈ 42% — vs ~2% for the XLA conv lowering.

Parity targets: ConvBnReLU3D/CostRegNet (/root/reference/models/
modules.py:45-58,470-501) and the rendering CostReg
(/root/reference/models/render_models.py:690-734). Numerical contract:
identical math to lax.conv_general_dilated with NDHWC/DHWIO, verified by
tests/test_pallas_conv3d.py against the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pack_weights(kernel: jnp.ndarray, ci_pad: int, co_pad: int) -> jnp.ndarray:
    """[3, 3, 3, Ci, Co] → [9·Co', 3·Ci'] with channel padding.

    Row (dy·3+dx)·Co' + co, column dz·Ci' + ci = kernel[dz, dy, dx, ci, co].
    """
    k = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0),
                         (0, ci_pad - kernel.shape[3]),
                         (0, co_pad - kernel.shape[4])))
    k = jnp.transpose(k, (1, 2, 4, 0, 3))  # [dy, dx, co, dz, ci]
    return k.reshape(9 * co_pad, 3 * ci_pad)


def _conv_plane_kernel(w_ref, x0_ref, x1_ref, x2_ref, out_ref, *,
                       co: int, wp: int, halo: int, lane_tile: int,
                       compute_dtype):
    """One grid step: one output plane × one lane tile.

    x refs: [1, 1, Ci', Lh] — the d−1 / d / d+1 input planes' lane windows;
    w_ref: [9·Co', 3·Ci'] packed taps; out: [1, 1, Co', L].
    """
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    x_cat = jnp.concatenate(
        [x0_ref[0, 0], x1_ref[0, 0], x2_ref[0, 0]],
        axis=0).astype(compute_dtype)                        # [3Ci', Lh]
    y = jnp.dot(w_ref[:].astype(compute_dtype), x_cat,
                preferred_element_type=jnp.float32,
                precision=precision)                          # [9Co', Lh]
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = dy * 3 + dx
            off = halo + (dy - 1) * wp + (dx - 1)
            piece = y[t * co:(t + 1) * co, off:off + lane_tile]
            acc = piece if acc is None else acc + piece
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _conv3d_padded_planes(xp: jnp.ndarray, kernel: jnp.ndarray,
                          hp: int, wp: int, lane_tile: int | None,
                          interpret: bool = False) -> jnp.ndarray:
    """Core op on an already-padded volume.

    xp: [P, Hp, Wp, Ci] zero-padded so every output position p ∈ [1, ·−1)
    per axis has all 27 taps in-bounds. Returns the full interior
    correlation [P−2, Hp−2, Wp−2, Co] (torch Conv3d k=3, stride 1, pad
    baked into xp).
    """
    P = xp.shape[0]
    ci, co = kernel.shape[3], kernel.shape[4]
    ci_p, co_p = _round_up(ci, 8), _round_up(co, 8)
    compute_dtype = xp.dtype

    lanes0 = hp * wp
    halo = _round_up(wp + 1, 128)
    if lane_tile is None:
        # VMEM-budget-driven tile: the f32 tap-partials Y [9·Co', Lh] are
        # the dominant buffer; keep Y + double-buffered inputs + output
        # under ~12 MB or Mosaic faults at the larger-channel layers
        itemsize = np.dtype(compute_dtype).itemsize
        per_lane = (9 * co_p * 4 + 3 * ci_p * itemsize * 2
                    + co_p * itemsize * 2)
        budget = 12 * 1024 * 1024 - 2 * halo * (9 * co_p * 4
                                                + 3 * ci_p * itemsize * 2)
        lane_tile = max(512, min(16384, budget // per_lane))
    L = _round_up(min(lane_tile, _round_up(lanes0, 128)), 128)
    n_tiles = -(-lanes0 // L)
    lh = L + 2 * halo

    # channel-major, lane-flattened, channel-padded
    x_cm = jnp.transpose(
        jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, ci_p - ci))),
        (0, 3, 1, 2)).reshape(P, ci_p, lanes0)
    x_cm = jnp.pad(x_cm, ((0, 0), (0, 0),
                          (halo, halo + n_tiles * L - lanes0)))
    # overlapping lane windows (±halo) so tap shifts stay in-block; this
    # is what lets plain BlockSpecs pipeline the tiles (no manual DMA)
    x_win = jnp.stack([x_cm[:, :, i * L:i * L + lh]
                       for i in range(n_tiles)], axis=1)  # [P, n, Ci', Lh]

    w_packed = _pack_weights(kernel, ci_p, co_p).astype(compute_dtype)

    kern = functools.partial(
        _conv_plane_kernel, co=co_p, wp=wp, halo=halo, lane_tile=L,
        compute_dtype=compute_dtype)
    bytes_in = 3 * ci_p * lh * np.dtype(compute_dtype).itemsize
    vmem_bytes = int(min(100 * 1024 * 1024,
                         2 * (2 * bytes_in + co_p * L * 4)
                         + 9 * co_p * lh * 4 + 4 * 1024 * 1024))
    out = pl.pallas_call(
        kern,
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
                                       compute_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        # omit interpret=False so test fixtures can setdefault(True)
        **({"interpret": True} if interpret else {}),
    )(w_packed, x_win, x_win, x_win)

    # [P−2, n, Co', L] → [P−2, Co', lanes] → interior NDHWC
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(P - 2, co_p, n_tiles * L)
    out = out[:, :co, :lanes0].reshape(P - 2, co, hp, wp)
    return jnp.transpose(out[:, :, 1:hp - 1, 1:wp - 1], (0, 2, 3, 1))


def conv3d_lanewise(x: jnp.ndarray, kernel: jnp.ndarray,
                    strides=(1, 1, 1), transposed: bool = False,
                    lane_tile: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """3×3×3 conv (torch Conv3d semantics, padding=1) on one sample.

    x: [D, H, W, Ci]; kernel: [3, 3, 3, Ci, Co] (DHWIO correlation, the
    flax/lax layout). strides ∈ {(1,1,1), (2,2,2)}. transposed=True gives
    torch ConvTranspose3d(k=3, stride=2, padding=1, output_padding=1)
    semantics (kernel applied as correlation on the zero-stuffed input,
    matching lax.conv_general_dilated with lhs_dilation — see
    nn/layers.py DeconvBNAct).
    """
    assert kernel.shape[:3] == (3, 3, 3), kernel.shape
    if transposed:
        # interior dilation + (k−1−p, k−1−p+op) = (1, 2) edge pads, one op
        xp = jax.lax.pad(x, jnp.zeros((), x.dtype),
                         [(1, 2, 1), (1, 2, 1), (1, 2, 1), (0, 0, 0)])
    else:
        xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
    out = _conv3d_padded_planes(xp, kernel, xp.shape[1], xp.shape[2],
                                lane_tile, interpret)
    if not transposed and tuple(strides) == (2, 2, 2):
        # de-interleave via pad+reshape: an XLA strided slice ([::2]) of the
        # kernel's output deterministically faults the TPU worker whenever
        # compute is fused upstream of the custom call on this libtpu; the
        # reshape-based split does not
        d, h, w, c = out.shape
        out = jnp.pad(out, ((0, d % 2), (0, h % 2), (0, w % 2), (0, 0)))
        out = out.reshape((d + 1) // 2, 2, (h + 1) // 2, 2,
                          (w + 1) // 2, 2, c)[:, 0, :, 0, :, 0]
    elif tuple(strides) != (1, 1, 1) and not transposed:
        raise NotImplementedError(strides)
    return out
