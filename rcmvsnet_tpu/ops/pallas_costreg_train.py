"""Differentiable lanes-layout 3D convolution — the TRAIN-side CostRegNet.

The eval cost regularizer (ops/pallas_costreg.py) runs the whole 3D U-Net
in the persistent channel-major lane layout at ~100× the MXU utilization
of XLA's small-channel NDHWC conv lowering — but it is forward-only
(eval-mode BN folded into the weights). Training therefore ran the U-Nets
through XLA at ~0.2% MFU, and the three cascade regularizers + the render
branch's U-Net dominate the train step.

This module makes the lanes conv a first-class differentiable primitive:

  * `conv_lanes_t(x, kernel, ...)` — jax.custom_vjp around the eval
    forward kernel (relu/bias/skip stripped; the epilogue border mask is
    linear and stays):
      - dx: a transposed 3×3×3 conv == the SAME forward kernel with the
        kernel flipped in (dz, dy, dx) and ci↔co swapped; the z-stride-2
        case routes through a z-interior-dilated cotangent (the lane-space
        analogue of lhs_dilation), so no new Pallas code on this path;
      - dw: one new Pallas kernel (`_dw_kernel`) with the forward's grid —
        per (output plane, lane tile) it builds the 27 shifted input
        windows as one [27·Ci', L] stack and contracts against the masked
        cotangent tile on the MXU, accumulating into a constant-index
        [27·Ci', Co'] f32 block (the TPU grid is sequential).
  * `bn_relu_lanes` — train-mode BatchNorm on the lanes tensor in plain
    XLA (two fused elementwise passes; the conv kernels stay the hot
    path). Exact TorchBatchNorm semantics: biased batch variance for
    normalization, the (mean, var) pair returned for the caller's running
    -stat update (nn/layers.py:58-102). Border lanes / padded channels
    stay exactly zero so downstream conv windows read valid zero padding.
  * `bn_stats_lanes` / `bn_apply_lanes` — the two BN halves split so the
    flax blocks (nn/costreg.py `_LanesConvBN`) can update their running
    stats between them; the U-Net composition itself lives in flax,
    mirroring ops/pallas_costreg.costreg_lanes with train BN between
    layers. Stride-2 h/w subsampling and transpose-conv zero-stuffing use
    the XLA lane-space helpers (subsample_hw / stuff_hw_z), which are
    natively differentiable.

Parity targets: CostRegNet / the render CostReg in train mode
(/root/reference/models/modules.py:470-501,
/root/reference/models/render_models.py:690-734) — numerically matching
the XLA NDHWC path (nn/costreg.py, conv_impl='xla') including gradients
and batch-stat updates (tests/test_pallas_costreg_train.py, f32
interpret).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_costreg import LaneLayout, _border_mask_np, conv_lanes

# Trace-time interpret default for kernels reached through flax modules
# (nn/costreg.py) that don't thread an interpret flag — the CPU test suite
# flips this via `interpret_ctx`. (jax's force_tpu_interpret_mode mangles
# the Element-indexed block specs these kernels use.)
_INTERPRET_DEFAULT = False


class interpret_ctx:
    """with interpret_ctx(): ...  — run lanes-train kernels interpreted."""

    def __enter__(self):
        global _INTERPRET_DEFAULT
        self._saved = _INTERPRET_DEFAULT
        _INTERPRET_DEFAULT = True

    def __exit__(self, *exc):
        global _INTERPRET_DEFAULT
        _INTERPRET_DEFAULT = self._saved


# ---------------------------------------------------------------------------
# differentiable conv primitive
# ---------------------------------------------------------------------------

def conv_lanes_t(x: jnp.ndarray, kernel: jnp.ndarray, lay: LaneLayout, *,
                 z_stride: int = 1, compute_dtype=jnp.bfloat16,
                 out_dtype=None,
                 interpret: bool | None = None) -> jnp.ndarray:
    """One differentiable 3×3×3 / stride-(z_stride,1,1) / padding-1 conv on
    the lanes layout (no bias, no activation — the U-Net blocks are
    conv(bias=False) → BN → ReLU, so the nonlinearity lives outside).

    x: [P_in, Ci', lanesp] with zero z-borders / lane margins;
    kernel: [3, 3, 3, Ci, Co] DHWIO (differentiable).
    Returns [P_out+2, Co', lanesp] (same contract as pallas_costreg
    .conv_lanes with relu=False and zero bias).
    """
    out_dtype = out_dtype or x.dtype
    if interpret is None:
        interpret = _INTERPRET_DEFAULT
    static = (lay, int(z_stride), jnp.dtype(compute_dtype).name,
              jnp.dtype(out_dtype).name, bool(interpret))
    return _conv_t(static, x, kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv_t(static, x, kernel):
    return _conv_t_fwd(static, x, kernel)[0]


def _run_fwd(static, x, kernel):
    lay, zs, cdt, odt, interpret = static
    ci, co = kernel.shape[3], kernel.shape[4]
    return conv_lanes(x, kernel, jnp.zeros((co,), jnp.float32), lay,
                      z_stride=zs, relu=False,
                      out_dtype=jnp.dtype(odt).type,
                      compute_dtype=jnp.dtype(cdt).type,
                      interpret=interpret)


def _conv_t_fwd(static, x, kernel):
    return _run_fwd(static, x, kernel), (x, kernel)


def _mask_ct(g, lay):
    """Zero the cotangent outside the interior (z-border planes, lane
    margins/borders): the forward writes constants there, so those
    positions carry no gradient — and the backward convolutions would
    otherwise read them as data."""
    mask = jnp.asarray(_border_mask_np(lay))            # [1, lanesp]
    g = g * mask[None].astype(g.dtype)
    zero = jnp.zeros((1,) + g.shape[1:], g.dtype)
    return jnp.concatenate([zero, g[1:-1], zero], axis=0)


def _conv_t_bwd(static, res, g):
    lay, zs, cdt, odt, interpret = static
    x, kernel = res
    g_m = _mask_ct(g, lay)

    # ---- dx: transposed conv == forward conv with flipped/swapped kernel
    k_t = jnp.transpose(jnp.flip(kernel, (0, 1, 2)), (0, 1, 2, 4, 3))
    if zs == 1:
        g_in = g_m
    else:
        # z-interior-dilate the real cotangent planes so the stride-1
        # conv with the flipped kernel lands each g[d] at input plane
        # 2d+1 (the forward's window origin): dx[p] = Σ k[dz]·g[(p−dz)/2]
        p_out = g_m.shape[0] - 2
        P_in = x.shape[0]
        g_real = g_m[1:-1]
        g_in = jax.lax.pad(
            g_real, jnp.zeros((), g_real.dtype),
            [(1, P_in - 2 * p_out, 1), (0, 0, 0), (0, 0, 0)])
    dx_static = (lay, 1, cdt, jnp.dtype(x.dtype).name, interpret)
    dx = _run_fwd(dx_static, g_in, k_t)

    # ---- dw: one Pallas contraction kernel over the forward's grid
    dw = _conv_dw(x, g_m, kernel.shape, lay, z_stride=zs,
                  compute_dtype=jnp.dtype(cdt).type, interpret=interpret)
    return dx, dw.astype(kernel.dtype)


_conv_t.defvjp(_conv_t_fwd, _conv_t_bwd)


def _dw_kernel(x_ref, g_ref, m_ref, out_ref, *, ci_p: int, co_p: int,
               wp: int, halo: int, L: int, interpret: bool,
               compute_dtype):
    """Accumulate dW[9·Ci', 3·Co'] over (output plane, lane tile) steps.

    x_ref: [3, Ci', L+2·halo] input window (the forward's three dz
    planes); g_ref: [1, Co', L+256] / m_ref: [1, L+256] cotangent + border
    mask with 128 lanes of neighbor context each side. The 9 (dz, dy)
    window slices are ±wp lane shifts — wp and halo are 128-multiples, so
    every slice is lane-ALIGNED (Mosaic cannot concatenate vectors with
    mismatched lane offsets) — and stack on sublanes; the 3 dx taps ride
    the cotangent side as lane rolls of the wide masked block. ONE
    [9·Ci', L]×[L, 3·Co'] MXU contraction per step yields all 27 taps.
    Each tile's ±1-rolled windows trade one edge lane with the neighbor
    tile (the union over tiles covers every lane exactly once), and the
    overall first/last lanes land on border rows the mask zeroes."""
    d = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((d == 0) & (i == 0))
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    roll = jnp.roll if interpret else pltpu.roll
    x = x_ref[...]
    pieces = []
    for dz in range(3):
        xz = x[dz]
        for dy in range(3):
            off = halo + (dy - 1) * wp
            pieces.append(xz[:, off:off + L])
    x_cat = jnp.concatenate(pieces, axis=0).astype(compute_dtype)
    gm = g_ref[0].astype(jnp.float32) * m_ref[0]     # [Co', L+256]
    # pltpu.roll requires non-negative shifts; the roll is cyclic so
    # shift −1 ≡ width−1
    g_pieces = [roll(gm, (dx - 1) % (L + 256), 1)[:, 128:128 + L]
                for dx in range(3)]
    g_cat = jnp.concatenate(g_pieces, axis=0).astype(compute_dtype)
    dw = jax.lax.dot_general(
        x_cat, g_cat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                        # [9·Ci', 3·Co']
    out_ref[...] += dw


def _conv_dw(x, g_m, kshape, lay, *, z_stride, compute_dtype, interpret):
    """dL/dkernel for the lanes conv. x: [P_in, Ci', lanesp];
    g_m: [P_out+2, Co', lanesp] masked cotangent. Returns [3,3,3,Ci,Co]
    f32."""
    P_in, ci_p, lanesp = x.shape
    ci, co = kshape[3], kshape[4]
    co_p = g_m.shape[1]
    H, L, n = lay.halo, lay.L, lay.n_tiles
    p_out = g_m.shape[0] - 2
    zs = z_stride

    # subdivide the lane tile to bound the stacked [9·Ci', L] windows +
    # [3·Co', L] rolled cotangent
    itemsize = np.dtype(compute_dtype).itemsize
    sub = 1
    while ((9 * ci_p + 3 * co_p) * (L // sub) * itemsize
           > 12 * 1024 * 1024
           and L % (2 * sub) == 0 and (L // (2 * sub)) % 128 == 0):
        sub *= 2
    Lk = L // sub
    lh = Lk + 2 * H

    mask = jnp.asarray(_border_mask_np(lay))
    lane_off = lambda v: pl.multiple_of(v, 128)
    in_specs = [
        pl.BlockSpec((pl.Element(3), pl.Element(ci_p), pl.Element(lh)),
                     lambda d, i: (zs * d, 0, lane_off(i * Lk)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pl.Element(1), pl.Element(co_p), pl.Element(Lk + 256)),
                     lambda d, i: (d + 1, 0, lane_off(H - 128 + i * Lk)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pl.Element(1), pl.Element(Lk + 256)),
                     lambda d, i: (0, lane_off(H - 128 + i * Lk)),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((9 * ci_p, 3 * co_p), lambda d, i: (0, 0),
                            memory_space=pltpu.VMEM)
    vmem = int(min(100 * 1024 * 1024,
                   2 * (3 * ci_p * lh * x.dtype.itemsize
                        + co_p * (Lk + 256) * g_m.dtype.itemsize
                        + (Lk + 256) * 4)
                   + (9 * ci_p + 3 * co_p) * Lk * itemsize
                   + 4 * co_p * (Lk + 256) * 4
                   + 27 * ci_p * co_p * 4 + 6 * 1024 * 1024))
    kern = functools.partial(_dw_kernel, ci_p=ci_p, co_p=co_p, wp=lay.wp,
                             halo=H, L=Lk, interpret=interpret,
                             compute_dtype=compute_dtype)
    dw = pl.pallas_call(
        kern,
        grid=(p_out, n * sub),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((9 * ci_p, 3 * co_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        **({"interpret": True} if interpret else {}),
    )(x, g_m, mask)
    dw = dw.reshape(3, 3, ci_p, 3, co_p).transpose(0, 1, 3, 2, 4)
    return dw[:, :, :, :ci, :co]


# ---------------------------------------------------------------------------
# train-mode BatchNorm on the lanes layout
# ---------------------------------------------------------------------------

def bn_stats_lanes(x: jnp.ndarray, lay: LaneLayout, C: int):
    """Per-channel batch mean / BIASED variance of a lanes tensor.

    x: [P, C', lanesp] with exact zeros outside the interior (the conv
    kernels guarantee this), so full-tensor sums equal interior sums and
    n = D·h·w. Returns (mean[C], var[C], n) — var is the biased batch
    variance torch normalizes with; the caller forms the unbiased
    running-stat update from n (nn/layers.py:89-95)."""
    P = x.shape[0]
    n = float((P - 2) * lay.h * lay.w)
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(0, 2))
    s2 = jnp.sum(xf * xf, axis=(0, 2))
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return mean[:C], var[:C], n


def bn_apply_lanes(x: jnp.ndarray, lay: LaneLayout, mean: jnp.ndarray,
                   var: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   *, relu: bool = True, eps: float = 1e-5) -> jnp.ndarray:
    """Normalize + scale/shift (+ ReLU) a lanes tensor with the given
    per-channel stats, keeping border lanes and padded channels exactly
    zero (downstream conv windows read them as padding)."""
    c_p = x.shape[1]
    C = mean.shape[0]
    pad = (0, c_p - C)
    inv = jnp.pad(jax.lax.rsqrt(var.astype(jnp.float32) + eps)
                  * scale.astype(jnp.float32), pad)
    mean_p = jnp.pad(mean.astype(jnp.float32), pad)
    bias_p = jnp.pad(bias.astype(jnp.float32), pad)
    mask = jnp.asarray(_border_mask_np(lay))            # [1, lanesp]
    # z-border planes must ALSO stay zero: the input is zero there but BN
    # would shift them to (bias − mean·inv), which the next conv would
    # read as data instead of padding
    P = x.shape[0]
    zmask = ((jnp.arange(P) > 0) & (jnp.arange(P) < P - 1)).astype(
        jnp.float32)[:, None, None]
    y = ((x.astype(jnp.float32) - mean_p[None, :, None])
         * inv[None, :, None] + bias_p[None, :, None]) * (mask[None] * zmask)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)
