"""Lanes-resident CostRegNet: the whole 3D U-Net in channel-major layout.

Why: the first-generation Pallas conv3d (ops/pallas_conv3d.py) made each
conv fast but paid an NDHWC↔channel-major layout conversion per layer —
profiled at ~6 ms each way on the stage-2 volume, more than the conv matmul
itself. This module keeps the volume in ONE persistent layout across all
11 layers of the cost regularizer:

    x_cm[P, C', lanesp]   P = depth planes incl. zero z-borders,
                          C' = channels padded to a sublane multiple,
                          lanesp = halo ‖ n_tiles·L ‖ halo — flattened
                          padded (hp, wp) with zero lane margins.

  * every conv is one pallas_call, grid (output planes × lane tiles);
    overlapping ±halo input windows and halo-offset output blocks are
    expressed with pl.Element block indexing (no per-layer restacking and
    no gather/scatter);
  * the 3×3×3 correlation is the packed matmul
    Y[9·Co', 3·Ci'] · X_cat[3·Ci', L+2·halo] with the 3 dz planes stacked
    on sublanes and the 9 (dy,dx) taps combined by static shifted adds;
  * eval-mode BatchNorm is FOLDED into the conv weights/bias, and ReLU,
    the decoder's additive skip connections, and interior/border masking
    all run in the kernel epilogue — zero elementwise XLA passes between
    layers;
  * stride-2 z is free (input plane index 2d+dz); stride-2 (h, w) costs
    one lane-space subsample pass; transposed convs zero-stuff in lane
    space (z/h/w interior dilation via one lax.pad) — no NDHWC round trip;
  * outputs alias a zeroed template so the z-borders and lane margins the
    kernel never writes stay zero for the next layer's windows.

Parity targets: CostRegNet (/root/reference/models/modules.py:470-501) with
ConvBnReLU3D/ConvTranspose3d torch semantics; numerical contract: matches
the XLA NDHWC path (nn/costreg.py conv_impl='xla') — tests/test_pallas_costreg.py.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv3d import _pack_weights, _round_up


@dataclasses.dataclass(frozen=True)
class LaneLayout:
    """Static lane geometry of one resolution level.

    Rows are 128-lane aligned: each padded row holds [zero border | w real
    pixels | zero border + tail] in wp = round_up(w+2, 128) lanes. The
    alignment lets producers (the fused warp kernel) write row-granular
    Element blocks directly into this layout."""
    h: int          # unpadded spatial height
    w: int
    L: int          # lane tile (multiple of 128)
    n_tiles: int
    halo: int       # lane margin, multiple of 128, ≥ wp+1

    @property
    def hp(self) -> int:
        return self.h + 2

    @property
    def wp(self) -> int:
        return _round_up(self.w + 2, 128)

    @property
    def lanes0(self) -> int:
        return self.hp * self.wp

    @property
    def lanesp(self) -> int:
        return self.halo + self.n_tiles * self.L + self.halo


def make_layout(h: int, w: int, lane_tile: int = 32768) -> LaneLayout:
    wp = _round_up(w + 2, 128)
    lanes0 = (h + 2) * wp
    L = min(_round_up(lane_tile, 128), _round_up(lanes0, 128))
    n_tiles = -(-lanes0 // L)
    halo = wp + 128
    return LaneLayout(h, w, L, n_tiles, halo)


@functools.lru_cache(maxsize=64)
def _border_mask_np(lay: LaneLayout):
    """[1, lanesp] f32 trace-time constant: 1 on interior lanes (rows
    1..h, cols 1..w of each aligned row)."""
    m2 = np.zeros((lay.hp, lay.wp), np.float32)
    m2[1:-1, 1:1 + lay.w] = 1.0
    m = np.zeros((1, lay.lanesp), np.float32)
    m[0, lay.halo:lay.halo + lay.lanes0] = m2.reshape(-1)
    return m


def fold_bn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into (kernel, bias): y = conv·s + b."""
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps)
    w = kernel.astype(jnp.float32) * s[None, None, None, None, :]
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return w, b


def to_lanes(x: jnp.ndarray, lay: LaneLayout, ci_p: int,
             dtype=jnp.bfloat16) -> jnp.ndarray:
    """[D, h, w, C] NDHWC → [D+2, C', lanesp] channel-major with zero
    z-borders, spatial borders, channel padding and lane margins."""
    D, h, w, C = x.shape
    assert (h, w) == (lay.h, lay.w), ((h, w), lay)
    xp = jnp.pad(x.astype(dtype), ((1, 1), (1, 1), (1, lay.wp - w - 1),
                                   (0, ci_p - C)))
    cm = jnp.transpose(xp, (0, 3, 1, 2)).reshape(D + 2, ci_p, lay.lanes0)
    return jnp.pad(cm, ((0, 0), (0, 0),
                        (lay.halo, lay.lanesp - lay.halo - lay.lanes0)))


def cost_from_lanes(y: jnp.ndarray, lay: LaneLayout) -> jnp.ndarray:
    """[D+2, Co', lanesp] → channel-0 interior [D, h, w]."""
    interior = y[1:-1, 0, lay.halo:lay.halo + lay.lanes0]
    return interior.reshape(-1, lay.hp, lay.wp)[:, 1:-1, 1:1 + lay.w]


@functools.lru_cache(maxsize=64)
def _col_subsample_mat(wp: int, wp2: int):
    """[wp, wp2] 0/1: padded col x = 2j+1 → half-res padded col j+1.
    XLA lowers minor-dim strided slices at ~10 GB/s on this chip; the
    de-interleave as an MXU matmul is ~20× faster."""
    S = np.zeros((wp, wp2), np.float32)
    for j in range(wp2 - 2):
        if 2 * j + 1 < wp:      # beyond-w sources are zero pad lanes
            S[2 * j + 1, j + 1] = 1.0
    return S


@functools.lru_cache(maxsize=64)
def _col_stuff_mat(wp: int, wp2: int):
    """[wp, wp2] 0/1: padded col x ∈ [1, w] → dilated padded col 2x−1."""
    S = np.zeros((wp, wp2), np.float32)
    for x in range(1, wp - 1):
        if 2 * x - 1 < wp2:     # beyond-w sources are zero pad lanes
            S[x, 2 * x - 1] = 1.0
    return S


def subsample_hw(y: jnp.ndarray, lay: LaneLayout,
                 lay2: LaneLayout) -> jnp.ndarray:
    """Keep every other interior (h, w) position (torch stride-2 output
    positions) and rebuild the half-resolution lane layout. z planes pass
    through (z stride is handled by the conv's index maps). Rows are a
    non-minor strided slice; columns de-interleave on the MXU."""
    P, C, _ = y.shape
    v = y[:, :, lay.halo:lay.halo + lay.lanes0].reshape(
        P, C, lay.hp, lay.wp)
    # padded rows 1, 3, … (unpadded even) — stride on a non-minor dim
    v = v[:, :, 1:-1].reshape(P, C, lay.h // 2, 2, lay.wp)[:, :, :, 0]
    v = v[:, :, :lay2.h]
    S = jnp.asarray(_col_subsample_mat(lay.wp, lay2.wp), y.dtype)
    v = jnp.einsum("pchx,xy->pchy", v, S)   # cols + zero col borders
    v = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (0, 0)))
    v = v.reshape(P, C, lay2.lanes0)
    return jnp.pad(v, ((0, 0), (0, 0),
                       (lay2.halo, lay2.lanesp - lay2.halo - lay2.lanes0)))


def stuff_hw_z(y: jnp.ndarray, lay: LaneLayout,
               lay2: LaneLayout) -> jnp.ndarray:
    """Zero-stuff for the k=3/s=2/p=1/op=1 transposed conv: interior-dilate
    z/h/w by 2 with (1, 2) edge pads (the torch (k−1−p, k−1−p+op)
    correlation padding), entirely in lane space. Output is a standard
    layout instance at doubled resolution (h2 = 2h, planes = 2D+2).
    Columns stuff on the MXU; rows/z via non-minor interior pads."""
    P, C, _ = y.shape
    v = y[1:-1, :, lay.halo:lay.halo + lay.lanes0].reshape(
        P - 2, C, lay.hp, lay.wp)[:, :, 1:-1]   # [D, C, h, wp]
    S = jnp.asarray(_col_stuff_mat(lay.wp, lay2.wp), y.dtype)
    v = jnp.einsum("pchx,xy->pchy", v, S)        # [D, C, h, wp2]
    zero = jnp.zeros((), v.dtype)
    v = jax.lax.pad(v, zero, [(1, 2, 1), (0, 0, 0), (1, 2, 1), (0, 0, 0)])
    assert v.shape[2] == lay2.hp and v.shape[3] == lay2.wp, (v.shape, lay2)
    v = v.reshape(v.shape[0], C, lay2.lanes0)
    return jnp.pad(v, ((0, 0), (0, 0),
                       (lay2.halo, lay2.lanesp - lay2.halo - lay2.lanes0)))


def _pack_weights_k9(kernel: jnp.ndarray, ci_p: int, co_p: int,
                     zb: int, zs: int) -> jnp.ndarray:
    """[3,3,3,Ci,Co] → block-banded [zb·3·Co', np·3·Ci'], np = zs·(zb−1)+3.

    Row (j, dx, co), col (p, dy, ci) = kernel[p − zs·j, dy, dx, ci, co]
    when 0 ≤ p − zs·j ≤ 2, else 0 — the z-batched (dz,dy)-contraction
    layout: one matmul computes zb output planes, K runs over the np
    input planes × 3 dy-taps, M over (output plane, dx-tap, Co)."""
    np_ = zs * (zb - 1) + 3
    k = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0),
                         (0, ci_p - kernel.shape[3]),
                         (0, co_p - kernel.shape[4])))
    # k[dz, dy, dx, ci, co] → per-dz block [dx, co, dy, ci]
    kb = jnp.transpose(k, (0, 2, 4, 1, 3))
    w6 = jnp.zeros((zb, 3, co_p, np_, 3, ci_p), kernel.dtype)
    for j in range(zb):
        for dz in range(3):
            w6 = w6.at[j, :, :, zs * j + dz].set(kb[dz])
    return w6.reshape(zb * 3 * co_p, np_ * 3 * ci_p)


def _mxu_passes(m: int, k: int) -> int:
    return -(-m // 128) * (-(-k // 128))


def _k9_plan(ci_p: int, co_p: int, p_out: int, zs: int):
    """Pick the z-batch factor zb for the K9 scheme, or None if the
    baseline (dz-K / (dy,dx)-M) scheme needs no more MXU passes/plane.

    Both kernels are MXU-pass-bound (measured: removing the tap-combine
    epilogue changes runtime <3%), so passes/output-plane is the cost
    model: baseline = ⌈9Co'/128⌉·⌈3Ci'/128⌉; K9(zb) =
    ⌈zb·3Co'/128⌉·⌈np·3Ci'/128⌉ / zb with np = zs·(zb−1)+3."""
    cur = _mxu_passes(9 * co_p, 3 * ci_p)
    best = None
    for zb in range(2, 9):
        if p_out % zb:
            continue
        np_ = zs * (zb - 1) + 3
        rate = _mxu_passes(zb * 3 * co_p, np_ * 3 * ci_p) / zb
        if rate < cur and (best is None or rate < best[0]):
            best = (rate, zb, np_)
    return None if best is None else (best[1], best[2])


def _conv_lanes_k9_kernel(w_ref, b_ref, m_ref, x_ref, *rest,
                          co: int, zb: int, np_: int, wp: int, halo: int,
                          L: int, relu: bool, has_skip: bool,
                          compute_dtype):
    """K9 grid step: zb output planes × one lane tile.

    x_ref: [np, Ci', lh] input planes; w_ref: [zb·3·Co', np·3·Ci']
    block-banded taps. X_cat stacks np·3 dy-shifted lane windows (the dy
    shift is a ±wp lane offset — wp and halo are 128-multiples, so every
    slice is lane-aligned); the epilogue combines only the 3 dx taps."""
    skip_ref = rest[0] if has_skip else None
    out_ref = rest[-1]          # rest[-2] is the aliased zero template
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    width = L + 256
    x = x_ref[...]
    pieces = []
    for p in range(np_):
        xp_ = x[p]
        for dy in range(3):
            off = halo - 128 + (dy - 1) * wp
            pieces.append(xp_[:, off:off + width])
    x_cat = jnp.concatenate(pieces, axis=0).astype(compute_dtype)
    y = jnp.dot(w_ref[:].astype(compute_dtype), x_cat,
                preferred_element_type=jnp.float32,
                precision=precision)             # [zb·3·Co', L+256]
    for j in range(zb):
        acc = None
        for dx in range(3):
            r = (j * 3 + dx) * co
            piece = y[r:r + co, 127 + dx:127 + dx + L]
            acc = piece if acc is None else acc + piece
        acc = acc + b_ref[:, 0:1]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        acc = acc * m_ref[0]
        if has_skip:
            acc = acc + skip_ref[j].astype(jnp.float32)
        out_ref[j] = acc.astype(out_ref.dtype)


def _conv_lanes_k9(x, kernel, bias, lay, *, zb, np_, z_stride, relu,
                   skip, out_dtype, compute_dtype, p_out, interpret):
    """pallas_call wrapper for the K9 scheme (see _k9_plan)."""
    P_in, ci_p, lanesp = x.shape
    ci, co = kernel.shape[3], kernel.shape[4]
    co_p = _round_up(co, 8)
    H, L, n = lay.halo, lay.L, lay.n_tiles
    # subdivide the lane tile to bound the f32 tap-partials Y
    sub = 1
    while (zb * 3 * co_p * (L // sub + 256) * 4 > 24 * 1024 * 1024
           and L % (2 * sub) == 0 and (L // (2 * sub)) % 128 == 0):
        sub *= 2
    Lk = L // sub
    lh = Lk + 2 * H
    nb = p_out // zb
    zs = z_stride

    w_packed = _pack_weights_k9(kernel, ci_p, co_p, zb, zs).astype(
        compute_dtype)
    b2 = jnp.broadcast_to(
        jnp.pad(bias.astype(jnp.float32), (0, co_p - co))[:, None],
        (co_p, 128))
    mask = jnp.asarray(_border_mask_np(lay))
    template = jnp.zeros((p_out + 2, co_p, lanesp), out_dtype)

    lane_off = lambda v: pl.multiple_of(v, 128)
    out_spec = pl.BlockSpec(
        (pl.Element(zb), pl.Element(co_p), pl.Element(Lk)),
        lambda d, i: (zb * d + 1, 0, lane_off(H + i * Lk)),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((zb * 3 * co_p, np_ * 3 * ci_p), lambda d, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((co_p, 128), lambda d, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pl.Element(1), pl.Element(Lk)),
                     lambda d, i: (0, lane_off(H + i * Lk)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pl.Element(np_), pl.Element(ci_p), pl.Element(lh)),
                     lambda d, i: (zs * zb * d, 0, lane_off(i * Lk)),
                     memory_space=pltpu.VMEM),
    ]
    operands = [w_packed, b2, mask, x]
    if skip is not None:
        assert skip.shape == template.shape, (skip.shape, template.shape)
        in_specs.append(pl.BlockSpec(
            (pl.Element(zb), pl.Element(co_p), pl.Element(Lk)),
            lambda d, i: (zb * d + 1, 0, lane_off(H + i * Lk)),
            memory_space=pltpu.VMEM))
        operands.append(skip)
    in_specs.append(out_spec)
    operands.append(template)

    itemsize = np.dtype(compute_dtype).itemsize
    vmem = int(min(100 * 1024 * 1024,
                   2 * (np_ * ci_p * lh * itemsize
                        + (2 if skip is not None else 1)
                        * zb * co_p * Lk * 4)
                   + zb * 3 * co_p * (Lk + 256) * 4
                   + np_ * 3 * ci_p * (Lk + 256) * itemsize
                   + 6 * 1024 * 1024))
    kern = functools.partial(
        _conv_lanes_k9_kernel, co=co_p, zb=zb, np_=np_, wp=lay.wp, halo=H,
        L=Lk, relu=relu, has_skip=skip is not None,
        compute_dtype=compute_dtype)
    return pl.pallas_call(
        kern,
        grid=(nb, n * sub),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((p_out + 2, co_p, lanesp), out_dtype),
        input_output_aliases={len(operands) - 1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        **({"interpret": True} if interpret else {}),
    )(*operands)


def _conv_lanes_kernel(w_ref, b_ref, m_ref, x0_ref, x1_ref, x2_ref, *rest,
                       co: int, wp: int, halo: int, L: int, relu: bool,
                       has_skip: bool, compute_dtype):
    skip_ref = rest[0] if has_skip else None
    out_ref = rest[-1]          # rest[-2] is the aliased zero template
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    x_cat = jnp.concatenate(
        [x0_ref[0], x1_ref[0], x2_ref[0]], axis=0).astype(compute_dtype)
    y = jnp.dot(w_ref[:].astype(compute_dtype), x_cat,
                preferred_element_type=jnp.float32,
                precision=precision)                     # [9Co', L+2halo]
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = dy * 3 + dx
            off = halo + (dy - 1) * wp + (dx - 1)
            piece = y[t * co:(t + 1) * co, off:off + L]
            acc = piece if acc is None else acc + piece
    acc = acc + b_ref[:, 0:1]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    acc = acc * m_ref[0]
    if has_skip:
        acc = acc + skip_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def conv_lanes(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
               lay: LaneLayout, *, z_stride: int = 1, relu: bool = True,
               skip: jnp.ndarray | None = None, out_dtype=None,
               compute_dtype=jnp.bfloat16, use_k9: bool = True,
               interpret: bool = False) -> jnp.ndarray:
    """One 3×3×3 conv layer on the lanes layout.

    x: [P_in, Ci', lanesp]; kernel: [3, 3, 3, Ci, Co] DHWIO (BN already
    folded); bias: [Co] f32. z_stride ∈ {1, 2} (the h/w stride-2 subsample
    is a separate lane-space pass — subsample_hw). skip, if given, is a
    same-layout [P_out+2, Co', lanesp] tensor added AFTER ReLU (the
    decoder's `convN + deconv(x)` pattern). Returns [P_out+2, Co', lanesp]
    with zero z-borders/margins.

    Two matmul schemes per layer, chosen by MXU pass count (_k9_plan):
    the baseline Y[9·Co', L] = W[9·Co', 3·Ci'] X (dz on K, (dy,dx) on M)
    and the z-batched K9 layout ((plane,dy) on K, (z-batch,dx,Co) on M) —
    the latter wins on the small-channel layers (conv1/conv2/prob) where
    a 9·Co' × 3·Ci' matmul leaves most of the 128×128 MXU pass idle.
    """
    P_in, ci_p, lanesp = x.shape
    assert lanesp == lay.lanesp, (lanesp, lay)
    ci, co = kernel.shape[3], kernel.shape[4]
    co_p = _round_up(co, 8)
    if z_stride == 1:
        p_out = P_in - 2
    else:
        p_out = (P_in - 3) // 2 + 1
    out_dtype = out_dtype or x.dtype
    plan = _k9_plan(ci_p, co_p, p_out, z_stride) if use_k9 else None
    if plan is not None:
        return _conv_lanes_k9(
            x, kernel, bias, lay, zb=plan[0], np_=plan[1],
            z_stride=z_stride, relu=relu, skip=skip, out_dtype=out_dtype,
            compute_dtype=compute_dtype, p_out=p_out, interpret=interpret)
    H, L, n = lay.halo, lay.L, lay.n_tiles
    lh = L + 2 * H

    w_packed = _pack_weights(kernel, ci_p, co_p).astype(compute_dtype)
    b2 = jnp.broadcast_to(
        jnp.pad(bias.astype(jnp.float32), (0, co_p - co))[:, None],
        (co_p, 128))
    mask = jnp.asarray(_border_mask_np(lay))
    template = jnp.zeros((p_out + 2, co_p, lanesp), out_dtype)

    zs = z_stride
    # pl.multiple_of: Mosaic must prove lane offsets are multiples of the
    # 128-lane tiling; H and L both are
    lane_off = lambda v: pl.multiple_of(v, 128)
    win = lambda dz: pl.BlockSpec(
        (pl.Element(1), pl.Element(ci_p), pl.Element(lh)),
        lambda d, i, dz=dz: (zs * d + dz, 0, lane_off(i * L)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(co_p), pl.Element(L)),
        lambda d, i: (d + 1, 0, lane_off(H + i * L)),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((9 * co_p, 3 * ci_p), lambda d, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((co_p, 128), lambda d, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pl.Element(1), pl.Element(L)),
                     lambda d, i: (0, lane_off(H + i * L)),
                     memory_space=pltpu.VMEM),
        win(0), win(1), win(2),
    ]
    operands = [w_packed, b2, mask, x, x, x]
    if skip is not None:
        assert skip.shape == template.shape, (skip.shape, template.shape)
        in_specs.append(pl.BlockSpec(
            (pl.Element(1), pl.Element(co_p), pl.Element(L)),
            lambda d, i: (d + 1, 0, lane_off(H + i * L)),
            memory_space=pltpu.VMEM))
        operands.append(skip)
    in_specs.append(out_spec)        # the aliased zero template
    operands.append(template)

    itemsize = np.dtype(compute_dtype).itemsize
    vmem = int(min(100 * 1024 * 1024,
                   2 * (3 * ci_p * lh * itemsize + 2 * co_p * L * 4)
                   + 9 * co_p * lh * 4 + 3 * ci_p * lh * itemsize
                   + 6 * 1024 * 1024))
    kern = functools.partial(
        _conv_lanes_kernel, co=co_p, wp=lay.wp, halo=H, L=L, relu=relu,
        has_skip=skip is not None, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kern,
        grid=(p_out, n),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((p_out + 2, co_p, lanesp), out_dtype),
        input_output_aliases={len(operands) - 1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        **({"interpret": True} if interpret else {}),
    )(*operands)


LAYER_NAMES = ("conv0", "conv1", "conv2", "conv3", "conv4", "conv5",
               "conv6", "conv7", "conv9", "conv11", "prob")
DECONV_NAMES = ("conv7", "conv9", "conv11")


def fold_costreg_variables(params, batch_stats):
    """CostRegNet flax subtrees (nn/costreg.py) → {name: (kernel, bias)}
    with eval-mode BN folded in. Layout of each kernel: [3,3,3,Ci,Co]."""
    folded = {}
    for name in LAYER_NAMES:
        if name == "prob":
            folded[name] = (params["prob"]["Conv_0"]["kernel"],
                            jnp.zeros((1,), jnp.float32))
            continue
        k = (params[name]["kernel"] if name in DECONV_NAMES
             else params[name]["Conv_0"]["kernel"])
        bn = params[name]["TorchBatchNorm_0"]
        st = batch_stats[name]["TorchBatchNorm_0"]
        folded[name] = fold_bn(k, bn["scale"], bn["bias"],
                               st["mean"], st["var"])
    return folded


def costreg_lanes(variance: jnp.ndarray, folded, *,
                  lane_tile: int = 32768, compute_dtype=jnp.bfloat16,
                  interpret: bool = False,
                  lanes_dims=None) -> jnp.ndarray:
    """Full CostRegNet eval forward on the lanes layout.

    variance: [B, D, h, w, C] NDHWC cost volume — OR, when lanes_dims
    = (D, h, w, C) is given, an already-lanes-resident [D+2, C', lanesp]
    volume (e.g. straight from ops.pallas_warp2) and the entry conversion
    is skipped. folded: {layer name: (kernel, bias)} with BN pre-folded
    (fold_costreg_variables). Returns the 1-channel cost volume
    [B, D, h, w] f32, numerically matching
    CostRegNet(conv_impl='xla')(x)[..., 0] in eval mode.
    """
    if lanes_dims is not None:
        D, h, w, C = lanes_dims
        B = 1
    else:
        B, D, h, w, C = variance.shape
    assert D % 8 == 0 and h % 8 == 0 and w % 8 == 0, (D, h, w)

    lays = [make_layout(h >> i, w >> i, lane_tile) for i in range(4)]
    cv = functools.partial(conv_lanes, compute_dtype=compute_dtype,
                           interpret=interpret)
    lane_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                  else jnp.float32)

    # in-layout Pallas resamples (ops/pallas_resample.py) — the XLA
    # subsample_hw/stuff_hw_z equivalents re-tile the minor dim at a
    # fraction of HBM bandwidth (~25 ms/forward at 1152×864)
    from .pallas_resample import stuff_lanes, subsample_lanes
    sub = functools.partial(subsample_lanes, interpret=interpret)
    stuff = functools.partial(stuff_lanes, interpret=interpret)

    def single(var):
        if lanes_dims is not None:
            x = var
        else:
            x = to_lanes(var, lays[0], _round_up(C, 8), lane_dtype)
        conv0 = cv(x, *folded["conv0"], lays[0])
        t = cv(conv0, *folded["conv1"], lays[0], z_stride=2)
        t = sub(t, lays[0], lays[1])
        conv2 = cv(t, *folded["conv2"], lays[1])
        t = cv(conv2, *folded["conv3"], lays[1], z_stride=2)
        t = sub(t, lays[1], lays[2])
        conv4 = cv(t, *folded["conv4"], lays[2])
        t = cv(conv4, *folded["conv5"], lays[2], z_stride=2)
        t = sub(t, lays[2], lays[3])
        t = cv(t, *folded["conv6"], lays[3])
        t = cv(stuff(t, lays[3], lays[2]), *folded["conv7"],
               lays[2], skip=conv4)
        t = cv(stuff(t, lays[2], lays[1]), *folded["conv9"],
               lays[1], skip=conv2)
        t = cv(stuff(t, lays[1], lays[0]), *folded["conv11"],
               lays[0], skip=conv0)
        cost = cv(t, *folded["prob"], lays[0], relu=False,
                  out_dtype=jnp.float32)
        return cost_from_lanes(cost, lays[0])

    if lanes_dims is not None:
        return single(variance)[None]
    return jnp.stack([single(variance[b]) for b in range(B)])
