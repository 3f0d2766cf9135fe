"""Pallas TPU 2D convs for the FeatureNet FPN: flat channel-major chain.

Why: XLA lowers the 3-32-channel 2D convolutions of the feature extractor
at ~4 TFLOP/s (~36 ms of the eval forward at 1152×864×5 views), and a
first pallas port spent 8+ ms/layer in XLA glue (window stacking and
NHWC↔channel-major transposes lower to while-loops of dynamic slices).
This design keeps the WHOLE conv chain in one persistent layout so the
glue disappears:

  * activations live flat channel-major: [C, rows·wm] where rows stacks
    every view's margin-padded block (hm = margin + H + margin rows) and
    wm is the 128-aligned margined width — data sits at (row0, col0)
    inside each block, margins are ZERO. Zero margins ≥ p ARE the conv's
    zero padding, so chained convs need no per-layer pad/shift ops;
  * per R-row band, the kernel DMAs one contiguous lane slice
    [Ci', (R+2p)·wm] from HBM (overlapping bands — no pre-stacked
    windows), builds the dy-taps by 128-aligned lane slices, and runs
        Y[kw·Co', kh·Ci'] = W_packed @ X_cat[kh·Ci', R·wm]
    one matmul for all row taps; the dx taps combine by lane rolls
    (wrap contamination lands in masked margin lanes);
  * folded eval-BN scale/shift + ReLU + margin masking happen
    in-register before the single block write — conv+BN+ReLU is one
    pass, and masking re-zeros the margins, maintaining the invariant;
  * stride 2 subsamples rows/cols by parity-preserving reshapes in the
    flat layout (margins 4 → 2 → 1 across the trunk, so every layer's
    padding requirement stays inside the margin);
  * 1×1 heads are plain [Co, Ci] @ [Ci, lanes] matmuls (matmul_cm);
    nearest ×2 upsampling is a repeat in both axes (upsample2_cm) whose
    output geometry provably coincides with the lateral branch's.

Parity: torch Conv2d(k, stride, padding) correlation — the ConvBNAct
layers of FeatureNet (/root/reference/models/modules.py:28-43,363-464).
Verified vs lax.conv_general_dilated in tests/test_pallas_conv2d.py.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .pallas_conv3d import _round_up  # shared lane/tile rounding


@dataclasses.dataclass(frozen=True)
class CMGeo:
    """Geometry of a flat channel-major activation [C, views·hm·wm]."""
    views: int
    height: int   # logical data rows per view
    width: int    # logical data cols per view
    row0: int     # data origin inside each view block
    col0: int
    hm: int       # rows per view block (row0 + height + bottom margin)
    wm: int       # lane width, multiple of 128

    @property
    def rows(self) -> int:
        return self.views * self.hm

    @property
    def lanes(self) -> int:
        return self.rows * self.wm

    def halved(self) -> "CMGeo":
        return CMGeo(self.views, self.height // 2, self.width // 2,
                     self.row0 // 2, self.col0 // 2,
                     self.hm // 2, self.wm // 2)

    def doubled(self) -> "CMGeo":
        return CMGeo(self.views, self.height * 2, self.width * 2,
                     self.row0 * 2, self.col0 * 2,
                     self.hm * 2, self.wm * 2)


def make_geo(views: int, height: int, width: int, margin: int = 4,
             wm_align: int = 512) -> CMGeo:
    """Entry geometry: margin rows/cols of zeros around each view's data.

    wm_align=512 keeps wm a 128-multiple through two stride-2 halvings.
    """
    return CMGeo(views, height, width, margin, margin,
                 height + 2 * margin,
                 _round_up(width + 2 * margin, wm_align))


def cm_from_nhwc(x: jnp.ndarray, geo: CMGeo) -> jnp.ndarray:
    """[N, H, W, C] → flat [C, geo.lanes] with zero margins."""
    N, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0),
                     (geo.row0, geo.hm - H - geo.row0),
                     (geo.col0, geo.wm - W - geo.col0), (0, 0)))
    return jnp.transpose(xp, (3, 0, 1, 2)).reshape(C, geo.lanes)


def cm_to_nhwc(flat: jnp.ndarray, geo: CMGeo) -> jnp.ndarray:
    """flat [C, lanes] → [N, H, W, C] (data region only)."""
    C = flat.shape[0]
    x = flat.reshape(C, geo.views, geo.hm, geo.wm)
    x = x[:, :, geo.row0:geo.row0 + geo.height,
          geo.col0:geo.col0 + geo.width]
    return jnp.transpose(x, (1, 2, 3, 0))


def lane_mask(geo: CMGeo) -> jnp.ndarray:
    """[1, lanes] 1.0 on data lanes, 0.0 on margins (for masked bias adds)."""
    idx = jnp.arange(geo.lanes, dtype=jnp.int32)
    row, col = (idx // geo.wm) % geo.hm, idx % geo.wm
    ok = ((row >= geo.row0) & (row < geo.row0 + geo.height)
          & (col >= geo.col0) & (col < geo.col0 + geo.width))
    return ok.astype(jnp.float32)[None]


def matmul_cm(flat: jnp.ndarray, geo: CMGeo, w: jnp.ndarray,
              bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """1×1 conv: [Ci, lanes] → [Co, lanes]; bias only on data lanes."""
    out = jnp.dot(w.T.astype(flat.dtype), flat,
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias[:, None] * lane_mask(geo)
    return out.astype(flat.dtype)


def subsample2_cm(flat: jnp.ndarray, geo: CMGeo) -> tuple[jnp.ndarray, CMGeo]:
    """Keep even rows/cols (torch stride-2 positions). Needs even origins."""
    assert geo.row0 % 2 == 0 and geo.col0 % 2 == 0, geo
    assert geo.hm % 2 == 0 and geo.wm % 256 == 0, geo
    C = flat.shape[0]
    x = flat.reshape(C, geo.rows // 2, 2, geo.wm)[:, :, 0]
    x = x.reshape(C, geo.rows // 2, geo.wm // 2, 2)[..., 0]
    return x.reshape(C, -1), geo.halved()


def upsample2_cm(flat: jnp.ndarray, geo: CMGeo) -> tuple[jnp.ndarray, CMGeo]:
    """Nearest ×2 (torch 'nearest': target (i,j) ← source (i//2, j//2)).

    concat-into-a-new-axis doubling: ~3x cheaper than jnp.repeat on this
    chip (repeat lowers to a broadcast that runs at ~75 GB/s here).
    """
    C = flat.shape[0]
    x = flat.reshape(C, geo.rows, geo.wm)
    x = jnp.concatenate([x[..., None], x[..., None]],
                        axis=3).reshape(C, geo.rows, 2 * geo.wm)
    x = jnp.concatenate([x[:, :, None], x[:, :, None]], axis=2)
    return x.reshape(C, -1), geo.doubled()


@functools.lru_cache(maxsize=32)
def _even_col_mat_np(wm: int):
    """[wm, wm/2] 0/1: col 2j → j (stride-2 de-interleave on the MXU)."""
    S = np.zeros((wm, wm // 2), np.float32)
    for j in range(wm // 2):
        S[2 * j, j] = 1.0
    return S


def _pick_rows(rows: int, cap: int, need_even: bool) -> int | None:
    """Largest band size ≤ cap dividing rows (even when stride==2) — a
    divisor band lets the kernel skip the x_hbm tail pad entirely."""
    for r in range(cap, 0, -1):
        if rows % r == 0 and (not need_even or r % 2 == 0):
            return r
    return None


def _pack_weights(kernel, ci_p, co_p, scale):
    """[kh, kw, Ci, Co] → [kw·Co', kh·Ci'] (dx-major M, dy-major K)."""
    kh, kw, ci, co = kernel.shape
    if scale is not None:
        kernel = kernel * scale
    k = jnp.pad(kernel, ((0, 0), (0, 0), (0, ci_p - ci), (0, co_p - co)))
    k = jnp.transpose(k, (1, 3, 0, 2))  # [dx, co, dy, ci]
    return k.reshape(kw * co_p, kh * ci_p)


def _band_kernel(w_ref, b_ref, *refs, kh: int, p: int,
                 ci_p: int, co_p: int, R: int, wm: int, geo: CMGeo,
                 stride: int, relu: bool, out_layout: str, w_out: int,
                 edge_dma: bool, nb: int, interpret: bool, compute_dtype):
    if stride == 2:
        s_ref, x_hbm, out_ref = refs
    else:
        s_ref, (x_hbm, out_ref) = None, refs
    b = pl.program_id(0)
    L = R * wm
    pw = p * wm
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    roll = jnp.roll if interpret else pltpu.roll

    def body(scratch, sem):
        if not edge_dma or p == 0:
            # non-divisor fallback: x_hbm carries p·wm zero lanes at the
            # front and a (tail + p·wm) zero pad at the back (p == 0
            # needs no pad at all) — plain full-window DMA
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(b * L, (R + 2 * p) * wm)], scratch, sem)
            cp.start()
            cp.wait()
        elif nb == 1:
            scratch[:, :pw] = jnp.zeros((ci_p, pw), compute_dtype)
            scratch[:, pw + L:] = jnp.zeros((ci_p, pw), compute_dtype)
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(0, L)],
                scratch.at[:, pl.ds(pw, L)], sem)
            cp.start()
            cp.wait()
        else:
            # unpadded x_hbm: first/last bands read a clipped window and
            # zero-fill the out-of-range conv taps in VMEM
            @pl.when(jnp.logical_and(b > 0, b < nb - 1))
            def _mid():
                # b·L − pw, written (b−1)·L + (L−pw) so Mosaic can prove
                # the offset non-negative and 128-aligned
                start = pl.multiple_of((b - 1) * L + (L - pw), 128)
                cp = pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(start, (R + 2 * p) * wm)],
                    scratch, sem)
                cp.start()
                cp.wait()

            @pl.when(b == 0)
            def _first():
                scratch[:, :pw] = jnp.zeros((ci_p, pw), compute_dtype)
                cp = pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(0, L + pw)],
                    scratch.at[:, pl.ds(pw, L + pw)], sem)
                cp.start()
                cp.wait()

            @pl.when(b == nb - 1)
            def _last():
                scratch[:, L + pw:] = jnp.zeros((ci_p, pw), compute_dtype)
                cp = pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds((nb - 1) * L - pw, L + pw)],
                    scratch.at[:, pl.ds(0, L + pw)], sem)
                cp.start()
                cp.wait()
        xcat = jnp.concatenate(
            [scratch[:, dy * wm:dy * wm + L] for dy in range(kh)],
            axis=0).astype(compute_dtype)                 # [kh·Ci', L]
        y = jnp.dot(w_ref[:].astype(compute_dtype), xcat,
                    preferred_element_type=jnp.float32,
                    precision=precision)                  # [kw·Co', L]
        acc = None
        for dx in range(kh):
            piece = y[dx * co_p:(dx + 1) * co_p]
            if (p - dx) % L:
                piece = roll(piece, (p - dx) % L, axis=1)
            acc = piece if acc is None else acc + piece
        acc = acc + b_ref[:]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        if stride == 2:
            # even output rows only — wm-aligned slices, free in-register
            acc = jnp.concatenate(
                [acc[:, 2 * t * wm:(2 * t + 1) * wm]
                 for t in range(R // 2)], axis=1)
        Lo = acc.shape[1]
        idx = jax.lax.broadcasted_iota(jnp.int32, (co_p, Lo), 1)
        row_abs = b * R + (idx // wm) * stride
        row, col = row_abs % geo.hm, idx % geo.wm
        ok = ((row >= geo.row0) & (row < geo.row0 + geo.height)
              & (col >= geo.col0) & (col < geo.col0 + geo.width)
              & (row_abs < geo.rows))
        acc = jnp.where(ok, acc, 0.0)
        if stride == 2:
            # col de-interleave in-kernel: stack the R/2 row pieces on
            # sublanes so the even-col 0/1 selection runs as one well-fed
            # MXU matmul (the XLA reshape-select equivalent re-tiles the
            # minor dim at a fraction of HBM bandwidth)
            rows2 = jnp.concatenate(
                [acc[:, t * wm:(t + 1) * wm] for t in range(R // 2)],
                axis=0).astype(compute_dtype)       # [R/2·Co', wm]
            y2 = jnp.dot(rows2, s_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=precision)       # [R/2·Co', wm/2]
            acc = jnp.concatenate(
                [y2[t * co_p:(t + 1) * co_p] for t in range(R // 2)],
                axis=1)                             # [Co', R/2·wm/2]
        if out_layout == "warp":
            # emit the warp kernel's row-major layout: rows (y·Co + co),
            # data cols shifted to lane 0 (roll wrap brings margin zeros)
            pieces = []
            for r in range(R):
                piece = acc[:, r * wm:(r + 1) * wm]
                if geo.col0:
                    piece = roll(piece, wm - geo.col0, axis=1)
                pieces.append(piece[:, :w_out])
            out_ref[:] = jnp.concatenate(pieces, axis=0).astype(
                out_ref.dtype)
        else:
            out_ref[:] = acc.astype(out_ref.dtype)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((ci_p, (R + 2 * p) * wm), compute_dtype),
        sem=pltpu.SemaphoreType.DMA)


def conv2d_cm(flat: jnp.ndarray, geo: CMGeo, kernel: jnp.ndarray, *,
              stride: int = 1, padding: int = 1,
              scale: jnp.ndarray | None = None,
              shift: jnp.ndarray | None = None,
              relu: bool = False, rows_per_band: int | None = None,
              out_layout: str = "cm",
              interpret: bool = False) -> tuple[jnp.ndarray, CMGeo]:
    """torch-Conv2d(k, stride, padding=p) + folded eval-BN + ReLU on the
    flat channel-major layout. Returns (flat' [Co, lanes'], geo').

    out_layout='warp' instead emits the plane-sweep warp kernel's
    source layout [rows_pad·Co, round_up(width, 128)]: row-major
    (abs_row·Co + co) with each row's data cols shifted to lane 0 and
    zeros beyond — directly consumable by
    ops.pallas_warp2.plane_sweep_variance_lanes(src2d=...) with
    src_hm=geo.hm, src_row0=geo.row0 (stride 1 only, Co a multiple
    of 8).

    PRECONDITION: geo margins ≥ padding on every side (the zero margins
    are the conv's zero padding).
    """
    kh, kw, ci, co = kernel.shape
    p = padding
    assert kh == kw == 2 * p + 1, (kernel.shape, p)
    assert min(geo.row0, geo.col0, geo.hm - geo.row0 - geo.height,
               geo.wm - geo.col0 - geo.width) >= p, (geo, p)
    ci_p, co_p = _round_up(ci, 8), _round_up(co, 8)
    compute_dtype = flat.dtype
    if rows_per_band is not None:
        R = rows_per_band
    else:
        R = (_pick_rows(geo.rows, 40 if kh == 3 else 20, stride == 2)
             or (32 if kh == 3 else 16))
    edge_dma = geo.rows % R == 0
    rows_pad = _round_up(geo.rows, R)
    w_out = _round_up(geo.width, 128)
    if out_layout == "warp":
        assert stride == 1 and co == co_p, (stride, co, co_p)
    if stride == 2:
        assert (geo.row0 % 2 == 0 and geo.col0 % 2 == 0
                and geo.hm % 2 == 0 and geo.wm % 256 == 0
                and R % 2 == 0), geo

    if edge_dma:
        # divisor band: no lane pre-pad at all — the kernel's first/last
        # grid steps zero-fill the out-of-range taps in VMEM
        x_hbm = (flat if ci_p == ci
                 else jnp.pad(flat, ((0, ci_p - ci), (0, 0))))
    else:
        x_hbm = jnp.pad(flat, ((0, ci_p - ci),
                               (p * geo.wm,
                                (rows_pad - geo.rows + p) * geo.wm)))
    w_packed = _pack_weights(kernel, ci_p, co_p, scale).astype(compute_dtype)
    bias = (jnp.zeros((co,), jnp.float32) if shift is None
            else shift.astype(jnp.float32))
    bias = jnp.pad(bias, (0, co_p - co))[:, None]

    nb = rows_pad // R
    kern = functools.partial(
        _band_kernel, kh=kh, p=p, ci_p=ci_p, co_p=co_p, R=R, wm=geo.wm,
        geo=geo, stride=stride, relu=relu, out_layout=out_layout,
        w_out=w_out, edge_dma=edge_dma, nb=nb, interpret=interpret,
        compute_dtype=compute_dtype)
    itemsize = np.dtype(compute_dtype).itemsize
    L = R * geo.wm
    vmem_bytes = int(min(110 * 1024 * 1024,
                         ci_p * (R + 2 * p) * geo.wm * itemsize
                         + kh * ci_p * L * itemsize
                         + kw * co_p * L * 4 + 2 * co_p * L * 4
                         + (geo.wm * geo.wm // 2 * itemsize
                            + co_p * L * (itemsize + 2) if stride == 2
                            else 0)
                         + 8 * 1024 * 1024))
    in_specs = [
        pl.BlockSpec((kw * co_p, kh * ci_p), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((co_p, 1), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [w_packed, bias]
    if stride == 2:
        in_specs.append(pl.BlockSpec((geo.wm, geo.wm // 2),
                                     lambda b: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(_even_col_mat_np(geo.wm),
                                    compute_dtype))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    operands.append(x_hbm)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((R * co, w_out), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)
                   if out_layout == "warp" else
                   pl.BlockSpec((co_p, L // (stride * stride)),
                                lambda b: (0, b),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((rows_pad * co, w_out),
                                        compute_dtype)
                   if out_layout == "warp" else
                   jax.ShapeDtypeStruct(
                       (co_p, rows_pad * geo.wm // (stride * stride)),
                       compute_dtype)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        **({"interpret": True} if interpret else {}),
    )(*operands)

    if out_layout == "warp":
        return out, geo
    geo2 = geo.halved() if stride == 2 else geo
    if co_p == co and rows_pad == geo.rows:
        return out, geo2
    return out[:co, :geo2.lanes], geo2
