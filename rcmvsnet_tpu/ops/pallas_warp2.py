"""Fused plane-sweep warp + multi-view variance, emitting the lanes layout.

Second-generation warp kernel (supersedes ops/pallas_warp.py's per-view
volumes + XLA accumulation on the eval fast path). Round-2 profile: the
warp stack cost ~185 ms/forward at 1152×864 — per-view warped volumes
round-tripped HBM five times (write + Σx/Σx² read-modify-writes), and the
variance volume then paid an NDHWC→channel-major conversion into the cost
regularizer. This kernel does the whole thing in one pass:

  * ALL source feature maps (plus the reference view, identity-warped so
    no separate channel-major transpose of it is needed) stay RESIDENT in
    VMEM as one stacked [V·h·C, w] buffer;
  * grid = ONE STEP PER OUTPUT PLANE (planes mode; volume mode keeps
    the (depth, row group) grid): the R-row groups run in an in-kernel
    fori_loop writing into a whole-plane VMEM block — at small row
    groups the per-grid-step overhead dominated (up to ~15k steps per
    frame), and the per-plane grid amortizes it n_rg-fold, with the
    halo planes and lane margins zeroed in-kernel (no donated zero
    template). Per group and view, ONE hat-matmul
        band[band·C, x_band] @ hat_x[x_band, R·x_tile]
    (hat(x−k) = max(0, 1−|x−k|) reproduces torch's zeros-padded bilinear
    exactly), a VPU hat_y weighting, and a band reduction by static
    sublane-slice adds;
  * Σx and Σx² accumulate in f32 registers across the static view loop —
    warped volumes NEVER touch HBM — and the variance
    E[x²]−E[x]² is written ONCE, directly into the cost regularizer's
    128-aligned lane layout (ops/pallas_costreg.LaneLayout) at lane
    offset halo + (1 + g·R)·wp of the plane block; padding-lane
    contributions are killed by the real-pixel row mask (volume mode
    still uses per-group Element blocks + an aliased zero template);
  * sample coordinates are computed IN-REGISTER per grid step from the
    SMEM-resident relative projections (_coords_inkernel) — the
    precomputed px/py fields used through round 2 moved ~2·V·D·h·wp f32
    through HBM and dominated the warp's XLA glue;
  * the y-band is a HOST-SIDE PRECONDITION: callers gate with
    check_group_coverage (R-row groups, band rows). Unlike the v1 kernel,
    a violated precondition is NO LONGER silent: the kernel counts every
    (view, row group[, x-tile]) whose in-image taps escape the clipped
    band window — the exact per-group condition check_group_coverage
    tests — and returns the count as a second output. Drivers check it
    on the first frame of each (scan, config) and fail loudly
    (cli/eval_dtu.raise_on_warp_violations) instead of corrupting.

Parity targets: homo_warping (/root/reference/models/modules.py:304-339)
+ the streamed variance of /root/reference/models/casmvsnet.py:68-100.
Numerical contract: matches ops.warp.plane_sweep_variance up to the
bf16 hat/feature rounding (tests/test_pallas_warp2.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.geometry import relative_projection
from .pallas_costreg import LaneLayout
from .pallas_warp import _pixel_coords


def _identity_projection(proj: jnp.ndarray) -> jnp.ndarray:
    eye = jnp.eye(4, dtype=proj.dtype)
    return jnp.broadcast_to(eye, proj.shape)


@functools.lru_cache(maxsize=32)
def _row_mask_np(R: int, wp: int, w: int):
    """[1, R·wp] f32: 1 on real-pixel lanes (col 1..w of each row)."""
    m = np.zeros((1, R, wp), np.float32)
    m[0, :, 1:1 + w] = 1.0
    return m.reshape(1, R * wp)


def _coords_inkernel(proj_ref, depth, v: int, h: int, w: int, wp: int,
                     row0, tiles=None):
    """px/py [1, R·wp] for view v, computed from the SMEM-resident
    relative projection — replaces the precomputed [D, n_rg, V, R·wp]
    coordinate fields (whose HBM traffic dominated the warp's XLA glue).
    Same math as ops.pallas_warp._pixel_coords / core.geometry
    project_to_grid: p = rot·[x, y, 1]·d + t, px = X/Z (the ±1
    normalize/denormalize round-trip cancels), z guarded away from 0,
    coords clamped to the harmless just-outside range.

    tiles=(R, x_tile): lanes are TILE-MAJOR — lane = xt·(R·x_tile) +
    r·x_tile + u maps to (row r, padded col xt·x_tile + u), so each
    x-tile's coords are one contiguous lane slice (see _group_var).
    tiles=None: row-major lane = r·wp + col."""
    lanes = depth.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    if tiles is None:
        x = jnp.clip(lane % wp - 1, 0, w - 1).astype(jnp.float32)
        y = (row0 + lane // wp).astype(jnp.float32)
    else:
        R, x_tile = tiles
        t = lane // x_tile
        col = (t // R) * x_tile + lane % x_tile
        x = jnp.clip(col - 1, 0, w - 1).astype(jnp.float32)
        y = (row0 + t % R).astype(jnp.float32)
    m = lambda i, j: proj_ref[v, 4 * i + j]
    rx = m(0, 0) * x + m(0, 1) * y + m(0, 2)
    ry = m(1, 0) * x + m(1, 1) * y + m(1, 2)
    rz = m(2, 0) * x + m(2, 1) * y + m(2, 2)
    X = rx * depth + m(0, 3)
    Y = ry * depth + m(1, 3)
    Z = rz * depth + m(2, 3)
    Z = jnp.where(jnp.abs(Z) < 1e-6,
                  jnp.where(Z < 0, -1e-6, 1e-6), Z)
    # one reciprocal + two muls instead of two per-lane divides (VPU
    # division is the single most expensive op in the coords path)
    zinv = 1.0 / Z
    px = jnp.clip(X * zinv, -2.0, w + 1.0)
    py = jnp.clip(Y * zinv, -2.0, h + 1.0)
    return px, py


def _warp_var_kernel(proj_ref, dv_a, dv_b, mask_ref, tmpl_ref, src_ref,
                     out_ref, viol_ref, *, views: int, band: int, C: int, h: int,
                     w: int, w_src: int, src_hm: int, src_row0: int,
                     R: int, wp: int, x_band: int | None, x_tile: int,
                     x_align: int, planes_mode: bool, interpret: bool,
                     compute_dtype):
    """One step: variance over all views for (depth plane, R-row group).

    src_ref: [V·h·C, w] resident stacked feature maps; proj_ref: SMEM
    [V, 16] relative projections; dv_ref: [1, 1, R·wp] per-pixel depth
    hypotheses (edge-padded lanes); mask: [1, R·wp] real-pixel-lane
    mask; out: [1, C, R·wp]. px/py are computed in-register per view
    (_coords_inkernel) — no coordinate fields ever touch HBM.

    With x_band set (and < w), the w-wide hat contraction is replaced by
    per-x-tile windows: for each x_tile-column tile of every row, only an
    x_align-aligned x_band-wide slice of the source row band enters the
    matmul — the hat weights outside it are provably zero when the
    check_group_coverage(x_band) precondition holds. Source rows are
    zero-padded to w_src (an x_align multiple) so the window clip bound
    w_src − x_band keeps the alignment at any image width; padding
    columns read as zeros, which is exactly torch's zeros-padding
    bilinear semantics for taps at kx ≥ w."""
    del planes_mode, dv_b  # volume mode only (planes take the per-plane kernel)
    depth = dv_a[0, 0]                                    # [1, lanes]
    row0 = pl.program_id(1) * R
    var, viol = _group_var(
        proj_ref, src_ref, depth, row0, mask_ref[0],
        views=views, band=band, C=C, h=h, w=w, w_src=w_src,
        src_hm=src_hm, src_row0=src_row0, R=R, wp=wp,
        x_band=x_band, x_tile=x_tile, x_align=x_align,
        interpret=interpret, compute_dtype=compute_dtype)
    out_ref[0] = var.astype(out_ref.dtype)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init_viol():
        viol_ref[0, 0] = 0

    viol_ref[0, 0] = viol_ref[0, 0] + viol


def _group_var(proj_ref, src_ref, depth, row0, mask, *, views: int,
               band: int, C: int, h: int, w: int, w_src: int, src_hm: int,
               src_row0: int, R: int, wp: int, x_band: int | None,
               x_tile: int, x_align: int, interpret: bool, compute_dtype):
    """Multi-view variance [C, R·wp] (row-major lanes) for one (depth,
    R-row group): the shared body of the per-group and per-plane
    kernels. `row0` is the (traced) first output row, `mask` the
    row-major [1, R·wp] real-pixel-lane mask.

    Returns (var, viol): viol is an int32 count of (view[, x-tile])
    instances whose in-image taps escape the clipped band window — the
    SAME per-group condition check_group_coverage evaluates host-side
    (last in-image tap min(extent−1, floor(max)+1) beyond window end),
    so a geometry that passes the probe never fires at runtime, and a
    violated one is detected instead of silently zero-padded.

    BANDED PATH LANE ORDER: `depth` must arrive TILE-MAJOR — lane =
    xt·(R·x_tile) + r·x_tile + u for (row r, padded col xt·x_tile + u).
    Every per-x-tile operand (coords, hat_y tile) is then ONE contiguous
    lane slice; the old row-major order needed an R-piece slice-and-
    concat shuffle per (view, tile) for pxt/pyt plus an inverse shuffle
    for the matmul output, and ablation showed those vector permutes
    costing more than the hat matmuls themselves. The view accumulators
    run tile-major and are converted to row-major ONCE per group (two
    shuffles total) before the reference view joins. Dense path
    (x_band off): row-major `depth`, unchanged."""
    lanes = R * wp
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    banded_x = x_band is not None and x_band < w
    sub_jf = jax.lax.broadcasted_iota(
        jnp.int32, (band, lanes), 0).astype(jnp.float32)
    roll = jnp.roll if interpret else pltpu.roll

    # view 0 is the reference view: its warp is the identity, so its
    # contribution is a direct lane-layout copy of the resident feature
    # rows (saves 1/V of the hat-matmul FLOPs; values are bit-identical
    # to the hat path — integer coords hit exactly one unit tap)
    pieces = []
    zpad = (jnp.zeros((C, wp - w_src), jnp.float32)
            if wp > w_src else None)
    for r in range(R):
        row = src_ref[pl.ds((src_row0 + row0 + r) * C, C),
                      :].astype(jnp.float32)
        pieces.append(row if zpad is None
                      else jnp.concatenate([row, zpad], axis=1))
    ref_b = roll(jnp.concatenate(pieces, axis=1), 1, axis=1)  # [C, lanes]

    viol = jnp.int32(0)

    def _escapes(coords, win_start_f, win, extent):
        # last in-image nonzero-weight tap beyond the window end — the
        # exact check_group_coverage._window_ok upper-edge condition
        last = jnp.minimum(jnp.floor(jnp.max(coords)) + 1.0,
                           float(extent - 1))
        return (last > win_start_f + float(win - 1)).astype(jnp.int32)

    if not banded_x:
        kx = jax.lax.broadcasted_iota(jnp.int32, (w_src, lanes), 0).astype(
            jnp.float32)
        acc_s = ref_b
        acc_q = ref_b * ref_b
        for v in range(1, views):
            px, py = _coords_inkernel(proj_ref, depth, v, h, w, wp, row0)
            ymin = jnp.clip(jnp.floor(jnp.min(py)).astype(jnp.int32),
                            0, h - band)
            viol = viol + _escapes(py, ymin.astype(jnp.float32), band, h)
            py_rel = py - ymin.astype(jnp.float32)
            hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(py_rel - sub_jf))
            rows = src_ref[pl.ds((v * src_hm + src_row0 + ymin) * C,
                                 band * C), :]
            rows = rows.astype(compute_dtype)             # [band·C, w]
            hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(px - kx))
            out_x = jnp.dot(rows, hat_x.astype(compute_dtype),
                            preferred_element_type=jnp.float32,
                            precision=precision)          # [band·C, lanes]
            con = None
            for s in range(band):
                piece = out_x[s * C:(s + 1) * C, :] * hat_y[s:s + 1, :]
                con = piece if con is None else con + piece
            acc_s = acc_s + con
            acc_q = acc_q + con * con
        mean = acc_s / views
        return (acc_q / views - mean * mean) * mask, viol

    n_xt = wp // x_tile
    kx_rel = jax.lax.broadcasted_iota(
        jnp.int32, (x_band, R * x_tile), 0).astype(jnp.float32)
    acc_s = jnp.zeros((C, lanes), jnp.float32)
    acc_q = jnp.zeros((C, lanes), jnp.float32)
    for v in range(1, views):
        px, py = _coords_inkernel(proj_ref, depth, v, h, w, wp, row0,
                                  tiles=(R, x_tile))
        ymin = jnp.clip(jnp.floor(jnp.min(py)).astype(jnp.int32),
                        0, h - band)
        viol = viol + _escapes(py, ymin.astype(jnp.float32), band, h)
        # offset the [1, lanes] coords by ymin instead of the [band,
        # lanes] iota: one small op replaces a full-size add
        py_rel = py - ymin.astype(jnp.float32)
        # hat_y stays [band, lanes]: the per-row weight folds into the
        # band reduction as a [1, lanes] broadcast multiply — C× fewer
        # VPU ops than materializing it at [band·C, lanes]
        hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(py_rel - sub_jf))
        conts = []
        for xt in range(n_xt):
            sl = slice(xt * R * x_tile, (xt + 1) * R * x_tile)
            pxt = px[:, sl]                            # [1, R·x_tile]
            pyt = hat_y[:, sl]                         # [band, R·x_tile]
            xmin = jnp.clip(
                (jnp.floor(jnp.min(pxt)).astype(jnp.int32) // x_align)
                * x_align, 0, w_src - x_band)
            xmin = pl.multiple_of(xmin, x_align)
            viol = viol + _escapes(pxt, xmin.astype(jnp.float32),
                                   x_band, w)
            rows = src_ref[pl.ds((v * src_hm + src_row0 + ymin) * C,
                                 band * C), pl.ds(xmin, x_band)]
            rows = rows.astype(compute_dtype)          # [band·C, x_band]
            # offset the [1, N] coords by xmin instead of the
            # [x_band, N] iota: drops a full-size VPU pass from
            # every hat build
            pxt_rel = pxt - xmin.astype(jnp.float32)
            hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(pxt_rel - kx_rel))
            out_x = jnp.dot(rows, hat_x.astype(compute_dtype),
                            preferred_element_type=jnp.float32,
                            precision=precision)       # [band·C, R·xt]
            cont = None
            for s in range(band):
                piece = out_x[s * C:(s + 1) * C, :] * pyt[s:s + 1, :]
                cont = piece if cont is None else cont + piece
            conts.append(cont)
        con = jnp.concatenate(conts, axis=1)           # tile-major
        acc_s = acc_s + con
        acc_q = acc_q + con * con
    # ONE tile→row conversion per accumulator, then the reference view
    # (built row-major) joins and the variance emits in layout order
    to_rows = lambda x: jnp.concatenate(
        [x[:, xt * R * x_tile + r * x_tile:
           xt * R * x_tile + (r + 1) * x_tile]
         for r in range(R) for xt in range(n_xt)], axis=1)
    acc_s = to_rows(acc_s) + ref_b
    acc_q = to_rows(acc_q) + ref_b * ref_b
    mean = acc_s / views
    return (acc_q / views - mean * mean) * mask, viol


def _warp_var_plane_kernel(proj_ref, dv_a, dv_b, mask_ref, src_ref,
                           out_ref, viol_ref, *, views: int, band: int, C: int,
                           h: int, w: int, w_src: int, src_hm: int,
                           src_row0: int, R: int, wp: int,
                           x_band: int | None, x_tile: int, x_align: int,
                           D: int, halo: int, lanesp: int, n_rg: int,
                           interpret: bool, compute_dtype):
    """One step per OUTPUT PLANE (grid = (D+2,)): the row groups run in
    an in-kernel fori_loop writing into a whole-plane VMEM block.

    The per-(plane, group) grid paid a fixed per-step cost (block DMA
    bookkeeping, prologue/epilogue) on up to ~15k steps per frame at
    small row groups — ablation showed that floor dominating the warp.
    This kernel keeps ~D steps per stage, amortizing the overhead
    n_rg-fold, and writes the halo planes and lane margins itself, so
    the donated zero template (and its full-volume zeros write per
    frame) disappears.

    dv_a/dv_b: [n_rg, R·wp] per-group (lo, step) rows; out block:
    [1, C, lanesp] (the whole plane p = program_id)."""
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init_viol():
        viol_ref[0, 0] = 0

    @pl.when(jnp.logical_or(p == 0, p == D + 1))
    def _halo_plane():
        out_ref[0] = jnp.zeros((C, lanesp), out_ref.dtype)

    @pl.when(jnp.logical_and(p > 0, p < D + 1))
    def _plane():
        didx = (p - 1).astype(jnp.float32)
        # lane margins: leading halo + border row, trailing border row +
        # tile pad + halo (the interior row groups are written below)
        head = halo + wp
        tail0 = halo + (1 + h) * wp
        out_ref[0, :, :head] = jnp.zeros((C, head), out_ref.dtype)
        out_ref[0, :, tail0:] = jnp.zeros((C, lanesp - tail0),
                                          out_ref.dtype)

        def body(g, carry):
            depth = (dv_a[pl.ds(g, 1), :]
                     + didx * dv_b[pl.ds(g, 1), :])       # [1, R·wp]
            var, viol = _group_var(
                proj_ref, src_ref, depth, g * R, mask_ref[0],
                views=views, band=band, C=C, h=h, w=w, w_src=w_src,
                src_hm=src_hm, src_row0=src_row0, R=R, wp=wp,
                x_band=x_band, x_tile=x_tile, x_align=x_align,
                interpret=interpret, compute_dtype=compute_dtype)
            off = pl.multiple_of(head + g * (R * wp), 128)
            out_ref[0, :, pl.ds(off, R * wp)] = var.astype(out_ref.dtype)
            return carry + viol

        viol_ref[0, 0] = viol_ref[0, 0] + jax.lax.fori_loop(
            0, n_rg, body, jnp.int32(0))


# Calibrated admission threshold for eval_vmem_bytes (see below): the
# estimator over-predicts the compiler's true scoped-VMEM requirement by
# ~10-15%. Known-good point: DTU 1152×864 V=5 stage 3 — estimator
# 142.5 MB, runs in production. Known-bad point: T&T 1920×1056 V=7
# stage 2 — estimator 173.6 MB, real requirement 155.8 MB (> the 128 MB
# v5e VMEM; compile OOM observed round 5). 150 MB admits every
# proven-working geometry and rejects the proven failure with margin.
EVAL_VMEM_GATE = 150 * 1024 * 1024


def eval_vmem_bytes(views: int, h: int, w: int, C: int,
                    itemsize: int = 2, x_align: int = 256) -> int:
    """Estimated VMEM residency of the fused eval warp kernel at one
    stage: ALL `views` channel-major source maps (x-aligned rows) stay
    resident for the whole sweep, plus a double-buffered output block in
    the lanes layout and ~24–28 MB of scratch/hat margin (mirrors the
    vmem_limit computation below). The per-view `pallas_warp_max_bytes`
    budget alone admits geometries that blow VMEM at higher view counts —
    T&T's V=7 at 1920×1056 needs 6 × 16.2 MB of stage-2 sources where
    DTU's V=5 fit — so the cascade/CLI gates bound this estimate against
    EVAL_VMEM_GATE (a calibrated threshold, not the raw 128 MB: the
    estimate is deliberately conservative per-term)."""
    from .pallas_costreg import make_layout
    wsrc = -(-w // x_align) * x_align
    src = views * h * C * wsrc * itemsize
    out_block = C * make_layout(h, w).lanesp * itemsize
    return src + max(2 * out_block + 24 * 1024 * 1024, 28 * 1024 * 1024)


def plane_sweep_variance_lanes(
        features: jnp.ndarray, projs: jnp.ndarray,
        depth_values: jnp.ndarray, lay: LaneLayout, *,
        rows_per_step: int = 4, band: int = 8,
        x_band: int | None = None, x_tile: int = 128, x_align: int = 128,
        src2d: jnp.ndarray | None = None, src_meta=None,
        depth_planes=None,
        compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
        interpret: bool = False):
    """Variance cost volume in the lanes layout, single batch element.

    features: [V, h, w, C] (view 0 = reference); projs: [V, 4, 4] K-folded
    projections; depth_values: [D, h, w] per-pixel hypotheses — or
    depth_planes=(lo [h, w], step [h, w], D) for hypotheses linear in
    the plane index (dv = lo + d·step, the cascade's window/linspace
    schedules): D× less depth data streamed, same values bit-for-bit.
    Returns ([D+2, C, lanesp], violations): the lanes volume
    (lay = make_layout(h, w)) ready for ops.pallas_costreg.costreg_lanes
    — equal to to_lanes(plane_sweep_variance(...)) up to compute_dtype
    rounding — and an int32 scalar counting band-coverage violations
    (0 whenever the check_group_coverage precondition holds; nonzero
    means out-of-band taps were zeroed and the volume is corrupt —
    callers must fail loudly).

    src2d + src_meta=(V, hm, row0, C, w_pad): pre-built row-major source
    (conv2d_cm(out_layout='warp') emits it directly, skipping the NHWC
    transpose here); rows (v·hm + row0 + y)·C + c, data cols at lane 0,
    zeros beyond w. `features` is ignored then and may be None.

    PRECONDITION: every (depth, R-row group)'s source-y spread fits the
    static band for every view — check_group_coverage. A violation is
    detected at runtime via the second output (counted with the same
    window condition the host probe uses), never silently ignored.
    """
    if src_meta is not None:
        V, src_hm, src_row0, C, w_pad = src_meta
        h, w = lay.h, lay.w
    else:
        V, h, w, C = features.shape
        src_hm, src_row0, w_pad = h, 0, w
    D = depth_planes[2] if depth_planes is not None else depth_values.shape[0]
    R, wp = rows_per_step, lay.wp
    assert (h, w) == (lay.h, lay.w) and h % R == 0, (h, w, lay, R)
    banded = x_band is not None and x_band < w
    if banded:
        # window starts are clipped to w_src−x_band; the pl.multiple_of
        # hint is only honest if that bound keeps the alignment, so pad
        # source rows to an x_align multiple (zeros ≡ torch zeros-padding)
        assert x_band % x_align == 0, (x_band, x_align)
        w_src = -(-w // x_align) * x_align
    else:
        w_src = -(-w // x_align) * x_align if src_meta is not None else w

    n_rg = h // R

    if src2d is None:
        # stacked channel-major feature maps [V·h·C, w_src] (view-major)
        src2d = jnp.transpose(features.astype(compute_dtype),
                              (0, 1, 3, 2)).reshape(V * h * C, w)
        if w_src != w:
            src2d = jnp.pad(src2d, ((0, 0), (0, w_src - w)))
    else:
        assert w_pad >= w_src and src2d.shape[1] == w_pad, (
            src2d.shape, w_src)
        assert src2d.shape[0] >= V * src_hm * C, (src2d.shape, src_meta)
        w_src = w_pad
        src2d = src2d.astype(compute_dtype)

    # SMEM-resident relative projections [V, 16]; coords are computed
    # in-register per grid step (the old precomputed px/py fields moved
    # ~2·V·D·h·wp f32 through HBM — the warp's dominant XLA glue)
    ref_proj = projs[0]
    rels = [(jax.lax.stop_gradient(
        relative_projection(projs[v:v + 1], ref_proj[None]))[0]
        if v else _identity_projection(ref_proj))
        for v in range(V)]
    proj_pack = jnp.stack(rels).reshape(V, 16).astype(jnp.float32)

    src_bytes = src2d.size * np.dtype(compute_dtype).itemsize
    mask = jnp.asarray(_row_mask_np(R, wp, w))
    if banded:
        assert wp % x_tile == 0, (wp, x_tile)

    def dv_lanes(m):
        """[..., h, w] map → [..., n_rg groups, R·wp lanes] with edge-
        padded lane borders; TILE-MAJOR lane order when banded (the
        kernel's coords/hat operands are per-x-tile contiguous slices
        there — see _group_var)."""
        pads = [(0, 0)] * (m.ndim - 1) + [(1, wp - w - 1)]
        m = jnp.pad(m.astype(jnp.float32), pads, mode="edge")
        lead = m.shape[:-2]
        m = m.reshape(lead + (n_rg, R, wp))
        if banded:
            m = m.reshape(lead + (n_rg, R, wp // x_tile, x_tile))
            m = jnp.moveaxis(m, -3, -2)  # (..., n_rg, n_xt, R, x_tile)
        return m.reshape(lead + (n_rg, R * wp))

    # per-pixel depth hypotheses in the aligned-row lane space
    # (edge-padded lanes, matching the old coord-field edge replication)
    if depth_planes is not None:
        # plane-per-step kernel: grid (D+2,), row groups in-kernel, no
        # zero template (halo planes and lane margins written in-kernel)
        lo, step, _ = depth_planes
        dv_a, dv_b = dv_lanes(lo), dv_lanes(step)
        kern = functools.partial(
            _warp_var_plane_kernel, views=V, band=band, C=C, h=h, w=w,
            w_src=w_src, src_hm=src_hm, src_row0=src_row0, R=R, wp=wp,
            x_band=x_band, x_tile=x_tile, x_align=x_align, D=D,
            halo=lay.halo, lanesp=lay.lanesp, n_rg=n_rg,
            interpret=interpret, compute_dtype=compute_dtype)
        out_block = C * lay.lanesp * np.dtype(out_dtype).itemsize
        vmem = int(min(127 * 1024 * 1024,
                       src_bytes + 2 * out_block + 24 * 1024 * 1024))
        vol, viol = pl.pallas_call(
            kern,
            grid=(D + 2,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(dv_a.shape, lambda d: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(dv_b.shape, lambda d: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R * wp), lambda d: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(src2d.shape, lambda d: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((1, C, lay.lanesp),
                                    lambda d: (d, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 1), lambda d: (0, 0),
                                    memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct((D + 2, C, lay.lanesp),
                                            out_dtype),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
            **({"interpret": True} if interpret else {}),
        )(proj_pack, dv_a, dv_b, mask, src2d)
        return vol, viol[0, 0]

    dv_a = dv_lanes(depth_values).reshape(D, n_rg, 1, R * wp)
    dv_b = dv_a     # aliased dummy (unused in volume mode)
    dv_spec = pl.BlockSpec((1, 1, 1, R * wp),
                           lambda d, r: (d, r, 0, 0),
                           memory_space=pltpu.VMEM)

    template = jnp.zeros((D + 2, C, lay.lanesp), out_dtype)
    H = lay.halo
    lane_off = lambda val: pl.multiple_of(val, 128)
    out_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(C), pl.Element(R * wp)),
        lambda d, r: (d + 1, 0, lane_off(H + (1 + r * R) * wp)),
        memory_space=pltpu.VMEM)

    kern = functools.partial(
        _warp_var_kernel, views=V, band=band, C=C, h=h, w=w, w_src=w_src,
        src_hm=src_hm, src_row0=src_row0, R=R, wp=wp, x_band=x_band,
        x_tile=x_tile, x_align=x_align,
        planes_mode=False, interpret=interpret,
        compute_dtype=compute_dtype)
    vmem = int(min(127 * 1024 * 1024, src_bytes + 28 * 1024 * 1024))
    vol, viol = pl.pallas_call(
        kern,
        grid=(D, n_rg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            dv_spec,
            dv_spec,
            pl.BlockSpec((1, R * wp), lambda d, r: (0, 0),
                         memory_space=pltpu.VMEM),
            out_spec,                 # aliased zero template
            pl.BlockSpec(src2d.shape, lambda d, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,
                   pl.BlockSpec((1, 1), lambda d, r: (0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((D + 2, C, lay.lanesp), out_dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        **({"interpret": True} if interpret else {}),
    )(proj_pack, dv_a, dv_b, mask, template, src2d)
    return vol, viol[0, 0]


def check_group_coverage(proj_pairs, depth_values, height, width,
                         rows_per_step: int = 4, band: int = 8,
                         x_band: int | None = None,
                         x_tile: int = 128, x_align: int = 128) -> bool:
    """Host-side precondition for the fused kernel: does every view's
    source-y spread over each R-row group fit the static band — and, with
    x_band set, do all of every (R-row × x_tile-col) tile's nonzero-weight
    source-x taps land inside the x_align-aligned x_band window the kernel
    will load? Mirrors ops.pallas_warp.check_band_coverage but for
    (R, band[, x_band]).

    proj_pairs: [B, V, 2, 4, 4]; depth_values: [B, D] or [B, D, H, W].

    The probe is evaluated in chunks of ≤16 depth planes: the per-group
    window condition reduces over lanes WITHIN each (plane, row group),
    so chunking over planes is exact — and the full [B, D, H, W]
    coordinate fields of a 192-plane probe at 1600×1184 (~1.5 GB each,
    several temporaries) would otherwise exhaust device memory during
    driver startup.
    """
    from ..core.geometry import compose_projection, linspace_depth_samples
    projs = compose_projection(jnp.asarray(proj_pairs))
    dv_in = jnp.asarray(depth_values)
    chunk = 16
    D = dv_in.shape[1]
    for d0 in range(0, D, chunk):
        dv = dv_in[:, d0:d0 + chunk]
        if dv.ndim == 2:
            dv = linspace_depth_samples(dv, dv.shape[1], height, width)
        if not _check_group_coverage_chunk(
                projs, dv, height, width, rows_per_step, band,
                x_band, x_tile, x_align):
            return False
    return True


def _check_group_coverage_chunk(projs, dv, height, width,
                                rows_per_step: int, band: int,
                                x_band: int | None,
                                x_tile: int, x_align: int) -> bool:
    R = rows_per_step

    def _window_ok(coords, extent, win, align):
        # all in-range taps must land in [start, start+win) where
        # start = clip((lo // align)·align, 0, pad(extent)−win) — the
        # exact window the kernel slices (the kernel zero-pads source
        # rows to an align multiple, so taps ≥ extent contribute zero
        # regardless and only kx ≤ extent−1 must be covered).
        # start ≤ max(lo, 0) always, so only the upper edge can escape.
        padded = -(-extent // align) * align
        lo = jnp.floor(jnp.min(coords, axis=-1))
        hi = jnp.floor(jnp.max(coords, axis=-1)) + 1.0
        start = jnp.clip((lo // align) * align, 0.0, float(padded - win))
        last = jnp.minimum(float(extent - 1), hi)
        return bool(jax.device_get(jnp.all(last <= start + win - 1)))

    ok = True
    for v in range(1, projs.shape[1]):
        rel = relative_projection(projs[:, v], projs[:, 0])
        px, py = _pixel_coords(rel, dv, height, width)
        B, D, H, W = py.shape
        groups = py.reshape(B, D, H // R, R * W)
        ok = ok and _window_ok(groups, height, band, align=1)
        if x_band is not None and x_band < width:
            # pad cols to the kernel's x-tiling (edge mode, matching
            # the kernel's edge-clamped in-kernel coords) and group (R rows × x_tile cols)
            wp = -(-(W + 2) // 128) * 128
            pxp = jnp.pad(px, ((0, 0), (0, 0), (0, 0), (1, wp - W - 1)),
                          mode="edge")
            n_xt = wp // x_tile
            tiles = pxp.reshape(B, D, H // R, R, n_xt, x_tile)
            tiles = jnp.moveaxis(tiles, 3, 4).reshape(
                B, D, H // R, n_xt, R * x_tile)
            ok = ok and _window_ok(tiles, width, x_band, align=x_align)
    return ok
