"""Differentiable fused plane-sweep warp + variance for the TRAIN path.

The eval fast path (ops/pallas_warp2.plane_sweep_variance_lanes) is
forward-only; training fell back to the XLA gather warp whose backward is
a scatter — both HBM-bound on TPU. This module wraps the same fused
forward kernel in a jax.custom_vjp whose backward is a second Pallas
kernel built from the identity

    var = (Σ_v x_v² / V − mean²)·mask,   x_v = Warp_v(src_v)  (linear)
    ∂L/∂x_v = (2/V)·g·mask·(x_v − mean)
    ∂L/∂src_v = Warp_vᵀ[∂L/∂x_v]

Warp_v is the hat matmul  band[band·C, x_band] @ hat_x[x_band, N] scaled
by hat_y, so its transpose is the SAME banded matmul with hat_x
transposed. The backward kernel runs two passes per (plane, row group):
pass 1 recomputes each view's warped rows con_v (small [C, lanes]
registers, like the forward) to form the mean; pass 2 recomputes the hat
weights (VPU only) and accumulates
  d_rows[band·C, x_band] = (Σ_s ∂cont·hat_y[s]) @ hat_xᵀ
into a VMEM-resident dsrc buffer at the same dynamic (ymin, xmin) window
the forward loaded. The TPU grid is sequential, so accumulating into a
constant-index output block across all (plane) steps is sound.

Hat weights depend only on the (stop-gradient) projections and depth
planes — exactly the reference semantics (homo_warping builds its grid
under torch.no_grad, /root/reference/models/modules.py:306-330), so the
only nonzero cotangent is w.r.t. the source features.

Numerical contract: forward ≡ plane_sweep_variance_lanes (it IS that
kernel); backward ≡ jax.grad through ops.warp.plane_sweep_variance up to
compute_dtype rounding (tests/test_pallas_warp_train.py checks both in
f32 interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.geometry import relative_projection
from .pallas_costreg import LaneLayout, make_layout
from .pallas_warp2 import (_coords_inkernel, _identity_projection,
                           _row_mask_np, plane_sweep_variance_lanes)


def backward_vmem_bytes(views: int, h: int, w: int, C: int,
                        compute_itemsize: int = 2,
                        x_align: int = 128) -> int:
    """Estimated VMEM residency of the custom-VJP backward kernel.

    The backward additionally keeps the full V-view src2d (compute dtype)
    PLUS an f32 [V·h·C, w_src] dsrc accumulator resident — ~3× the
    forward's footprint at bf16 — so the eval gate (per-view source bytes
    vs pallas_warp_max_bytes) is NOT sufficient for training. Callers
    (models/cascade.py) gate the train fast path on this estimate against
    the 127 MB clamp the kernel itself uses.

    Uses the x_align-padded width (the banded case pads; the dense case
    doesn't — padded is the conservative bound) and the same 24 MB
    scratch/pipeline margin as _fused_variance_bwd's vmem_limit.
    """
    lay = make_layout(h, w)
    w_src = -(-w // x_align) * x_align
    src = views * h * C * w_src * compute_itemsize
    dsrc = views * h * C * w_src * 4
    g = 2 * C * lay.lanesp * 4
    return src + dsrc + g + 24 * 1024 * 1024


def lanes_to_ndhwc(vol: jnp.ndarray, lay: LaneLayout, C: int) -> jnp.ndarray:
    """[D+2, C, lanesp] lanes volume → [D, h, w, C] NDHWC interior.

    Pure slicing/reshape (the halo planes, border rows/cols and lane
    margins are zeros) — XLA autodiff maps cotangents straight back into
    the lane positions, which is what the custom-vjp kernel expects."""
    D = vol.shape[0] - 2
    interior = vol[1:-1, :, lay.halo:lay.halo + lay.lanes0]
    interior = interior.reshape(D, C, lay.hp, lay.wp)
    return jnp.transpose(interior[:, :, 1:-1, 1:1 + lay.w], (0, 2, 3, 1))


def _to_tiles(x, R, wp, x_tile):
    """Row-major [C, R·wp] → tile-major (inverse of _group_var.to_rows)."""
    n_xt = wp // x_tile
    return jnp.concatenate(
        [x[:, r * wp + xt * x_tile: r * wp + (xt + 1) * x_tile]
         for xt in range(n_xt) for r in range(R)], axis=1)


def _dv_lanes(m, lay, R, banded, x_tile):
    """[h, w] map → [n_rg, R·wp] edge-padded lane rows (tile-major when
    banded) — mirror of plane_sweep_variance_lanes.dv_lanes."""
    wp, w = lay.wp, lay.w
    n_rg = lay.h // R
    m = jnp.pad(m.astype(jnp.float32), ((0, 0), (1, wp - w - 1)),
                mode="edge")
    m = m.reshape(n_rg, R, wp)
    if banded:
        m = m.reshape(n_rg, R, wp // x_tile, x_tile)
        m = jnp.moveaxis(m, -3, -2)
    return m.reshape(n_rg, R * wp)


def _warp_var_bwd_kernel(proj_ref, dv_a, dv_b, mask_ref, src_ref, g_ref,
                         dsrc_ref, *, views: int, band: int, C: int,
                         h: int, w: int, w_src: int, R: int, wp: int,
                         x_band: int | None, x_tile: int, x_align: int,
                         D: int, halo: int, n_rg: int, interpret: bool,
                         compute_dtype):
    """One grid step per depth plane: recompute every view's warped rows
    for each R-row group, form ∂L/∂x_v, and accumulate ∂L/∂src into the
    resident dsrc block (zeroed at step 0)."""
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        dsrc_ref[...] = jnp.zeros(dsrc_ref.shape, dsrc_ref.dtype)

    didx = p.astype(jnp.float32)
    banded_x = x_band is not None and x_band < w
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    lanes = R * wp
    head = halo + wp
    sub_jf = jax.lax.broadcasted_iota(
        jnp.int32, (band, lanes), 0).astype(jnp.float32)
    roll = jnp.roll if interpret else pltpu.roll
    inv_v = 1.0 / views
    n_xt = wp // x_tile

    def _coords(v, depth, row0):
        return _coords_inkernel(proj_ref, depth, v, h, w, wp, row0,
                                tiles=(R, x_tile) if banded_x else None)

    def _hat_y(py, ymin):
        py_rel = py - ymin.astype(jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(py_rel - sub_jf))

    def _ymin(py):
        return jnp.clip(jnp.floor(jnp.min(py)).astype(jnp.int32),
                        0, h - band)

    def body(grp, carry):
        depth = dv_a[pl.ds(grp, 1), :] + didx * dv_b[pl.ds(grp, 1), :]
        depth = depth.reshape(1, lanes)
        row0 = grp * R
        goff = pl.multiple_of(head + grp * lanes, 128)
        g = (g_ref[0, :, pl.ds(goff, lanes)].astype(jnp.float32)
             * mask_ref[0])                              # [C, lanes] rows

        # reference view rows (identity warp), as in the forward
        pieces = []
        zpad = (jnp.zeros((C, wp - w_src), jnp.float32)
                if wp > w_src else None)
        for r in range(R):
            row = src_ref[pl.ds((row0 + r) * C, C), :].astype(jnp.float32)
            pieces.append(row if zpad is None
                          else jnp.concatenate([row, zpad], axis=1))
        ref_b = roll(jnp.concatenate(pieces, axis=1), 1, axis=1)

        # ---- pass 1: recompute each view's warped rows → mean ----
        if not banded_x:
            kx = jax.lax.broadcasted_iota(
                jnp.int32, (w_src, lanes), 0).astype(jnp.float32)
        kx_rel = jax.lax.broadcasted_iota(
            jnp.int32, (x_band or 1, R * x_tile), 0).astype(jnp.float32)
        cons = []
        acc_s = jnp.zeros((C, lanes), jnp.float32)
        for v in range(1, views):
            px, py = _coords(v, depth, row0)
            ymin = _ymin(py)
            hat_y = _hat_y(py, ymin)
            if not banded_x:
                rows = src_ref[pl.ds((v * h + ymin) * C, band * C),
                               :].astype(compute_dtype)
                hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(px - kx)).astype(
                    compute_dtype)
                out_x = jnp.dot(rows, hat_x,
                                preferred_element_type=jnp.float32,
                                precision=precision)
                con = None
                for s in range(band):
                    piece = out_x[s * C:(s + 1) * C, :] * hat_y[s:s + 1, :]
                    con = piece if con is None else con + piece
            else:
                conts = []
                for xt in range(n_xt):
                    sl = slice(xt * R * x_tile, (xt + 1) * R * x_tile)
                    pxt = px[:, sl]
                    pyt = hat_y[:, sl]
                    xmin = jnp.clip(
                        (jnp.floor(jnp.min(pxt)).astype(jnp.int32)
                         // x_align) * x_align, 0, w_src - x_band)
                    xmin = pl.multiple_of(xmin, x_align)
                    rows = src_ref[pl.ds((v * h + ymin) * C, band * C),
                                   pl.ds(xmin, x_band)].astype(
                        compute_dtype)
                    pxt_rel = pxt - xmin.astype(jnp.float32)
                    hat_x = jnp.maximum(
                        0.0, 1.0 - jnp.abs(pxt_rel - kx_rel)).astype(
                        compute_dtype)
                    out_x = jnp.dot(rows, hat_x,
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
                    cont = None
                    for s in range(band):
                        piece = (out_x[s * C:(s + 1) * C, :]
                                 * pyt[s:s + 1, :])
                        cont = piece if cont is None else cont + piece
                    conts.append(cont)
                con = jnp.concatenate(conts, axis=1)     # tile-major
            cons.append(con)
            acc_s = acc_s + con

        if banded_x:
            to_rows = lambda x: jnp.concatenate(
                [x[:, xt * R * x_tile + r * x_tile:
                   xt * R * x_tile + (r + 1) * x_tile]
                 for r in range(R) for xt in range(n_xt)], axis=1)
            mean = (to_rows(acc_s) + ref_b) * inv_v      # row-major
        else:
            mean = (acc_s + ref_b) * inv_v

        # ---- ref view: identity warp, lane→row unroll ----
        dref = (2.0 * inv_v) * g * (ref_b - mean)        # [C, lanes]
        # undo the forward's roll-by-1 (pltpu.roll needs a non-negative
        # shift; lanes−1 ≡ −1 mod lanes)
        dref_u = roll(dref, lanes - 1, axis=1)
        for r in range(R):
            dsrc_ref[pl.ds((row0 + r) * C, C), :] += (
                dref_u[:, r * wp: r * wp + w_src])

        # ---- pass 2: source views — transposed hat matmuls ----
        if banded_x:
            g_t = _to_tiles(g, R, wp, x_tile)
            mean_t = _to_tiles(mean, R, wp, x_tile)
        for v in range(1, views):
            con = cons[v - 1]
            px, py = _coords(v, depth, row0)             # recompute hats
            ymin = _ymin(py)
            hat_y = _hat_y(py, ymin)
            if not banded_x:
                dx = (2.0 * inv_v) * g * (con - mean)    # [C, lanes]
                d_outx = jnp.concatenate(
                    [dx * hat_y[s:s + 1, :] for s in range(band)],
                    axis=0).astype(compute_dtype)        # [band·C, lanes]
                hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(px - kx)).astype(
                    compute_dtype)
                d_rows = jnp.dot(d_outx, hat_x.T,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)    # [band·C, w_src]
                dsrc_ref[pl.ds((v * h + ymin) * C, band * C), :] += d_rows
            else:
                dx = (2.0 * inv_v) * g_t * (con - mean_t)  # tile-major
                for xt in range(n_xt):
                    sl = slice(xt * R * x_tile, (xt + 1) * R * x_tile)
                    dxt = dx[:, sl]
                    pyt = hat_y[:, sl]
                    pxt = px[:, sl]
                    xmin = jnp.clip(
                        (jnp.floor(jnp.min(pxt)).astype(jnp.int32)
                         // x_align) * x_align, 0, w_src - x_band)
                    xmin = pl.multiple_of(xmin, x_align)
                    pxt_rel = pxt - xmin.astype(jnp.float32)
                    hat_x = jnp.maximum(
                        0.0, 1.0 - jnp.abs(pxt_rel - kx_rel)).astype(
                        compute_dtype)                   # [x_band, R·xt]
                    d_outx = jnp.concatenate(
                        [dxt * pyt[s:s + 1, :] for s in range(band)],
                        axis=0).astype(compute_dtype)    # [band·C, R·xt]
                    d_rows = jnp.dot(d_outx, hat_x.T,
                                     preferred_element_type=jnp.float32,
                                     precision=precision)
                    dsrc_ref[pl.ds((v * h + ymin) * C, band * C),
                             pl.ds(xmin, x_band)] += d_rows
        return carry

    jax.lax.fori_loop(0, n_rg, body, jnp.int32(0))


def _prep(features, projs, lay, R, banded, x_tile, x_align, lo, step,
          compute_dtype):
    """src2d / proj_pack / dv rows — mirror of the forward's host prep."""
    V, h, w, C = features.shape
    w_src = -(-w // x_align) * x_align if banded else w
    src2d = jnp.transpose(features.astype(compute_dtype),
                          (0, 1, 3, 2)).reshape(V * h * C, w)
    if w_src != w:
        src2d = jnp.pad(src2d, ((0, 0), (0, w_src - w)))
    ref_proj = projs[0]
    rels = [(jax.lax.stop_gradient(
        relative_projection(projs[v:v + 1], ref_proj[None]))[0]
        if v else _identity_projection(ref_proj))
        for v in range(V)]
    proj_pack = jnp.stack(rels).reshape(V, 16).astype(jnp.float32)
    dv_a = _dv_lanes(lo, lay, R, banded, x_tile)
    dv_b = _dv_lanes(step, lay, R, banded, x_tile)
    return src2d, proj_pack, dv_a, dv_b, w_src


def plane_sweep_variance_fused_train(
        features: jnp.ndarray, projs: jnp.ndarray, depth_planes, *,
        rows_per_step: int = 4, band: int = 8,
        x_band: int | None = None, x_tile: int = 128, x_align: int = 128,
        compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
        interpret: bool = False):
    """Differentiable fused variance volume, single batch element.

    features: [V, h, w, C] (view 0 = reference, REQUIRES GRAD);
    projs: [V, 4, 4] K-folded; depth_planes: (lo [h, w], step [h, w], D).
    Returns ([D+2, C, lanesp] lanes volume, violations) like the eval
    kernel; feed lanes_to_ndhwc for the XLA cost regularizer.

    Same band-coverage PRECONDITION as the eval kernel
    (pallas_warp2.check_group_coverage) — the forward's violation counter
    reports breaches at runtime; the backward trusts the same windows.
    """
    lo, step, D = depth_planes
    static = (rows_per_step, band, x_band, x_tile, x_align, int(D),
              jnp.dtype(compute_dtype).name, jnp.dtype(out_dtype).name,
              bool(interpret))
    return _fused_variance(static, features, projs,
                           jnp.asarray(lo, jnp.float32),
                           jnp.asarray(step, jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_variance(static, features, projs, lo, step):
    out, _ = _fused_variance_fwd(static, features, projs, lo, step)
    return out


def _fused_variance_fwd(static, features, projs, lo, step):
    (R, band, x_band, x_tile, x_align, D, cdt, odt, interpret) = static
    V, h, w, C = features.shape
    lay = make_layout(h, w)
    vol, viol = plane_sweep_variance_lanes(
        features, projs, None, lay, rows_per_step=R, band=band,
        x_band=x_band, x_tile=x_tile, x_align=x_align,
        depth_planes=(lo, step, D), compute_dtype=jnp.dtype(cdt).type,
        out_dtype=jnp.dtype(odt).type, interpret=interpret)
    return (vol, viol), (features, projs, lo, step)


def _fused_variance_bwd(static, res, cts):
    (R, band, x_band, x_tile, x_align, D, cdt, odt, interpret) = static
    g_vol = cts[0]                      # [D+2, C, lanesp]; viol ct ignored
    features, projs, lo, step = res
    V, h, w, C = features.shape
    lay = make_layout(h, w)
    compute_dtype = jnp.dtype(cdt).type
    banded = x_band is not None and x_band < w
    src2d, proj_pack, dv_a, dv_b, w_src = _prep(
        features, projs, lay, R, banded, x_tile, x_align, lo, step,
        compute_dtype)
    mask = jnp.asarray(_row_mask_np(R, lay.wp, w))

    kern = functools.partial(
        _warp_var_bwd_kernel, views=V, band=band, C=C, h=h, w=w,
        w_src=w_src, R=R, wp=lay.wp, x_band=x_band, x_tile=x_tile,
        x_align=x_align, D=D, halo=lay.halo, n_rg=h // R,
        interpret=interpret, compute_dtype=compute_dtype)
    src_bytes = src2d.size * np.dtype(compute_dtype).itemsize
    dsrc_bytes = V * h * C * w_src * 4
    g_bytes = C * lay.lanesp * np.dtype(g_vol.dtype).itemsize
    vmem = int(min(127 * 1024 * 1024,
                   src_bytes + dsrc_bytes + 2 * g_bytes
                   + 24 * 1024 * 1024))
    dsrc = pl.pallas_call(
        kern,
        grid=(D,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(dv_a.shape, lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dv_b.shape, lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R * lay.wp), lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(src2d.shape, lambda d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, lay.lanesp), lambda d: (d + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((V * h * C, w_src), lambda d: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V * h * C, w_src), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        **({"interpret": True} if interpret else {}),
    )(proj_pack, dv_a, dv_b, mask, src2d, g_vol)

    # [V·h·C, w_src] → [V, h, w, C] (drop the zero-pad cols)
    dfeat = jnp.transpose(
        dsrc[:, :w].reshape(V, h, C, w), (0, 1, 3, 2)).astype(
        features.dtype)
    return (dfeat, jnp.zeros_like(projs), jnp.zeros_like(lo),
            jnp.zeros_like(step))


_fused_variance.defvjp(_fused_variance_fwd, _fused_variance_bwd)
