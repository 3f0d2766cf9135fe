"""Differentiable fused warp for the want_volume (clean stage-1) TRAIN path.

The rendering branch consumes the stage-1 `volume_feature_no_ref` — the
V−1 warped source IMAGES concatenated with the no-ref feature variance
(/root/reference/models/casmvsnet.py:58-100,231). Through round 3 this was
the one train stage still on the XLA gather warp (forward) + scatter
(backward): ops/pallas_warp_train.py covers only the variance-only stages,
and the volume path additionally re-warped the source features for
`plane_sweep_variance_no_ref`.

This kernel computes, in ONE VMEM-resident pass over (plane, row group,
view) with the source FEATURES and IMAGES stacked channel-major
([V·h·(C+3), w] — the image channels ride the same hat matmul as three
extra channels):

    variance      (all V views, ref included)     → cost regularizer
    var_no_ref    (src views only, ÷V)            → volume feature
    warped imgs   (per src view, 3 channels each) → volume feature

All three leave in the lanes layout (lanes_to_ndhwc slices them back to
NDHWC). The custom-VJP backward is a second Pallas kernel: with
   mean    = (Σ_v x_v + ref)/V,  mean_nr = Σ_v x_v / V,
   ∂L/∂x_v = (2/V)·g_var·(x_v − mean) + (2/V)·g_nr·(x_v − mean_nr)
stacked with the image cotangent, and ∂L/∂src_v = Warp_vᵀ[∂L/∂x_v] — the
transposed banded hat matmul accumulated into a resident dsrc buffer
(same construction as ops/pallas_warp_train._warp_var_bwd_kernel).

DENSE-X ONLY: the want_volume stage is stage 1 (the narrowest), whose
ladder configs run a dense x contraction; callers must not pass an
x-band here (models/cascade.py gates on it).

Numerical contract: forward ≡ {plane_sweep_variance,
plane_sweep_variance_no_ref, homo_warp} of ops/warp.py; backward ≡
jax.grad through that XLA composition (tests/test_pallas_warp_volume.py,
f32 interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_costreg import make_layout
from .pallas_warp2 import _coords_inkernel, _row_mask_np
from .pallas_warp_train import _dv_lanes, _prep


def volume_backward_vmem_bytes(views: int, h: int, w: int, C: int,
                               compute_itemsize: int = 2) -> int:
    """VMEM residency estimate of the volume kernel's backward: stacked
    src (C+3 channels/view) + f32 dsrc accumulator + the three cotangent
    plane blocks + the usual scratch margin."""
    lay = make_layout(h, w)
    CT = _ct_padded(C, 3)
    src = views * h * CT * w * compute_itemsize
    dsrc = views * h * CT * w * 4
    g = (2 * C + 3 * (views - 1)) * lay.lanesp * 4
    return src + dsrc + g + 24 * 1024 * 1024


def _warp_ref_rows(src_ref, row0, R, C, CT, w_src, wp, roll):
    """Reference-view identity rows [C, R·wp] (feature channels only),
    rolled to lane offset 1 like the fused variance kernel."""
    pieces = []
    zpad = (jnp.zeros((C, wp - w_src), jnp.float32) if wp > w_src else None)
    for r in range(R):
        row = src_ref[pl.ds((row0 + r) * CT, C), :].astype(jnp.float32)
        pieces.append(row if zpad is None
                      else jnp.concatenate([row, zpad], axis=1))
    return roll(jnp.concatenate(pieces, axis=1), 1, axis=1)


def _warp_view_con(proj_ref, src_ref, depth, row0, v, *, band, CT, h, w,
                   w_src, wp, sub_jf, kx, compute_dtype, precision):
    """One source view's warped rows con [CT, R·wp] for one (plane,
    group), plus (ymin, hat_y, violation count) for reuse by the
    backward's transposed matmul."""
    px, py = _coords_inkernel(proj_ref, depth, v, h, w, wp, row0)
    ymin = jnp.clip(jnp.floor(jnp.min(py)).astype(jnp.int32), 0, h - band)
    last = jnp.minimum(jnp.floor(jnp.max(py)) + 1.0, float(h - 1))
    viol = (last > ymin.astype(jnp.float32) + float(band - 1)).astype(
        jnp.int32)
    py_rel = py - ymin.astype(jnp.float32)
    hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(py_rel - sub_jf))
    rows = src_ref[pl.ds((v * h + ymin) * CT, band * CT), :].astype(
        compute_dtype)
    hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(px - kx)).astype(compute_dtype)
    out_x = jnp.dot(rows, hat_x, preferred_element_type=jnp.float32,
                    precision=precision)                  # [band·CT, lanes]
    con = None
    for s in range(band):
        piece = out_x[s * CT:(s + 1) * CT, :] * hat_y[s:s + 1, :]
        con = piece if con is None else con + piece
    return con, px, ymin, hat_y, viol


def _warp_vol_fwd_kernel(proj_ref, dv_a, dv_b, mask_ref, src_ref,
                         var_ref, varnr_ref, img_ref, viol_ref, *,
                         views: int, band: int, C: int, CI: int, CT: int,
                         h: int, w: int, w_src: int, R: int, wp: int,
                         D: int, halo: int, lanesp: int, n_rg: int,
                         interpret: bool, compute_dtype):
    """One grid step per output plane; row groups in an in-kernel loop."""
    p = pl.program_id(0)
    n_img = CI * (views - 1)

    @pl.when(p == 0)
    def _init_viol():
        viol_ref[0, 0] = 0

    @pl.when(jnp.logical_or(p == 0, p == D + 1))
    def _halo_plane():
        var_ref[0] = jnp.zeros((C, lanesp), var_ref.dtype)
        varnr_ref[0] = jnp.zeros((C, lanesp), varnr_ref.dtype)
        img_ref[0] = jnp.zeros((n_img, lanesp), img_ref.dtype)

    @pl.when(jnp.logical_and(p > 0, p < D + 1))
    def _plane():
        didx = (p - 1).astype(jnp.float32)
        head = halo + wp
        tail0 = halo + (1 + h) * wp
        for ref, nch in ((var_ref, C), (varnr_ref, C), (img_ref, n_img)):
            ref[0, :, :head] = jnp.zeros((nch, head), ref.dtype)
            ref[0, :, tail0:] = jnp.zeros((nch, lanesp - tail0), ref.dtype)

        lanes = R * wp
        precision = (jax.lax.Precision.HIGHEST
                     if compute_dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
        sub_jf = jax.lax.broadcasted_iota(
            jnp.int32, (band, lanes), 0).astype(jnp.float32)
        kx = jax.lax.broadcasted_iota(
            jnp.int32, (w_src, lanes), 0).astype(jnp.float32)
        roll = jnp.roll if interpret else pltpu.roll
        inv_v = 1.0 / views
        mask = mask_ref[0]

        def body(g, carry):
            depth = (dv_a[pl.ds(g, 1), :]
                     + didx * dv_b[pl.ds(g, 1), :]).reshape(1, lanes)
            row0 = g * R
            off = pl.multiple_of(head + g * lanes, 128)

            acc_s = jnp.zeros((C, lanes), jnp.float32)
            acc_q = jnp.zeros((C, lanes), jnp.float32)
            viol = jnp.int32(0)
            for v in range(1, views):
                con, _, _, _, vi = _warp_view_con(
                    proj_ref, src_ref, depth, row0, v, band=band, CT=CT,
                    h=h, w=w, w_src=w_src, wp=wp, sub_jf=sub_jf, kx=kx,
                    compute_dtype=compute_dtype, precision=precision)
                viol = viol + vi
                con_f = con[:C]
                acc_s = acc_s + con_f
                acc_q = acc_q + con_f * con_f
                img_ref[0, (v - 1) * CI: v * CI, pl.ds(off, lanes)] = (
                    con[C:C + CI] * mask).astype(img_ref.dtype)

            ref_b = _warp_ref_rows(src_ref, row0, R, C, CT, w_src, wp, roll)
            sum_all = acc_s + ref_b
            mean = sum_all * inv_v
            var = ((acc_q + ref_b * ref_b) * inv_v - mean * mean) * mask
            mean_nr = acc_s * inv_v
            var_nr = (acc_q * inv_v - mean_nr * mean_nr) * mask
            var_ref[0, :, pl.ds(off, lanes)] = var.astype(var_ref.dtype)
            varnr_ref[0, :, pl.ds(off, lanes)] = var_nr.astype(
                varnr_ref.dtype)
            return carry + viol

        viol_ref[0, 0] = viol_ref[0, 0] + jax.lax.fori_loop(
            0, n_rg, body, jnp.int32(0))


def _warp_vol_bwd_kernel(proj_ref, dv_a, dv_b, mask_ref, src_ref, gv_ref,
                         gnr_ref, gi_ref, dsrc_ref, *, views: int,
                         band: int, C: int, CI: int, CT: int, h: int,
                         w: int, w_src: int, R: int, wp: int, D: int,
                         halo: int, n_rg: int, interpret: bool,
                         compute_dtype):
    """One grid step per depth plane: recompute warped rows, form the
    stacked cotangent, accumulate transposed hat matmuls into dsrc."""
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        dsrc_ref[...] = jnp.zeros(dsrc_ref.shape, dsrc_ref.dtype)

    didx = p.astype(jnp.float32)
    lanes = R * wp
    head = halo + wp
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    sub_jf = jax.lax.broadcasted_iota(
        jnp.int32, (band, lanes), 0).astype(jnp.float32)
    kx = jax.lax.broadcasted_iota(
        jnp.int32, (w_src, lanes), 0).astype(jnp.float32)
    roll = jnp.roll if interpret else pltpu.roll
    inv_v = 1.0 / views

    def body(g, carry):
        depth = (dv_a[pl.ds(g, 1), :]
                 + didx * dv_b[pl.ds(g, 1), :]).reshape(1, lanes)
        row0 = g * R
        goff = pl.multiple_of(head + g * lanes, 128)
        mask = mask_ref[0]
        gv = gv_ref[0, :, pl.ds(goff, lanes)].astype(jnp.float32) * mask
        gnr = gnr_ref[0, :, pl.ds(goff, lanes)].astype(jnp.float32) * mask

        # ---- pass 1: recompute each view's warped rows → means ----
        cons, hats = [], []
        acc_s = jnp.zeros((C, lanes), jnp.float32)
        for v in range(1, views):
            con, px, ymin, hat_y, _ = _warp_view_con(
                proj_ref, src_ref, depth, row0, v, band=band, CT=CT,
                h=h, w=w, w_src=w_src, wp=wp, sub_jf=sub_jf, kx=kx,
                compute_dtype=compute_dtype, precision=precision)
            cons.append(con)
            hats.append((px, ymin, hat_y))
            acc_s = acc_s + con[:C]

        ref_b = _warp_ref_rows(src_ref, row0, R, C, CT, w_src, wp, roll)
        mean = (acc_s + ref_b) * inv_v
        mean_nr = acc_s * inv_v

        # ---- ref view: identity warp, lane→row unroll ----
        dref = (2.0 * inv_v) * gv * (ref_b - mean)        # [C, lanes]
        dref_u = roll(dref, lanes - 1, axis=1)
        for r in range(R):
            dsrc_ref[pl.ds((row0 + r) * CT, C), :] += (
                dref_u[:, r * wp: r * wp + w_src])

        # ---- source views: transposed hat matmuls ----
        for v in range(1, views):
            con = cons[v - 1]
            px, ymin, hat_y = hats[v - 1]
            con_f = con[:C]
            dcf = (2.0 * inv_v) * (gv * (con_f - mean)
                                   + gnr * (con_f - mean_nr))
            gi = gi_ref[0, pl.ds((v - 1) * CI, CI),
                        pl.ds(goff, lanes)].astype(jnp.float32) * mask
            pad = ((jnp.zeros((CT - C - CI, lanes), jnp.float32),)
                   if CT > C + CI else ())
            dcont = jnp.concatenate([dcf, gi, *pad], axis=0)  # [CT, lanes]
            d_outx = jnp.concatenate(
                [dcont * hat_y[s:s + 1, :] for s in range(band)],
                axis=0).astype(compute_dtype)             # [band·CT, lanes]
            hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(px - kx)).astype(
                compute_dtype)
            d_rows = jnp.dot(d_outx, hat_x.T,
                             preferred_element_type=jnp.float32,
                             precision=precision)         # [band·CT, w_src]
            dsrc_ref[pl.ds((v * h + ymin) * CT, band * CT), :] += d_rows
        return carry

    jax.lax.fori_loop(0, n_rg, body, jnp.int32(0))


def plane_sweep_volume_fused_train(
        features: jnp.ndarray, imgs: jnp.ndarray, projs: jnp.ndarray,
        depth_planes, *, rows_per_step: int = 4, band: int = 8,
        compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
        interpret: bool = False):
    """Fused variance + no-ref variance + warped source images,
    differentiable, single batch element, dense x contraction.

    features: [V, h, w, C] (view 0 = reference, REQUIRES GRAD);
    imgs: [V, h, w, 3] stage-resolution images (grad flows too);
    projs: [V, 4, 4] K-folded; depth_planes: (lo [h,w], step [h,w], D).

    Returns (var_lanes [D+2, C, lanesp], var_nr_lanes [D+2, C, lanesp],
    imgs_lanes [D+2, 3(V−1), lanesp], violations int32). Feed each through
    pallas_warp_train.lanes_to_ndhwc.

    Same band-coverage PRECONDITION as the variance kernels
    (pallas_warp2.check_group_coverage, y band only — dense x); runtime
    breaches are counted in `violations`.
    """
    lo, step, D = depth_planes
    static = (rows_per_step, band, int(D),
              jnp.dtype(compute_dtype).name, jnp.dtype(out_dtype).name,
              bool(interpret))
    return _fused_volume(static, features, imgs, projs,
                         jnp.asarray(lo, jnp.float32),
                         jnp.asarray(step, jnp.float32))


def _ct_padded(C: int, CI: int) -> int:
    """Per-(view, row) channel-stack height, padded to a sublane multiple:
    the kernels slice src/dsrc at dynamic row offsets (v·h + ymin)·CT, and
    Mosaic must statically prove those are multiples of the 8-sublane
    tiling — true for any dynamic ymin iff CT itself is."""
    return -(-(C + CI) // 8) * 8


def _stack_src(features, imgs, compute_dtype):
    """[V, h, w, C] + [V, h, w, CI] → channel-major [V·h·CT, w] with the
    channel stack zero-padded to CT = _ct_padded(C, CI)."""
    both = jnp.concatenate([features, imgs], axis=-1)
    V, h, w, ct = both.shape
    ct_p = _ct_padded(features.shape[-1], imgs.shape[-1])
    if ct_p != ct:
        both = jnp.pad(both, ((0, 0), (0, 0), (0, 0), (0, ct_p - ct)))
    return jnp.transpose(both.astype(compute_dtype),
                         (0, 1, 3, 2)).reshape(V * h * ct_p, w)


def _call_fwd(static, features, imgs, projs, lo, step):
    (R, band, D, cdt, odt, interpret) = static
    V, h, w, C = features.shape
    CI = imgs.shape[-1]
    CT = _ct_padded(C, CI)
    lay = make_layout(h, w)
    compute_dtype = jnp.dtype(cdt).type
    out_dtype = jnp.dtype(odt).type
    src2d = _stack_src(features, imgs, compute_dtype)
    # reuse the variance-train host prep for projections/depth rows (its
    # src2d/w_src outputs are recomputed for the stacked channel count)
    _, proj_pack, dv_a, dv_b, _ = _prep(
        features, projs, lay, R, False, 128, 128, lo, step, compute_dtype)
    mask = jnp.asarray(_row_mask_np(R, lay.wp, w))
    n_img = CI * (V - 1)

    kern = functools.partial(
        _warp_vol_fwd_kernel, views=V, band=band, C=C, CI=CI, CT=CT, h=h,
        w=w, w_src=w, R=R, wp=lay.wp, D=D, halo=lay.halo,
        lanesp=lay.lanesp, n_rg=h // R, interpret=interpret,
        compute_dtype=compute_dtype)
    src_bytes = src2d.size * np.dtype(compute_dtype).itemsize
    out_block = (2 * C + n_img) * lay.lanesp * np.dtype(out_dtype).itemsize
    vmem = int(min(127 * 1024 * 1024,
                   src_bytes + 2 * out_block + 24 * 1024 * 1024))
    plane_spec = lambda nch: pl.BlockSpec((1, nch, lay.lanesp),
                                          lambda d: (d, 0, 0),
                                          memory_space=pltpu.VMEM)
    var, var_nr, img, viol = pl.pallas_call(
        kern,
        grid=(D + 2,),
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
        ],
        out_specs=(plane_spec(C), plane_spec(C), plane_spec(n_img),
                   pl.BlockSpec((1, 1), lambda d: (0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((D + 2, C, lay.lanesp), out_dtype),
                   jax.ShapeDtypeStruct((D + 2, C, lay.lanesp), out_dtype),
                   jax.ShapeDtypeStruct((D + 2, n_img, lay.lanesp),
                                        out_dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        **({"interpret": True} if interpret else {}),
    )(proj_pack, dv_a, dv_b, mask, src2d)
    return var, var_nr, img, viol[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_volume(static, features, imgs, projs, lo, step):
    out, _ = _fused_volume_fwd(static, features, imgs, projs, lo, step)
    return out


def _fused_volume_fwd(static, features, imgs, projs, lo, step):
    return (_call_fwd(static, features, imgs, projs, lo, step),
            (features, imgs, projs, lo, step))


def _fused_volume_bwd(static, res, cts):
    (R, band, D, cdt, odt, interpret) = static
    g_var, g_nr, g_img = cts[0], cts[1], cts[2]   # violation ct ignored
    features, imgs, projs, lo, step = res
    V, h, w, C = features.shape
    CI = imgs.shape[-1]
    CT = _ct_padded(C, CI)
    lay = make_layout(h, w)
    compute_dtype = jnp.dtype(cdt).type
    src2d = _stack_src(features, imgs, compute_dtype)
    _, proj_pack, dv_a, dv_b, _ = _prep(
        features, projs, lay, R, False, 128, 128, lo, step, compute_dtype)
    mask = jnp.asarray(_row_mask_np(R, lay.wp, w))

    kern = functools.partial(
        _warp_vol_bwd_kernel, views=V, band=band, C=C, CI=CI, CT=CT, h=h,
        w=w, w_src=w, R=R, wp=lay.wp, D=D, halo=lay.halo, n_rg=h // R,
        interpret=interpret, compute_dtype=compute_dtype)
    src_bytes = src2d.size * np.dtype(compute_dtype).itemsize
    dsrc_bytes = V * h * CT * w * 4
    g_bytes = (2 * C + CI * (V - 1)) * lay.lanesp * 4
    vmem = int(min(127 * 1024 * 1024,
                   src_bytes + dsrc_bytes + 2 * g_bytes
                   + 24 * 1024 * 1024))
    plane_spec = lambda nch: pl.BlockSpec((1, nch, lay.lanesp),
                                          lambda d: (d + 1, 0, 0),
                                          memory_space=pltpu.VMEM)
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
            plane_spec(C), plane_spec(C), plane_spec(CI * (V - 1)),
        ],
        out_specs=pl.BlockSpec((V * h * CT, w), lambda d: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V * h * CT, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        **({"interpret": True} if interpret else {}),
    )(proj_pack, dv_a, dv_b, mask, src2d, g_var, g_nr, g_img)

    dboth = jnp.transpose(dsrc.reshape(V, h, CT, w), (0, 1, 3, 2))
    dfeat = dboth[..., :C].astype(features.dtype)
    dimg = dboth[..., C:C + CI].astype(imgs.dtype)
    return (dfeat, dimg, jnp.zeros_like(projs), jnp.zeros_like(lo),
            jnp.zeros_like(step))


_fused_volume.defvjp(_fused_volume_fwd, _fused_volume_bwd)
