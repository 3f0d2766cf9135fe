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
  * grid = (depth planes, row groups of R): per step, each view
    contributes ONE hat-matmul
        band[band·C, w] @ hat_x[w, R·wp]
    (hat(x−k) = max(0, 1−|x−k|) reproduces torch's zeros-padded bilinear
    exactly), a VPU hat_y weighting, and a band reduction by static
    sublane-slice adds;
  * Σx and Σx² accumulate in f32 registers across the static view loop —
    warped volumes NEVER touch HBM — and the variance
    E[x²]−E[x]² is written ONCE, directly into the cost regularizer's
    128-aligned lane layout (ops/pallas_costreg.LaneLayout) via Element
    blocks: plane d+1, lane offset halo + (1 + r·R)·wp. Borders and
    margins stay zero through an aliased zero template, and out-of-row
    padding lanes carry dummy coords (px = −5) whose hat weights are zero;
  * the y-band is a HOST-SIDE PRECONDITION like the v1 kernel: callers
    gate with check_group_coverage (R-row groups, band rows); violations
    silently zero out-of-band taps.

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


def _coords_for_view(proj_rel, depth_values, h, w, wp):
    """Pixel-space sample coords in the aligned-row lane space.

    Returns (px, py) each [D, h, wp] f32: lane x ∈ [1, w+1) holds the
    coords of real pixel x−1; border/tail lanes hold px = −5 (zero hat
    weight) and an edge-replicated py (keeps the in-kernel band anchor
    unaffected by padding)."""
    px, py = _pixel_coords(proj_rel, depth_values, h, w)   # [1, D, h, w]
    px, py = px[0], py[0]
    px = jnp.pad(px, ((0, 0), (0, 0), (1, wp - w - 1)), constant_values=-5.0)
    py = jnp.pad(py, ((0, 0), (0, 0), (1, wp - w - 1)), mode="edge")
    return px, py


def _warp_var_kernel(px_ref, py_ref, tmpl_ref, src_ref, out_ref, *,
                     views: int, band: int, C: int, h: int, w: int,
                     R: int, wp: int, compute_dtype):
    """One step: variance over all views for (depth plane, R-row group).

    src_ref: [V·h·C, w] resident stacked feature maps; px/py:
    [1, 1, V, R·wp]; out: [1, C, R·wp]."""
    lanes = R * wp
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kx = jax.lax.broadcasted_iota(jnp.int32, (w, lanes), 0).astype(
        jnp.float32)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (band * C, lanes), 0) // C

    acc_s = jnp.zeros((C, lanes), jnp.float32)
    acc_q = jnp.zeros((C, lanes), jnp.float32)
    for v in range(views):
        px = px_ref[0, 0, v:v + 1, :]                     # [1, lanes]
        py = py_ref[0, 0, v:v + 1, :]
        ymin = jnp.clip(jnp.floor(jnp.min(py)).astype(jnp.int32),
                        0, h - band)
        rows = src_ref[pl.ds((v * h + ymin) * C, band * C), :]
        rows = rows.astype(compute_dtype)                 # [band·C, w]
        hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(px - kx))  # [w, lanes]
        out_x = jnp.dot(rows, hat_x.astype(compute_dtype),
                        preferred_element_type=jnp.float32,
                        precision=precision)              # [band·C, lanes]
        jy = (sub_i + ymin).astype(jnp.float32)
        hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(py - jy))
        wgt = out_x * hat_y
        con = None
        for s in range(band):
            piece = wgt[s * C:(s + 1) * C, :]
            con = piece if con is None else con + piece   # [C, lanes]
        acc_s = acc_s + con
        acc_q = acc_q + con * con
    mean = acc_s / views
    var = acc_q / views - mean * mean
    out_ref[0] = var.astype(out_ref.dtype)


def plane_sweep_variance_lanes(
        features: jnp.ndarray, projs: jnp.ndarray,
        depth_values: jnp.ndarray, lay: LaneLayout, *,
        rows_per_step: int = 4, band: int = 8,
        compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
        interpret: bool = False) -> jnp.ndarray:
    """Variance cost volume in the lanes layout, single batch element.

    features: [V, h, w, C] (view 0 = reference); projs: [V, 4, 4] K-folded
    projections; depth_values: [D, h, w] per-pixel hypotheses.
    Returns [D+2, C, lanesp] (lay = make_layout(h, w)) ready for
    ops.pallas_costreg.costreg_lanes — equal to
    to_lanes(plane_sweep_variance(...)) up to compute_dtype rounding.

    PRECONDITION: every (depth, R-row group)'s source-y spread fits the
    static band for every view — check_group_coverage.
    """
    V, h, w, C = features.shape
    D = depth_values.shape[0]
    R, wp = rows_per_step, lay.wp
    assert (h, w) == (lay.h, lay.w) and h % R == 0, (features.shape, lay, R)
    n_rg = h // R

    # stacked channel-major feature maps: [V·h·C, w] (view-major rows)
    src2d = jnp.transpose(features.astype(compute_dtype),
                          (0, 1, 3, 2)).reshape(V * h * C, w)

    px_all, py_all = [], []
    ref_proj = projs[0]
    for v in range(V):
        rel = (jax.lax.stop_gradient(
            relative_projection(projs[v:v + 1], ref_proj[None]))
            if v else _identity_projection(ref_proj)[None])
        px, py = _coords_for_view(rel, depth_values[None], h, w, wp)
        px_all.append(px)
        py_all.append(py)
    # [D, n_rg, V, R·wp]
    pack = lambda cs: jnp.stack(
        [c.reshape(D, n_rg, R * wp) for c in cs], axis=2)
    px_pack = pack(px_all)
    py_pack = pack(py_all)

    template = jnp.zeros((D + 2, C, lay.lanesp), out_dtype)
    H = lay.halo
    lane_off = lambda val: pl.multiple_of(val, 128)
    coord_spec = pl.BlockSpec((1, 1, V, R * wp),
                              lambda d, r: (d, r, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(C), pl.Element(R * wp)),
        lambda d, r: (d + 1, 0, lane_off(H + (1 + r * R) * wp)),
        memory_space=pltpu.VMEM)

    kern = functools.partial(
        _warp_var_kernel, views=V, band=band, C=C, h=h, w=w, R=R, wp=wp,
        compute_dtype=compute_dtype)
    src_bytes = src2d.size * np.dtype(compute_dtype).itemsize
    vmem = int(min(127 * 1024 * 1024, src_bytes + 28 * 1024 * 1024))
    return pl.pallas_call(
        kern,
        grid=(D, n_rg),
        in_specs=[
            coord_spec, coord_spec,
            out_spec,                 # aliased zero template
            pl.BlockSpec((V * h * C, w), lambda d, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((D + 2, C, lay.lanesp), out_dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        **({"interpret": True} if interpret else {}),
    )(px_pack, py_pack, template, src2d)


def check_group_coverage(proj_pairs, depth_values, height, width,
                         rows_per_step: int = 4, band: int = 8) -> bool:
    """Host-side precondition for the fused kernel: does every view's
    source-y spread over each R-row group fit the static band? Mirrors
    ops.pallas_warp.check_band_coverage but for (R, band) pairs.

    proj_pairs: [B, V, 2, 4, 4]; depth_values: [B, D] or [B, D, H, W].
    """
    from ..core.geometry import compose_projection, linspace_depth_samples
    projs = compose_projection(jnp.asarray(proj_pairs))
    dv = jnp.asarray(depth_values)
    if dv.ndim == 2:
        dv = linspace_depth_samples(dv, dv.shape[1], height, width)
    R = rows_per_step
    ok = True
    for v in range(1, projs.shape[1]):
        rel = relative_projection(projs[:, v], projs[:, 0])
        _, py = _pixel_coords(rel, dv, height, width)
        B, D, H, W = py.shape
        groups = py.reshape(B, D, H // R, R * W)
        lo = jnp.floor(jnp.min(groups, axis=-1))
        hi = jnp.floor(jnp.max(groups, axis=-1)) + 1.0
        start = jnp.clip(lo, 0.0, float(height - band))
        first = jnp.maximum(jnp.maximum(lo, 0.0), start)
        last = jnp.minimum(float(height - 1), hi)
        ok = ok and bool(jax.device_get(
            jnp.all(last - first <= band - 1)))
    return ok
